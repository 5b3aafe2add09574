package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Materialize.MatOps
import graft.Tables
import graft.sim.Similarity
import CorpusQueries.{sqlCosine, sqlDot}

/** Round-7 geometry-and-ranking wave: ANN-diagnostic hubness, TwoNN
  * intrinsic-dimension estimation, rank-biased overlap between ranked
  * lists, Neyman optimal stratified allocation, and a Weibull
  * median-rank-regression fit. Float discipline: dot products reuse the
  * repo's pinned index-order folds (bit-identical across engines), the
  * only libm calls (ln) are micro/milli-quantized per point before any
  * aggregation, and RBO's p-powers are Scala-precomputed integer
  * coefficients embedded in both plans. */
object GeometryQueries {

  val all: Seq[Q] = Seq(q461, q462, q463, q464, q465)

  /** Hubness audit of the k-NN graph (k=10, exact cosine) for a FIXED
    * 200-query sample (the 200 lowest vec_ids — a cap, not a rate, so
    * the pair count is O(200·N) at every scale): the in-degree
    * distribution over the WHOLE corpus of "how often is x one of a
    * sampled query's neighbors" — max in-degree, hub count (≥2k),
    * anti-hub count (0), and the in-degree skewness from exact integer
    * moments (the standard hubness statistic; high skew predicts
    * degraded ANN recall). B = n²Σx³−3nΣxΣx²+2(Σx)³ and
    * A = nΣx²−(Σx)² give g₁ = B/A^{3/2} exactly (the n powers cancel),
    * one pinned double at the end. Scale shape (the q344/q335 recipe):
    * the capped query side broadcasts, the corpus STREAMS past it, and
    * the per-query top-10 runs through GroupedTopK's bounded heaps —
    * never a full 200·N window sort. */
  def q461: Q = {
    val k = 10
    val nQueries = 200
    Q("q461_knn_hubness",
      Some(s"""
        |WITH qq AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  ORDER BY vec_id LIMIT $nQueries),
        |pairs AS (
        |  SELECT q.vec_id, c.vec_id AS neighbor_id,
        |         ${sqlCosine("q.embedding", "c.embedding")} AS cos
        |  FROM qq q JOIN embeddings c ON q.vec_id != c.vec_id),
        |knn AS (
        |  SELECT neighbor_id FROM (
        |    SELECT neighbor_id, row_number() OVER (
        |      PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rk
        |    FROM pairs) r WHERE rk <= $k),
        |indeg AS (
        |  SELECT e.vec_id, count(knn.neighbor_id) AS x
        |  FROM embeddings e LEFT JOIN knn ON knn.neighbor_id = e.vec_id
        |  GROUP BY 1),
        |m AS (SELECT count(*) AS n, sum(x) AS sx,
        |             sum(x * x) AS sxx, sum(CAST(x AS HUGEINT) * x * x) AS sxxx,
        |             max(x) AS mx,
        |             sum(CASE WHEN x >= ${2 * k} THEN 1 ELSE 0 END) AS hubs,
        |             sum(CASE WHEN x = 0 THEN 1 ELSE 0 END) AS antih
        |      FROM indeg),
        |sk AS (
        |  SELECT n, mx, hubs, antih,
        |         CAST(n AS HUGEINT) * n * sxxx
        |           - 3 * CAST(n AS HUGEINT) * sx * sxx
        |           + 2 * CAST(sx AS HUGEINT) * sx * sx AS b,
        |         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS a
        |  FROM m)
        |SELECT CAST(n AS BIGINT) AS n_points,
        |       CAST(mx AS BIGINT) AS max_indegree,
        |       CAST(hubs AS BIGINT) AS n_hubs,
        |       CAST(antih AS BIGINT) AS n_antihubs,
        |       CAST(floor(CAST(CAST(b AS DOUBLE)
        |              / (CAST(a AS DOUBLE) * sqrt(CAST(a AS DOUBLE)))
        |            AS DECIMAL(28,6)) * 1000) AS BIGINT) AS skew_milli
        |FROM sk
        |""".stripMargin)) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val qq = emb.orderBy(col("vec_id")).limit(nQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val pairs = emb
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("nvec"))
        .join(broadcast(qq), col("neighbor_id") =!= col("qid"))
        .select(col("qid"), col("neighbor_id"),
          Similarity.cosine(col("qvec"), col("nvec")).as("cos"))
      val knn = graft.plans.GroupedTopK.topKPerKey(pairs, Seq("qid"),
          Seq(("cos", false), ("neighbor_id", true)), k)
        .select(col("neighbor_id"))
      val indeg = emb.select(col("vec_id"))
        .join(broadcast(knn), // ≤ 200·k rows
          col("neighbor_id") === col("vec_id"), "left")
        .groupBy(col("vec_id")).agg(count(col("neighbor_id")).as("x"))
      val m = indeg.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x").cast("decimal(38,0)") * col("x") * col("x")).as("sxxx"),
        max(col("x")).as("mx"),
        sum(when(col("x") >= 2 * k, 1L).otherwise(0L)).as("hubs"),
        sum(when(col("x") === 0, 1L).otherwise(0L)).as("anti"))
      m.select(col("n").as("n_points"), col("mx").as("max_indegree"),
          col("hubs").as("n_hubs"), col("anti").as("n_antihubs"),
          expr("""CAST(floor(CAST(
            CAST(CAST(n AS DECIMAL(38,0)) * n * sxxx
                 - 3 * CAST(n AS DECIMAL(38,0)) * sx * sxx
                 + 2 * CAST(sx AS DECIMAL(38,0)) * sx * sx AS DOUBLE)
            / (CAST(CAST(n AS DECIMAL(38,0)) * sxx
                    - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
               * sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sxx
                      - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)))
            AS DECIMAL(28,6)) * 1000) AS BIGINT)""").as("skew_milli"))
    }
  }

  /** TwoNN intrinsic-dimension estimate (Facco et al.) over a FIXED
    * 200-query sample (the 200 lowest vec_ids — cap, not rate: pairs
    * stay O(200·N) at every scale): per sampled point the ratio
    * μ = d₂/d₁ of the two nearest Euclidean distances to the FULL
    * corpus (via the pinned dot folds: d² = ⟨a,a⟩ − 2⟨a,b⟩ + ⟨b,b⟩),
    * MLE d̂ = n / Σ ln μ. Zero-distance duplicates are excluded from
    * the neighbor pool (stated contract — μ undefined at d₁=0). Each
    * ln μ is micro-quantized BEFORE the sum, so the estimate is exact
    * integer arithmetic on quantized per-point values. Scale shape
    * (the q344/q335 recipe): the capped sample broadcasts, the corpus
    * STREAMS past it, the per-query top-2 runs through GroupedTopK's
    * bounded heaps — the d₁/d₂ pair then reads min/max of the two
    * surviving rows. */
  def q462: Q = {
    val nQueries = 200
    Q("q462_twonn_intrinsic_dim",
      Some(s"""
        |WITH qq AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  ORDER BY vec_id LIMIT $nQueries),
        |pairs AS (
        |  SELECT a.vec_id,
        |         ${sqlDot("a.embedding", "a.embedding")}
        |           - 2 * ${sqlDot("a.embedding", "b.embedding")}
        |           + ${sqlDot("b.embedding", "b.embedding")} AS dsq,
        |         b.vec_id AS nb
        |  FROM qq a JOIN embeddings b ON a.vec_id != b.vec_id),
        |nn AS (
        |  SELECT vec_id, dsq, row_number() OVER (
        |           PARTITION BY vec_id ORDER BY dsq, nb) AS rk
        |  FROM pairs WHERE dsq > 0.0),
        |mu AS (
        |  SELECT vec_id,
        |         CAST(floor(CAST(ln(sqrt(
        |             max(CASE WHEN rk = 2 THEN dsq END)
        |             / max(CASE WHEN rk = 1 THEN dsq END)))
        |           AS DECIMAL(28,9)) * 1000000) AS BIGINT) AS lnmu
        |  FROM nn WHERE rk <= 2 GROUP BY 1),
        |agg AS (SELECT count(*) AS n, sum(lnmu) AS s FROM mu)
        |SELECT CAST(n AS BIGINT) AS n_points,
        |       CAST(s AS BIGINT) AS sum_ln_mu_micro,
        |       CAST((1000000000 * n) // s AS BIGINT) AS dim_milli
        |FROM agg
        |""".stripMargin)) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val a = emb.orderBy(col("vec_id")).limit(nQueries)
        .select(col("vec_id"), col("embedding").as("va"))
      val b = emb.select(col("vec_id").as("nb"), col("embedding").as("vb"))
      val pairs = b.join(broadcast(a), col("vec_id") =!= col("nb"))
        .select(col("vec_id"), col("nb"),
          graft.functions.SketchExprs.sqEuclidean(col("va"), col("vb"))
            .as("dsq"))
        .where(col("dsq") > 0.0)
      val top2 = graft.plans.GroupedTopK.topKPerKey(pairs, Seq("vec_id"),
        Seq(("dsq", true), ("nb", true)), 2)
      val mu = top2.groupBy(col("vec_id"))
        .agg(expr("""CAST(floor(CAST(ln(sqrt(
            max(dsq) / min(dsq)))
          AS DECIMAL(28,9)) * 1000000) AS BIGINT)""").as("lnmu"))
      mu.agg(count(lit(1)).as("n"), sum(col("lnmu")).as("s"))
        .select(col("n").as("n_points"), col("s").as("sum_ln_mu_micro"),
          expr("(1000000000 * n) div s").as("dim_milli"))
    }
  }

  /** Rank-biased overlap (Webber et al., p = 0.9, depth 20) between
    * the top-20 suppliers by revenue in the early half (ship ≤ 1997)
    * vs the late half — "did the leaderboard change?" with top-weighted
    * emphasis. The p^{d−1}/d weights are Scala-precomputed integer
    * coefficients w_d·lcm(1..20)/d embedded in BOTH plans, so RBO is
    * exact integer arithmetic end to end. Top-20s come from
    * TakeOrdered (orderBy+limit), never a global rank window. */
  def q463: Q = {
    val depth = 20
    val lcm = 232792560L // lcm(1..20)
    // coef_d = floor(0.9^(d-1) * 1e9) * (lcm / d)
    val coefs = (1 to depth).map { d =>
      val w = math.floor(math.pow(0.9, d - 1) * 1e9).toLong
      (d, w * (lcm / d))
    }
    val sqlCoefs = coefs.map { case (d, c) => s"($d, $c)" }.mkString(", ")
    // rbo = 0.1 * S / (1e9 * lcm)  => milli = (100 * S) // (1e9 * lcm)
    val denom = 1000000000L * lcm
    Q("q463_supplier_rbo",
      Some(s"""
        |WITH rev AS (
        |  SELECT l_suppkey AS k,
        |         CASE WHEN year(l_shipdate) <= 1997 THEN 'a' ELSE 'b' END
        |           AS half,
        |         CAST(sum(CAST(l_extendedprice * 100 AS HUGEINT))
        |              AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1, 2),
        |ra AS (SELECT k, row_number() OVER (ORDER BY cents DESC, k) AS r
        |       FROM rev WHERE half = 'a' ORDER BY r LIMIT $depth),
        |rb AS (SELECT k, row_number() OVER (ORDER BY cents DESC, k) AS r
        |       FROM rev WHERE half = 'b' ORDER BY r LIMIT $depth),
        |mt AS (
        |  SELECT greatest(ra.r, rb.r) AS m
        |  FROM ra JOIN rb ON ra.k = rb.k),
        |co(d, coef) AS (VALUES $sqlCoefs),
        |s AS (SELECT sum(CAST(co.coef AS HUGEINT)) AS s
        |      FROM mt JOIN co ON co.d >= mt.m),
        |x20 AS (SELECT count(*) AS x FROM mt)
        |SELECT CAST(x20.x AS BIGINT) AS overlap_at_20,
        |       CAST((100 * coalesce(s.s, 0)) // $denom AS BIGINT)
        |         AS rbo_milli
        |FROM x20 CROSS JOIN s
        |""".stripMargin)) { (s, dir) =>
      import s.implicits._
      val rev = Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey").as("k"),
          when(year(col("l_shipdate")) <= 1997, "a").otherwise("b")
            .as("half"))
        .agg(expr("CAST(sum(CAST(l_extendedprice * 100 AS DECIMAL(38,0)))" +
          " AS BIGINT)").as("cents"))
        .materialize()
      def top(h: String) = {
        val t = rev.where(col("half") === h)
          .orderBy(col("cents").desc, col("k")).limit(depth)
        t.withColumn("r", row_number().over(
          Window.orderBy(col("cents").desc, col("k")))) // 20-row frame
          .select(col("k"), col("r"))
      }
      val mt = top("a").join(top("b").select(col("k").as("bk"),
          col("r").as("rb")), col("k") === col("bk"))
        .select(greatest(col("r"), col("rb")).as("m"))
        .materialize() // ≤20 rows: feeds overlap count and RBO sum
      val co = coefs.toDF("d", "coef")
      val sSum = mt.join(broadcast(co), col("d") >= col("m"))
        .agg(sum(col("coef").cast("decimal(38,0)")).as("s"))
      val x20 = mt.agg(count(lit(1)).as("x"))
      x20.crossJoin(broadcast(sSum))
        .select(col("x").as("overlap_at_20"),
          expr(s"CAST((100 * coalesce(s, CAST(0 AS DECIMAL(38,0)))) " +
            s"div ${denom}L AS BIGINT)").as("rbo_milli"))
    }
  }

  /** Neyman-optimal stratified allocation of a 1000-row sample across
    * brand strata: n_h ∝ N_h·S_h, where N_h·S_h = √(N_h·Σx² − (Σx)²)
    * exactly (one correctly-rounded sqrt on exact integer moments of
    * price cents), integerized by the largest-remainder method — the
    * allocation table a survey/eval sampler consumes. The remainder
    * ranking runs over the bounded brand dim (25 rows). */
  def q464: Q = Q(
    "q464_neyman_allocation",
    Some("""
      |WITH x AS (
      |  SELECT p_brand AS brand,
      |         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS c
      |  FROM part),
      |st AS (
      |  SELECT brand, count(*) AS nh,
      |         CAST(floor(sqrt(CAST(count(*) * sum(c * c)
      |                - sum(c) * sum(c) AS DOUBLE))) AS BIGINT) AS w
      |  FROM x GROUP BY 1),
      |tot AS (SELECT sum(w) AS tw FROM st),
      |base AS (
      |  SELECT brand, nh, w,
      |         (1000 * w) // tot.tw AS b,
      |         (1000 * w) % tot.tw AS rem
      |  FROM st CROSS JOIN tot),
      |need AS (SELECT 1000 - sum(b) AS r FROM base),
      |rk AS (SELECT brand, row_number() OVER (ORDER BY rem DESC, brand)
      |              AS rr FROM base)
      |SELECT base.brand, CAST(base.nh AS BIGINT) AS n_stratum,
      |       CAST(base.w AS BIGINT) AS weight,
      |       CAST(base.b + CASE WHEN rk.rr <= need.r THEN 1 ELSE 0 END
      |            AS BIGINT) AS n_alloc
      |FROM base JOIN rk ON base.brand = rk.brand CROSS JOIN need
      |ORDER BY base.brand
      |""".stripMargin)) { (s, dir) =>
    val x = Tables.part(s, dir)
      .select(col("p_brand").as("brand"),
        expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("c"))
    val st = x.groupBy(col("brand"))
      .agg(count(lit(1)).as("nh"),
        expr("CAST(floor(sqrt(CAST(count(1) * sum(c * c) " +
          "- sum(c) * sum(c) AS DOUBLE))) AS BIGINT)").as("w"))
      .materialize() // 25-row brand dim
    val tot = st.agg(sum(col("w")).as("tw"))
    val base = st.crossJoin(broadcast(tot))
      .select(col("brand"), col("nh"), col("w"),
        expr("(1000 * w) div tw").as("b"),
        expr("(1000 * w) % tw").as("rem"))
      .materialize()
    val need = base.agg((lit(1000L) - sum(col("b"))).as("r"))
    val rk = base.select(col("brand").as("rbrand"),
      row_number().over(Window.orderBy(col("rem").desc, col("brand")))
        .cast("long").as("rr")) // 25-row brand dim window
    base.join(rk, col("brand") === col("rbrand"))
      .crossJoin(broadcast(need))
      .select(col("brand"), col("nh").as("n_stratum"),
        col("w").as("weight"),
        (col("b") + when(col("rr") <= col("r"), 1L).otherwise(0L))
          .as("n_alloc"))
      .orderBy(col("brand"))
  }

  /** Weibull fit of order fulfillment spans by median-rank regression
    * (Bernard's approximation): rank spans with the bucket-parallel
    * globalRankCum (never a global single-partition window over the
    * order dim), transform to (ln t, ln(−ln(1−F))) milli-quantized per
    * point, then exact-integer OLS. Outputs the shape k (slope), ln of
    * the scale (−intercept/slope — the denominator cancels so it is a
    * single double division of exact integers), and the fit r². */
  def q465: Q = Q(
    "q465_weibull_span_fit",
    Some("""
      |WITH ord AS (
      |  SELECT o.o_orderkey AS id,
      |         max(epoch_us(l.l_shipdate) // 86400000000)
      |           - epoch_us(o.o_orderdate) // 86400000000 + 1 AS t
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1, o.o_orderdate
      |  HAVING max(epoch_us(l.l_shipdate) // 86400000000)
      |         >= epoch_us(o.o_orderdate) // 86400000000),
      |rk AS (SELECT t, row_number() OVER (ORDER BY t, id) AS i,
      |              count(*) OVER () AS n FROM ord),
      |pt AS (
      |  SELECT CAST(floor(CAST(ln(CAST(t AS DOUBLE)) AS DECIMAL(28,9))
      |              * 1000) AS BIGINT) AS x,
      |         CAST(floor(CAST(ln(ln(
      |             CAST(10 * n + 4 AS DOUBLE)
      |             / CAST(10 * n - 10 * i + 7 AS DOUBLE)))
      |           AS DECIMAL(28,9)) * 1000) AS BIGINT) AS y
      |  FROM rk),
      |mo AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |              sum(x * y) AS sxy, sum(x * x) AS sxx,
      |              sum(y * y) AS syy FROM pt),
      |fr AS (
      |  SELECT n,
      |         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS kn,
      |         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den,
      |         CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy AS bn,
      |         CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS dy
      |  FROM mo)
      |SELECT CAST(n AS BIGINT) AS n_orders,
      |       CAST(floor(CAST(CAST(kn AS DOUBLE) / CAST(den AS DOUBLE)
      |            AS DECIMAL(28,6)) * 1000) AS BIGINT) AS shape_milli,
      |       CAST(floor(CAST(CAST(-bn AS DOUBLE) / CAST(kn AS DOUBLE)
      |            AS DECIMAL(28,6)) * 1000) AS BIGINT) AS ln_scale_micro,
      |       CAST(floor(CAST(CAST(kn AS DOUBLE) * CAST(kn AS DOUBLE)
      |              / (CAST(den AS DOUBLE) * CAST(dy AS DOUBLE))
      |            AS DECIMAL(28,6)) * 1000) AS BIGINT) AS r2_milli
      |FROM fr
      |""".stripMargin)) { (s, dir) =>
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey").as("id"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
          " div 86400000000").as("a"))
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
            " div 86400000000").as("sd")),
        col("id") === col("l_orderkey"))
      .groupBy(col("id"), col("a"))
      .agg(max(col("sd")).as("done"))
      .where(col("done") >= col("a"))
      .select(col("id"), (col("done") - col("a") + 1).as("t"))
      .materialize()
    val n1 = ord.agg(count(lit(1)).as("n"))
    val rk = graft.dedup.SortedNeighborhood.globalRankCum(
        ord.withColumn("__bkt", expr("t div 64")),
        idCol = "id", bucketCol = "__bkt", tieCols = Seq("t"),
        partCols = Nil, cumCol = None)
      .crossJoin(broadcast(n1))
    val pt = rk.select(
      expr("CAST(floor(CAST(ln(CAST(t AS DOUBLE)) AS DECIMAL(28,9))" +
        " * 1000) AS BIGINT)").as("x"),
      expr("""CAST(floor(CAST(ln(ln(
          CAST(10 * n + 4 AS DOUBLE)
          / CAST(10 * n - 10 * __rank + 7 AS DOUBLE)))
        AS DECIMAL(28,9)) * 1000) AS BIGINT)""").as("y"))
    val mo = pt.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
    mo.select(col("n"),
        expr("CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy")
          .as("kn"),
        expr("CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx")
          .as("den"),
        expr("CAST(sy AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sxy")
          .as("bn"),
        expr("CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy")
          .as("dy"))
      .select(col("n").as("n_orders"),
        expr("CAST(floor(CAST(CAST(kn AS DOUBLE) / CAST(den AS DOUBLE)" +
          " AS DECIMAL(28,6)) * 1000) AS BIGINT)").as("shape_milli"),
        expr("CAST(floor(CAST(CAST(-bn AS DOUBLE) / CAST(kn AS DOUBLE)" +
          " AS DECIMAL(28,6)) * 1000) AS BIGINT)").as("ln_scale_micro"),
        expr("CAST(floor(CAST(CAST(kn AS DOUBLE) * CAST(kn AS DOUBLE)" +
          " / (CAST(den AS DOUBLE) * CAST(dy AS DOUBLE))" +
          " AS DECIMAL(28,6)) * 1000) AS BIGINT)").as("r2_milli"))
  }
}
