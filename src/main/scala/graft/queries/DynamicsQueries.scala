package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-7 dynamics wave: in-fold forecast backtesting, dynamic time
  * warping (exact integer DP, replayed by a recursive list-fold
  * oracle), graph modularity of the brand partition, bigram-LM
  * perplexity, and an l-diversity privacy audit. */
object DynamicsQueries {

  val all: Seq[Q] = Seq(q426, q427, q428, q429, q430, q431, q432, q433,
    q434, q435)

  /** Holt-Winters one-step-ahead backtest: q400's fold additionally
    * accumulates |x − (l+b+s_j)| (full model) and |x − (l+b)|
    * (seasonality ablated) BEFORE each update — "does the weekly
    * seasonal state earn its keep". The error sums ride inside the
    * same IEEE-pinned fold, so both engines walk one op sequence. */
  def q426: Q = {
    val sSel = (0 to 6).map(i =>
      s"WHEN e[1].b = $i THEN acc[1].s$i").mkString("CASE ", " ", " END")
    val lExpr = s"0.3 * (e[1].l - ($sSel)) + 0.7 * (acc[1].l + acc[1].b)"
    val bExpr = s"0.1 * (($lExpr) - acc[1].l) + 0.9 * acc[1].b"
    val sFields = (0 to 6).map(i =>
      s"'s$i': CASE WHEN e[1].b = $i THEN 0.2 * (e[1].l - ($lExpr))" +
        s" + 0.8 * acc[1].s$i ELSE acc[1].s$i END").mkString(",\n      ")
    val zeros = (0 to 6).map(i => s"'s$i': CAST(0.0 AS DOUBLE)")
      .mkString(", ")
    val ehExpr = "acc[1].eh + abs(e[1].l" +
      s" - (acc[1].l + acc[1].b + ($sSel)))"
    val elExpr = "acc[1].el + abs(e[1].l - (acc[1].l + acc[1].b))"
    def q(x: String) =
      s"CAST(floor(CAST($x AS DECIMAL(28,6)) * 1000) AS BIGINT)"
    Q("q426_hw_backtest",
      Some(s"""
        |WITH daily AS (
        |  SELECT epoch_us(l_shipdate) // 86400000000 AS d,
        |         CAST(sum(CAST(l_extendedprice * 100 AS HUGEINT))
        |              AS BIGINT) AS r
        |  FROM lineitem GROUP BY 1),
        |v AS (SELECT list({'l': CAST(r AS DOUBLE),
        |                   'b': CAST(d % 7 AS DOUBLE), $zeros,
        |                   'eh': CAST(0.0 AS DOUBLE),
        |                   'el': CAST(0.0 AS DOUBLE)}
        |                  ORDER BY d) AS vals,
        |             count(*) AS n FROM daily),
        |f AS (
        |  SELECT n, list_reduce(
        |    list_prepend([{'l': vals[1].l, 'b': CAST(0.0 AS DOUBLE),
        |                   $zeros, 'eh': CAST(0.0 AS DOUBLE),
        |                   'el': CAST(0.0 AS DOUBLE)}],
        |      list_transform(vals[2:], x -> [x])),
        |    (acc, e) -> [{'l': $lExpr,
        |      'b': $bExpr,
        |      $sFields,
        |      'eh': $ehExpr,
        |      'el': $elExpr}]) AS st
        |  FROM v)
        |SELECT CAST(n AS BIGINT) AS n_days,
        |       ${q("st[1].eh / (n - 1)")} AS mae_hw_milli,
        |       ${q("st[1].el / (n - 1)")} AS mae_level_milli
        |FROM f
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.types._
      val daily = Tables.lineitem(s, dir)
        .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"))
        .agg(expr("CAST(sum(CAST(l_extendedprice * 100 " +
          "AS DECIMAL(38,0))) AS BIGINT)").as("r"))
        .select(lit(0L).as("g"), col("d"), col("r"))
      val out = StructType(Seq(
        StructField("n_days", LongType, nullable = false),
        StructField("eh", DoubleType, nullable = false),
        StructField("el", DoubleType, nullable = false)))
      case class St(l: Double, b: Double, sv: Array[Double],
        eh: Double, el: Double, n: Long)
      graft.operators.OrderedFold.foldGroups[St](
        daily, Seq("g"), Seq(col("d")), out)(
        init = _ => St(0.0, 0.0, Array.fill(7)(0.0), 0.0, 0.0, 0L),
        step = { case (st, row) =>
          val d = row.getLong(1)
          val x = row.getLong(2).toDouble
          if (st.n == 0L) St(x, 0.0, Array.fill(7)(0.0), 0.0, 0.0, 1L)
          else {
            val j = (d % 7).toInt
            val eh2 = st.eh + math.abs(x - (st.l + st.b + st.sv(j)))
            val el2 = st.el + math.abs(x - (st.l + st.b))
            val l2 = 0.3 * (x - st.sv(j)) + 0.7 * (st.l + st.b)
            val b2 = 0.1 * (l2 - st.l) + 0.9 * st.b
            val s2 = st.sv.clone()
            s2(j) = 0.2 * (x - l2) + 0.8 * st.sv(j)
            St(l2, b2, s2, eh2, el2, st.n + 1)
          }
        },
        emit = (_, st) => Iterator(
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](st.n, st.eh, st.el))))
        .select(col("n_days"),
          expr(q("eh / (n_days - 1)")).as("mae_hw_milli"),
          expr(q("el / (n_days - 1)")).as("mae_level_milli"))
    }
  }

  /** Dynamic time warping between two brand monthly-demand series:
    * the full |aᵢ−bⱼ| DP in exact integers — the Spark side folds
    * column-by-column (state = one DP column, the streaming shape),
    * the oracle replays the identical recurrence as a recursive CTE
    * whose per-column list_reduce appends cells left-to-right. Series
    * A is a documented bounded collect (monthly dim). */
  def q427: Q = {
    val bandA = "Brand#1"
    val bandB = "Brand#2"
    Q("q427_dtw_brand_demand",
      Some(s"""
        |WITH RECURSIVE bm AS (
        |  SELECT p.p_brand AS b,
        |         CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate)
        |              AS BIGINT) AS ym,
        |         sum(CAST(l.l_quantity AS BIGINT)) AS q
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE p.p_brand IN ('$bandA', '$bandB')
        |  GROUP BY 1, 2),
        |bmx AS (SELECT b, ym, CAST(q AS BIGINT) AS q FROM bm),
        |sa AS (SELECT list(q ORDER BY ym) AS la FROM bmx
        |       WHERE b = '$bandA'),
        |sb AS (SELECT list(q ORDER BY ym) AS lb FROM bmx
        |       WHERE b = '$bandB'),
        |step AS (
        |  SELECT 1 AS j,
        |         list_reduce(
        |           list_prepend([abs(la[1] - lb[1])],
        |             list_transform(range(2, len(la) + 1),
        |               i -> [CAST(i AS BIGINT)])),
        |           (acc, e) -> acc ||
        |             [abs(la[e[1]] - lb[1]) + acc[e[1] - 1]]) AS colv
        |  FROM sa, sb
        |  UNION ALL
        |  SELECT j + 1,
        |         list_reduce(
        |           list_prepend([abs(la[1] - lb[j + 1]) + colv[1]],
        |             list_transform(range(2, len(la) + 1),
        |               i -> [CAST(i AS BIGINT)])),
        |           (acc, e) -> acc ||
        |             [abs(la[e[1]] - lb[j + 1])
        |              + least(colv[e[1]], colv[e[1] - 1],
        |                      acc[e[1] - 1])]) AS colv
        |  FROM step, sa, sb WHERE j < len(lb))
        |SELECT CAST(len(sa.la) AS BIGINT) AS n_a,
        |       CAST(len(sb.lb) AS BIGINT) AS n_b,
        |       CAST(st.colv[len(sa.la)] AS BIGINT) AS dtw,
        |       CAST((1000 * st.colv[len(sa.la)])
        |            // (len(sa.la) + len(sb.lb)) AS BIGINT)
        |         AS dtw_norm_milli
        |FROM step st, sa, sb WHERE st.j = len(sb.lb)
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.types._
      val bm = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .where(col("p_brand").isin(bandA, bandB))
          .select(col("p_partkey"), col("p_brand").as("b"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("b"),
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
            .cast("long").as("ym"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
        .materialize() // month dim feeds both series
      // series A: monthly dim — documented bounded collect
      val la: Array[Long] = bm.where(col("b") === bandA)
        .orderBy(col("ym")).select(col("q"))
        .collect().map(_.getLong(0))
      val sbRows = bm.where(col("b") === bandB)
        .select(lit(0L).as("g"), col("ym"), col("q"))
      val out = StructType(Seq(
        StructField("n_a", LongType, nullable = false),
        StructField("n_b", LongType, nullable = false),
        StructField("dtw", LongType, nullable = false)))
      graft.operators.OrderedFold.foldGroups[(Array[Long], Long)](
        sbRows, Seq("g"), Seq(col("ym")), out)(
        init = _ => (Array.empty[Long], 0L),
        step = { case ((colv, j), row) =>
          val bj = row.getLong(2)
          val next = new Array[Long](la.length)
          if (j == 0L) {
            next(0) = math.abs(la(0) - bj)
            var i = 1
            while (i < la.length) {
              next(i) = math.abs(la(i) - bj) + next(i - 1); i += 1
            }
          } else {
            next(0) = math.abs(la(0) - bj) + colv(0)
            var i = 1
            while (i < la.length) {
              next(i) = math.abs(la(i) - bj) +
                math.min(colv(i), math.min(colv(i - 1), next(i - 1)))
              i += 1
            }
          }
          (next, j + 1)
        },
        emit = (_, st) => Iterator(
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](la.length.toLong, st._2, st._1.last))))
        .select(col("n_a"), col("n_b"), col("dtw"),
          expr("CAST((1000 * dtw) div (n_a + n_b) AS BIGINT)")
            .as("dtw_norm_milli"))
    }
  }

  /** Modularity of the brand partition on the co-purchase graph: per
    * brand, within-community edges E_c and degree sum d_c, and the
    * contribution E_c/m − (d_c/2m)² (one shared double fragment from
    * exact integers) — "do brands form real co-purchase
    * communities". */
  def q428: Q = {
    val contrib = "CAST(floor(CAST(1000000.0 * " +
      "(CAST(ec AS DOUBLE) / CAST(m AS DOUBLE)" +
      " - (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))" +
      " * (CAST(dc AS DOUBLE) / (2.0 * CAST(m AS DOUBLE))))" +
      " AS DECIMAL(28,6))) AS BIGINT)"
    Q("q428_brand_modularity",
      Some(s"""
        |WITH ${SeriesQueries.sqlCopurchaseEdgeCtes},
        |pb AS (SELECT p_partkey, p_brand FROM part),
        |eb AS (
        |  SELECT ba.p_brand AS b1, bb.p_brand AS b2
        |  FROM e JOIN pb ba ON ba.p_partkey = e.pa
        |       JOIN pb bb ON bb.p_partkey = e.pb),
        |m AS (SELECT count(*) AS m FROM eb),
        |wc AS (SELECT b1 AS brand, count(*) AS ec FROM eb
        |       WHERE b1 = b2 GROUP BY 1),
        |dg AS (
        |  SELECT brand, count(*) AS dc
        |  FROM (SELECT b1 AS brand FROM eb
        |        UNION ALL SELECT b2 FROM eb)
        |  GROUP BY 1),
        |j AS (
        |  SELECT dg.brand, coalesce(wc.ec, 0) AS ec, dg.dc AS dc, m.m AS m
        |  FROM dg LEFT JOIN wc ON wc.brand = dg.brand CROSS JOIN m)
        |SELECT brand, CAST(ec AS BIGINT) AS within_edges,
        |       CAST(dc AS BIGINT) AS degree_sum,
        |       CASE WHEN m > 0 THEN $contrib END AS contrib_micro
        |FROM j ORDER BY brand
        |""".stripMargin)) { (s, dir) =>
      val pb = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))
      val eb = SeriesQueries.copurchaseEdges(s, dir)
        .join(broadcast(pb.select(col("p_partkey").as("__ka"),
          col("p_brand").as("b1"))), col("__ka") === col("pa"))
        .join(broadcast(pb.select(col("p_partkey").as("__kb"),
          col("p_brand").as("b2"))), col("__kb") === col("pb"))
        .select(col("b1"), col("b2"))
        .materialize() // brand-edge dim feeds m, within, and degrees
      val m = eb.agg(count(lit(1)).as("m"))
      val wc = eb.where(col("b1") === col("b2"))
        .groupBy(col("b1").as("brand")).agg(count(lit(1)).as("ec"))
      val dg = eb.select(col("b1").as("brand"))
        .unionAll(eb.select(col("b2").as("brand")))
        .groupBy(col("brand")).agg(count(lit(1)).as("dc"))
      dg.join(wc.withColumnRenamed("brand", "__wb"),
          col("__wb") === col("brand"), "left")
        .select(col("brand"), coalesce(col("ec"), lit(0L)).as("ec"),
          col("dc"))
        .crossJoin(broadcast(m))
        .select(col("brand"), col("ec").as("within_edges"),
          col("dc").as("degree_sum"),
          when(col("m") > 0, expr(contrib)).as("contrib_micro"))
        .orderBy(col("brand"))
    }
  }

  /** Bigram language-model perplexity per source: add-1-smoothed
    * bigram probabilities from the WHOLE corpus (31-token vocab dim),
    * each occurrence's ln P(w₂|w₁) floor-micro-quantized before the
    * per-source sum, perplexity = exp(−H̄) as the one final double
    * fragment — "which sources the corpus LM finds surprising". */
  def q429: Q = {
    val term = "CAST(floor(CAST(1000000.0 * ln(" +
      "(CAST(c12 AS DOUBLE) + 1.0)" +
      " / (CAST(c1 AS DOUBLE) + CAST(vv AS DOUBLE)))" +
      " AS DECIMAL(28,6))) AS BIGINT)"
    val ppx = "CAST(floor(CAST(1000.0 * exp(0.0 -" +
      " (CAST(st AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE))" +
      " AS DECIMAL(28,6))) AS BIGINT)"
    Q("q429_bigram_perplexity",
      Some(s"""
        |WITH t AS (
        |  SELECT source,
        |         ${PipelineQueries.sqlTokens("lower(text)")} AS toks
        |  FROM documents WHERE trim(text) <> ''),
        |bg AS (
        |  SELECT source, s.a AS a, s.b AS b
        |  FROM t, unnest(list_transform(range(1, len(toks)),
        |         i -> {'a': toks[i], 'b': toks[i + 1]})) AS uu(s)),
        |c12 AS (SELECT a, b, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT a, count(*) AS c1 FROM bg GROUP BY 1),
        |vv AS (SELECT count(DISTINCT a) AS vv
        |       FROM (SELECT a FROM bg UNION ALL SELECT b FROM bg)),
        |sc AS (
        |  SELECT bg.source, $term AS tm
        |  FROM bg JOIN c12 ON c12.a = bg.a AND c12.b = bg.b
        |       JOIN c1 ON c1.a = bg.a CROSS JOIN vv),
        |ag AS (SELECT source, count(*) AS n, sum(tm) AS st FROM sc
        |       GROUP BY 1)
        |SELECT source, CAST(n AS BIGINT) AS n_bigrams,
        |       $ppx AS perplexity_milli
        |FROM ag ORDER BY source
        |""".stripMargin)) { (s, dir) =>
      val toks = graft.text.TextAnalysis.tokens(lower(col("text")))
      val bg = Tables.documents(s, dir)
        .where(trim(col("text")) =!= "")
        .select(col("source"), toks.as("__t"))
        // sequence(1, 0) would run DESCENDING in Spark — 1-token docs
        // must drop (they contribute no bigrams in the oracle either)
        .where(size(col("__t")) >= 2)
        .select(col("source"), explode(expr(
          "transform(sequence(1, size(__t) - 1), " +
            "i -> struct(element_at(__t, i) AS a, " +
            "element_at(__t, i + 1) AS b))")).as("p"))
        .select(col("source"), col("p.a").as("a"), col("p.b").as("b"))
        .materialize() // bigram fact feeds counts AND the scoring pass
      val c12 = bg.groupBy(col("a").as("__ca"), col("b").as("__cb"))
        .agg(count(lit(1)).as("c12"))
      val c1 = bg.groupBy(col("a").as("__ua"))
        .agg(count(lit(1)).as("c1"))
      val vv = bg.select(col("a")).unionAll(bg.select(col("b")))
        .agg(countDistinct(col("a")).as("vv"))
      bg.join(broadcast(c12),
          col("a") === col("__ca") && col("b") === col("__cb"))
        .join(broadcast(c1), col("a") === col("__ua"))
        .crossJoin(broadcast(vv))
        .select(col("source"), expr(term).as("tm"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("tm")).as("st"))
        .select(col("source"), col("n").as("n_bigrams"),
          expr(ppx).as("perplexity_milli"))
        .orderBy(col("source"))
    }
  }

  /** l-diversity audit: quasi-identifier (nation, segment, account-
    * balance band) groups vs the sensitive order priority — how many
    * QI groups expose ≤ l distinct priorities, and what share of
    * orders sits in safely diverse (l ≥ 3) groups. The k-anonymity
    * (q149) sibling for attribute disclosure. All integer. */
  def q430: Q = Q(
    "q430_l_diversity",
    Some("""
      |WITH t AS (
      |  SELECT c.c_nationkey AS n, c.c_mktsegment AS s,
      |         CAST(floor(c.c_acctbal / 2000) AS BIGINT) AS ab,
      |         o.o_orderpriority AS p
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      |g AS (
      |  SELECT n, s, ab, count(DISTINCT p) AS l, count(*) AS cnt
      |  FROM t GROUP BY 1, 2, 3),
      |tot AS (SELECT sum(cnt) AS rows_ FROM g)
      |SELECT CAST(g.l AS BIGINT) AS l,
      |       CAST(count(*) AS BIGINT) AS n_groups,
      |       CAST(sum(g.cnt) AS BIGINT) AS n_orders,
      |       CAST((1000000 * sum(g.cnt)) // max(tot.rows_) AS BIGINT)
      |         AS share_ppm
      |FROM g CROSS JOIN tot
      |GROUP BY g.l ORDER BY l
      |""".stripMargin)) { (s, dir) =>
    val t = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey").as("n"),
          col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") / 2000).cast("long").as("ab"))),
        col("c_custkey") === col("o_custkey"))
      .select(col("n"), col("seg"), col("ab"),
        col("o_orderpriority").as("p"))
    val g = t.groupBy(col("n"), col("seg"), col("ab"))
      .agg(countDistinct(col("p")).as("l"), count(lit(1)).as("cnt"))
      .materialize() // QI-group dim feeds total AND the histogram
    val tot = g.agg(sum(col("cnt")).as("rows_"))
    g.crossJoin(broadcast(tot))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_groups"), sum(col("cnt")).as("n_orders"),
        expr("CAST((1000000 * sum(cnt)) div max(rows_) AS BIGINT)")
          .as("share_ppm"))
      .orderBy(col("l"))
  }

  /** 0/1 knapsack over the top-50 revenue parts (weight = p_size,
    * value = net revenue deci-dollars, capacity 200): the exact DP —
    * each item updates the 201-slot value vector from the PREVIOUS
    * vector only, so the oracle replays it as a recursive CTE with a
    * plain list_transform (no intra-row dependency) and the Spark
    * side folds item-by-item. Pure integers. */
  def q431: Q = {
    val cap = 200
    val topN = 50
    Q("q431_knapsack_promo_bundle",
      Some(s"""
        |WITH RECURSIVE rev AS (
        |  SELECT l_partkey AS part,
        |         sum(CAST(floor(CAST(l_extendedprice * (1.0 - l_discount)
        |              AS DECIMAL(18,9)) * 100) AS BIGINT)) AS cents
        |  FROM lineitem GROUP BY 1),
        |items AS (
        |  SELECT rn, wt, v FROM (
        |    SELECT row_number() OVER (ORDER BY r.cents DESC, r.part)
        |             AS rn,
        |           CAST(p.p_size AS BIGINT) AS wt,
        |           r.cents // 1000 AS v
        |    FROM rev r JOIN part p ON p.p_partkey = r.part)
        |  WHERE rn <= $topN),
        |dp AS (
        |  SELECT 0 AS j, list_transform(range(0, ${cap + 1}),
        |           x -> CAST(0 AS BIGINT)) AS colv
        |  UNION ALL
        |  SELECT dp.j + 1,
        |         list_transform(range(1, ${cap + 2}), wi ->
        |           CASE WHEN wi - 1 >= it.wt
        |                THEN greatest(dp.colv[wi],
        |                              dp.colv[wi - it.wt] + it.v)
        |                ELSE dp.colv[wi] END) AS colv
        |  FROM dp JOIN items it ON it.rn = dp.j + 1
        |  WHERE dp.j < $topN)
        |SELECT CAST($topN AS BIGINT) AS n_items,
        |       CAST($cap AS BIGINT) AS capacity,
        |       CAST(colv[${cap + 1}] AS BIGINT) AS best_value
        |FROM dp WHERE j = $topN
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.types._
      val items = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey").as("part"))
        .agg(sum(floor((col("l_extendedprice")
            * (lit(1.0) - col("l_discount"))).cast("decimal(18,9)")
            * 100).cast("long")).as("cents"))
        .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_size"))),
          col("p_partkey") === col("part"))
        .orderBy(col("cents").desc, col("part")).limit(topN)
        .select(lit(0L).as("g"), col("cents"), col("part"),
          col("p_size").cast("long").as("wt"),
          expr("cents div 1000").as("v"))
      val out = StructType(Seq(
        StructField("best_value", LongType, nullable = false)))
      graft.operators.OrderedFold.foldGroups[Array[Long]](
        items, Seq("g"), Seq(col("cents").desc, col("part")), out)(
        init = _ => Array.fill(cap + 1)(0L),
        step = { case (dp, row) =>
          val wt = row.getLong(3).toInt
          val v = row.getLong(4)
          val next = new Array[Long](cap + 1)
          var w = 0
          while (w <= cap) {
            next(w) =
              if (w >= wt) math.max(dp(w), dp(w - wt) + v) else dp(w)
            w += 1
          }
          next
        },
        emit = (_, dp) => Iterator(
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](dp(cap)))))
        .select(lit(topN.toLong).as("n_items"),
          lit(cap.toLong).as("capacity"), col("best_value"))
    }
  }

  /** Hurst exponent of daily revenue by rescaled-range analysis:
    * complete blocks of 8/16/32/64 days, per-block R/S from exact
    * k-scaled integer deviations (range and variance share the same
    * k·Σ scaling, so k cancels), block values micro-quantized before
    * the per-k mean, Hurst = OLS slope of ln(R/S) on ln(k) over the
    * four quantized points. */
  def q432: Q = {
    val rsFrag = "CAST(floor(CAST(1000000.0 * CAST(rng AS DOUBLE)" +
      " / sqrt(CAST(v AS DOUBLE)) AS DECIMAL(28,6))) AS BIGINT)"
    val slope = "CAST(floor(CAST(1000.0 * " +
      "(CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)" +
      " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))" +
      " / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)" +
      " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))" +
      " AS DECIMAL(28,6))) AS BIGINT)"
    Q("q432_hurst_exponent",
      Some(s"""
        |WITH daily AS (
        |  SELECT epoch_us(l_shipdate) // 86400000000 AS d,
        |         CAST(sum(CAST(l_extendedprice * 100 AS HUGEINT))
        |              AS BIGINT) AS x
        |  FROM lineitem GROUP BY 1),
        |ix AS (SELECT x, row_number() OVER (ORDER BY d) AS i
        |       FROM daily),
        |ks AS (SELECT unnest([8, 16, 32, 64]) AS k),
        |blk AS (
        |  SELECT ks.k, (ix.i - 1) // ks.k AS b, ix.i, ix.x
        |  FROM ks JOIN ix ON TRUE),
        |bs AS (
        |  SELECT k, b, count(*) AS cnt, sum(x) AS sx,
        |         sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM blk GROUP BY 1, 2),
        |cw AS (
        |  SELECT blk.k, blk.b,
        |         blk.k * CAST(sum(blk.x) OVER (PARTITION BY blk.k, blk.b
        |           ORDER BY blk.i) AS BIGINT)
        |           - (row_number() OVER (PARTITION BY blk.k, blk.b
        |              ORDER BY blk.i)) * CAST(bs.sx AS BIGINT) AS w
        |  FROM blk JOIN bs ON bs.k = blk.k AND bs.b = blk.b
        |  WHERE bs.cnt = blk.k),
        |rb AS (
        |  SELECT cw.k, cw.b, max(cw.w) - min(cw.w) AS rng,
        |         max(CAST(bs.k AS HUGEINT) * bs.sxx
        |             - CAST(bs.sx AS HUGEINT) * bs.sx) AS v
        |  FROM cw JOIN bs ON bs.k = cw.k AND bs.b = cw.b
        |  GROUP BY 1, 2),
        |rs AS (
        |  SELECT k, count(*) AS nb,
        |         sum($rsFrag) // count(*) AS rs_micro
        |  FROM rb WHERE v > 0 GROUP BY 1),
        |pts AS (
        |  SELECT CAST(floor(CAST(1000000.0 * ln(CAST(k AS DOUBLE))
        |           AS DECIMAL(28,6))) AS BIGINT) AS px,
        |         CAST(floor(CAST(1000000.0 *
        |           ln(CAST(rs_micro AS DOUBLE) / 1000000.0)
        |           AS DECIMAL(28,6))) AS BIGINT) AS py
        |  FROM rs),
        |mm AS (
        |  SELECT count(*) AS np, sum(px) AS sx, sum(py) AS sy,
        |         sum(CAST(px AS HUGEINT) * py) AS sxy,
        |         sum(CAST(px AS HUGEINT) * px) AS sxx
        |  FROM pts)
        |SELECT CAST((SELECT count(*) FROM ix) AS BIGINT) AS n_days,
        |       (SELECT CAST(rs_micro AS BIGINT) FROM rs WHERE k = 8)
        |         AS rs8_micro,
        |       (SELECT CAST(rs_micro AS BIGINT) FROM rs WHERE k = 16)
        |         AS rs16_micro,
        |       (SELECT CAST(rs_micro AS BIGINT) FROM rs WHERE k = 32)
        |         AS rs32_micro,
        |       (SELECT CAST(rs_micro AS BIGINT) FROM rs WHERE k = 64)
        |         AS rs64_micro,
        |       $slope AS hurst_milli
        |FROM mm
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d38 = "decimal(38,0)"
      val daily = Tables.lineitem(s, dir)
        .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"))
        .agg(expr("CAST(sum(CAST(l_extendedprice * 100 " +
          "AS DECIMAL(38,0))) AS BIGINT)").as("x"))
      // day dim is calendar-bounded → the index window is fine
      val ix = daily
        .withColumn("i", row_number().over(Window.orderBy(col("d")))
          .cast("long"))
        .select(col("i"), col("x"))
        .materialize() // feeds all four k passes AND the day count
      val nDays = ix.agg(count(lit(1)).as("n_days"))
      val ks = s.createDataFrame(Seq(8L, 16L, 32L, 64L).map(Tuple1(_)))
        .toDF("k")
      val blk = ks.crossJoin(ix)
        .select(col("k"), expr("(i - 1) div k").as("b"), col("i"),
          col("x"))
      val bs = blk.groupBy(col("k").as("__bk"), col("b").as("__bb"))
        .agg(count(lit(1)).as("cnt"), sum(col("x")).as("bsx"),
          sum(col("x").cast(d38) * col("x")).cast(d38).as("bsxx"))
      val wBlk = Window.partitionBy(col("k"), col("b"))
        .orderBy(col("i"))
      val cw = blk.join(broadcast(bs),
          col("__bk") === col("k") && col("__bb") === col("b"))
        .where(col("cnt") === col("k"))
        .withColumn("w", col("k") * sum(col("x")).over(wBlk)
          - row_number().over(wBlk).cast("long") * col("bsx"))
      val rb = cw.groupBy(col("k"), col("b"))
        .agg((max(col("w")) - min(col("w"))).as("rng"),
          max(col("k").cast(d38) * col("bsxx")
            - col("bsx").cast(d38) * col("bsx")).as("v"))
      val rs = rb.where(col("v") > 0)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("nb"),
          expr(s"sum($rsFrag) div count(1)").as("rs_micro"))
        .materialize() // 4-row dim feeds the pivot AND the fit
      val pts = rs.select(
        expr("CAST(floor(CAST(1000000.0 * ln(CAST(k AS DOUBLE)) " +
          "AS DECIMAL(28,6))) AS BIGINT)").as("px"),
        expr("CAST(floor(CAST(1000000.0 * " +
          "ln(CAST(rs_micro AS DOUBLE) / 1000000.0) " +
          "AS DECIMAL(28,6))) AS BIGINT)").as("py"))
      val mm = pts.agg(count(lit(1)).as("np"), sum(col("px")).as("sx"),
        sum(col("py")).as("sy"),
        sum(col("px").cast(d38) * col("py")).cast(d38).as("sxy"),
        sum(col("px").cast(d38) * col("px")).cast(d38).as("sxx"))
      val piv = rs.groupBy()
        .agg(max(when(col("k") === 8, col("rs_micro"))).as("rs8_micro"),
          max(when(col("k") === 16, col("rs_micro"))).as("rs16_micro"),
          max(when(col("k") === 32, col("rs_micro"))).as("rs32_micro"),
          max(when(col("k") === 64, col("rs_micro"))).as("rs64_micro"))
      mm.crossJoin(broadcast(piv)).crossJoin(broadcast(nDays))
        .select(col("n_days"), col("rs8_micro"), col("rs16_micro"),
          col("rs32_micro"), col("rs64_micro"),
          expr(slope).as("hurst_milli"))
    }
  }

  /** Kleinberg two-state burst detection on daily order volume:
    * Viterbi over {base rate r₀ = mean, burst rate r₁ = 2r₀} with
    * Poisson costs rate − c·ln(rate) and an ln(n) up-transition
    * penalty; each state's path metadata (burst count, burst days)
    * follows its argmin predecessor with PINNED tie-breaks (down on
    * tie, stay-up on tie). The fold is one IEEE-pinned op sequence
    * in both engines; rates are exact-count ratios. */
  def q433: Q = {
    def qm(x: String) =
      s"CAST(floor(CAST(($x) * 1000 AS DECIMAL(28,6))) AS BIGINT)"
    Q("q433_burst_detection",
      Some(s"""
        |WITH daily AS (
        |  SELECT epoch_us(o_orderdate) // 86400000000 AS d,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |t AS (SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS sc
        |      FROM daily),
        |v AS (
        |  SELECT t.n,
        |         CAST(t.sc AS DOUBLE) / CAST(t.n AS DOUBLE) AS r0,
        |         2.0 * (CAST(t.sc AS DOUBLE) / CAST(t.n AS DOUBLE))
        |           AS r1,
        |         ln(CAST(t.n AS DOUBLE)) AS pen,
        |         (SELECT list({'c0': CAST(0.0 AS DOUBLE),
        |                       'c1': CAST(0.0 AS DOUBLE),
        |                       'i0': CAST(0 AS BIGINT),
        |                       'd0': CAST(0 AS BIGINT),
        |                       'i1': CAST(0 AS BIGINT),
        |                       'd1': CAST(0 AS BIGINT),
        |                       'x': CAST(c AS DOUBLE)} ORDER BY d)
        |          FROM daily) AS vals
        |  FROM t),
        |f AS (
        |  SELECT n, list_reduce(
        |    list_prepend([{'c0': CAST(0.0 AS DOUBLE),
        |                   'c1': CAST(1000000.0 AS DOUBLE),
        |                   'i0': CAST(0 AS BIGINT),
        |                   'd0': CAST(0 AS BIGINT),
        |                   'i1': CAST(0 AS BIGINT),
        |                   'd1': CAST(0 AS BIGINT),
        |                   'x': CAST(0.0 AS DOUBLE)}],
        |      list_transform(vals, x -> [x])),
        |    (acc, e) -> [{
        |      'c0': CASE WHEN acc[1].c1 < acc[1].c0 THEN acc[1].c1
        |                 ELSE acc[1].c0 END
        |            + (r0 - e[1].x * ln(r0)),
        |      'c1': CASE WHEN acc[1].c0 + pen < acc[1].c1
        |                 THEN acc[1].c0 + pen ELSE acc[1].c1 END
        |            + (r1 - e[1].x * ln(r1)),
        |      'i0': CASE WHEN acc[1].c1 < acc[1].c0 THEN acc[1].i1
        |                 ELSE acc[1].i0 END,
        |      'd0': CASE WHEN acc[1].c1 < acc[1].c0 THEN acc[1].d1
        |                 ELSE acc[1].d0 END,
        |      'i1': CASE WHEN acc[1].c0 + pen < acc[1].c1
        |                 THEN acc[1].i0 + 1 ELSE acc[1].i1 END,
        |      'd1': CASE WHEN acc[1].c0 + pen < acc[1].c1
        |                 THEN acc[1].d0 ELSE acc[1].d1 END + 1,
        |      'x': e[1].x}]) AS st
        |  FROM v)
        |SELECT CAST(n AS BIGINT) AS n_days,
        |       CAST(CASE WHEN st[1].c0 <= st[1].c1 THEN st[1].i0
        |                 ELSE st[1].i1 END AS BIGINT) AS n_bursts,
        |       CAST(CASE WHEN st[1].c0 <= st[1].c1 THEN st[1].d0
        |                 ELSE st[1].d1 END AS BIGINT) AS burst_days,
        |       ${qm("st[1].c0")} AS cost0_milli,
        |       ${qm("st[1].c1")} AS cost1_milli
        |FROM f
        |""".stripMargin)) { (s, dir) =>
      import org.apache.spark.sql.types._
      val daily = Tables.orders(s, dir)
        .groupBy(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
          "div 86400000000").as("d"))
        .agg(count(lit(1)).as("c"))
        .select(lit(0L).as("g"), col("d"), col("c"))
        .materialize() // feeds the rate scalar AND the fold
      // rate scalars: 1-row bounded collect, same ratio both engines
      val tRow = daily.agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
        .collect()(0)
      val n = tRow.getLong(0); val sc = tRow.getLong(1)
      val r0 = sc.toDouble / n.toDouble
      val r1 = 2.0 * (sc.toDouble / n.toDouble)
      val pen = math.log(n.toDouble)
      val out = StructType(Seq(
        StructField("n_days", LongType, nullable = false),
        StructField("nb", LongType, nullable = false),
        StructField("bd", LongType, nullable = false),
        StructField("c0", DoubleType, nullable = false),
        StructField("c1", DoubleType, nullable = false)))
      case class Vit(c0: Double, c1: Double, i0: Long, d0: Long,
        i1: Long, d1: Long, nn: Long)
      graft.operators.OrderedFold.foldGroups[Vit](
        daily, Seq("g"), Seq(col("d")), out)(
        init = _ => Vit(0.0, 1000000.0, 0L, 0L, 0L, 0L, 0L),
        step = { case (st, row) =>
          val x = row.getLong(2).toDouble
          val down = st.c1 < st.c0
          val base0 = if (down) st.c1 else st.c0
          val up = st.c0 + pen
          val upWins = up < st.c1
          val base1 = if (upWins) up else st.c1
          Vit(base0 + (r0 - x * math.log(r0)),
            base1 + (r1 - x * math.log(r1)),
            if (down) st.i1 else st.i0,
            if (down) st.d1 else st.d0,
            if (upWins) st.i0 + 1 else st.i1,
            (if (upWins) st.d0 else st.d1) + 1,
            st.nn + 1)
        },
        emit = (_, st) => {
          val zero = st.c0 <= st.c1
          Iterator(
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](st.nn, if (zero) st.i0 else st.i1,
                if (zero) st.d0 else st.d1, st.c0, st.c1)))
        })
        .select(col("n_days"), col("nb").as("n_bursts"),
          col("bd").as("burst_days"),
          expr(qm("c0")).as("cost0_milli"),
          expr(qm("c1")).as("cost1_milli"))
    }
  }

  /** Borda and Condorcet rank aggregation over q412's three supplier
    * criteria (revenue ↑, return rate ↓, lead time ↓): Borda score =
    * Σ (n − rank_j), pairwise wins = majority-of-criteria dominance
    * counts, and the Condorcet flag (beats every other supplier).
    * All integer; the three rank windows run over the supplier
    * dim. */
  def q434: Q = Q(
    "q434_borda_condorcet",
    Some("""
      |WITH su AS (
      |  SELECT l.l_suppkey AS supp,
      |         sum(CAST(floor(CAST(l.l_extendedprice
      |              * (1.0 - l.l_discount) AS DECIMAL(18,9)) * 100)
      |              AS BIGINT)) AS rev,
      |         (1000000 * sum(CASE WHEN l.l_returnflag = 'R'
      |                        THEN 1 ELSE 0 END)) // count(*) AS ret,
      |         (1000 * sum(date_diff('day', o.o_orderdate,
      |                               l.l_shipdate))) // count(*) AS ld
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1),
      |rk AS (
      |  SELECT supp, rev, ret, ld,
      |         row_number() OVER (ORDER BY rev DESC, supp) AS r1,
      |         row_number() OVER (ORDER BY ret, supp) AS r2,
      |         row_number() OVER (ORDER BY ld, supp) AS r3,
      |         count(*) OVER () AS n
      |  FROM su),
      |borda AS (
      |  SELECT supp, CAST((n - r1) + (n - r2) + (n - r3) AS BIGINT)
      |           AS borda, r1, r2, r3, n
      |  FROM rk),
      |wins AS (
      |  SELECT a.supp, count(*) AS wins
      |  FROM rk a JOIN rk b ON a.supp <> b.supp
      |  WHERE (CASE WHEN a.r1 < b.r1 THEN 1 ELSE 0 END
      |         + CASE WHEN a.r2 < b.r2 THEN 1 ELSE 0 END
      |         + CASE WHEN a.r3 < b.r3 THEN 1 ELSE 0 END) >= 2
      |  GROUP BY 1)
      |SELECT CAST(b.supp AS BIGINT) AS supp, b.borda,
      |       CAST(coalesce(w.wins, 0) AS BIGINT) AS wins,
      |       CAST(CASE WHEN coalesce(w.wins, 0) = b.n - 1
      |            THEN 1 ELSE 0 END AS BIGINT) AS is_condorcet
      |FROM borda b LEFT JOIN wins w ON w.supp = b.supp
      |ORDER BY b.borda DESC, b.supp LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val su = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_suppkey").as("supp"))
      .agg(sum(floor((col("l_extendedprice")
          * (lit(1.0) - col("l_discount"))).cast("decimal(18,9)") * 100)
          .cast("long")).as("net"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("nr"),
        sum(datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
          .as("sl"),
        count(lit(1)).as("cnt"))
      .select(col("supp"), col("net").as("rev"),
        expr("(1000000 * nr) div cnt").as("ret"),
        expr("(1000 * sl) div cnt").as("ld"))
    // supplier dim: the three rank windows are dim-bounded
    val rk = su
      .withColumn("r1", row_number().over(
        Window.orderBy(col("rev").desc, col("supp"))).cast("long"))
      .withColumn("r2", row_number().over(
        Window.orderBy(col("ret"), col("supp"))).cast("long"))
      .withColumn("r3", row_number().over(
        Window.orderBy(col("ld"), col("supp"))).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy()).cast("long"))
      .materialize() // feeds Borda AND both pairwise legs
    val borda = rk.select(col("supp"),
      ((col("n") - col("r1")) + (col("n") - col("r2"))
        + (col("n") - col("r3"))).as("borda"), col("n"))
    val wins = rk.select(col("supp"), col("r1"), col("r2"), col("r3"))
      .join(rk.select(col("supp").as("__bs"), col("r1").as("__b1"),
        col("r2").as("__b2"), col("r3").as("__b3")),
        col("supp") =!= col("__bs"))
      .where((when(col("r1") < col("__b1"), 1).otherwise(0)
        + when(col("r2") < col("__b2"), 1).otherwise(0)
        + when(col("r3") < col("__b3"), 1).otherwise(0)) >= 2)
      .groupBy(col("supp").as("__ws")).agg(count(lit(1)).as("wins"))
    borda.join(wins, col("supp") === col("__ws"), "left")
      .select(col("supp"), col("borda"),
        coalesce(col("wins"), lit(0L)).as("wins"),
        when(coalesce(col("wins"), lit(0L)) === col("n") - 1, 1L)
          .otherwise(0L).as("is_condorcet"))
      .orderBy(col("borda").desc, col("supp")).limit(10)
  }

  /** 1-D Wasserstein (earth-mover) distance between urgent and
    * non-urgent order totals on a $100 grid: W₁ = binwidth ·
    * Σ|F₁ − F₂| with the CDF difference cross-multiplied to exact
    * integers — the optimal-transport sibling of q345's KS and
    * q424's AD. Bin dim is value-range-bounded. */
  def q435: Q = Q(
    "q435_wasserstein_order_totals",
    Some("""
      |WITH v AS (
      |  SELECT CAST(o_totalprice * 100 AS BIGINT) // 10000 AS bin,
      |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
      |           AS is_x
      |  FROM orders),
      |bd AS (
      |  SELECT bin, sum(is_x) AS cx, count(*) - sum(is_x) AS cy
      |  FROM v GROUP BY 1),
      |t AS (SELECT CAST(sum(cx) AS BIGINT) AS nx,
      |             CAST(sum(cy) AS BIGINT) AS ny FROM bd),
      |c AS (
      |  SELECT bin,
      |         CAST(sum(cx) OVER (ORDER BY bin) AS BIGINT) AS fx,
      |         CAST(sum(cy) OVER (ORDER BY bin) AS BIGINT) AS fy
      |  FROM bd),
      |agg AS (
      |  SELECT sum(abs(CAST(c.fx AS HUGEINT) * t.ny
      |                 - CAST(c.fy AS HUGEINT) * t.nx)) AS sd
      |  FROM c CROSS JOIN t)
      |SELECT t.nx AS n_urgent, t.ny AS n_other,
      |       CAST((SELECT count(*) FROM bd) AS BIGINT) AS n_bins,
      |       CAST((10000 * agg.sd) // (CAST(t.nx AS HUGEINT) * t.ny)
      |            AS BIGINT) AS w1_cents
      |FROM agg CROSS JOIN t
      |""".stripMargin)) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val bd = Tables.orders(s, dir)
      .select(expr("CAST(o_totalprice * 100 AS DECIMAL(38,0))" +
        " div 10000").as("bin"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("is_x"))
      .groupBy(col("bin"))
      .agg(sum(col("is_x")).as("cx"),
        (count(lit(1)) - sum(col("is_x"))).as("cy"))
      .materialize() // $100-bin dim feeds totals AND the CDF walk
    val t = bd.agg(sum(col("cx")).as("nx"), sum(col("cy")).as("ny"))
    val nb = bd.agg(count(lit(1)).as("n_bins"))
    // bin dim is value-range-bounded → the CDF window is fine
    val c = bd
      .withColumn("fx", sum(col("cx")).over(Window.orderBy(col("bin"))))
      .withColumn("fy", sum(col("cy")).over(Window.orderBy(col("bin"))))
    c.crossJoin(broadcast(t))
      .select(abs(col("fx").cast(d38) * col("ny")
        - col("fy").cast(d38) * col("nx")).as("ad"))
      .agg(sum(col("ad")).cast(d38).as("sd"))
      .crossJoin(broadcast(t))
      .crossJoin(broadcast(nb))
      .select(col("nx").as("n_urgent"), col("ny").as("n_other"),
        col("n_bins"),
        expr("CAST((10000 * sd) div (CAST(nx AS DECIMAL(38,0)) * ny) " +
          "AS BIGINT)").as("w1_cents"))
  }
}
