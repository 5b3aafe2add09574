package graft.queries

import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-7 dynamics wave: in-fold forecast backtesting, dynamic time
  * warping (exact integer DP, replayed by a recursive list-fold
  * oracle), graph modularity of the brand partition, bigram-LM
  * perplexity, and an l-diversity privacy audit. */
object DynamicsQueries {

  val all: Seq[Q] = Seq(q426, q427, q428, q429, q430)

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
}
