package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-8 trend/audit wave: a delta-encoding width estimate for the
  * key column under its sort order, a small-files read-amplification
  * audit, the Mann–Kendall trend test with tie correction, the
  * Cox–Stuart paired-sign trend test, and Bowker's symmetry test on
  * the user event-transition matrix. The pair statistics live on the
  * CALENDAR-bounded day dim (day² pairs don't grow with the fact
  * table); ranks ride bucket-parallel globalRankCum. */
object TrendAuditQueries {

  val all: Seq[Q] = Seq(q631, q632, q633, q634, q635)

  /** Delta-encoding width estimate for l_orderkey under its own sort
    * order in 8,192-row chunks: per chunk the RANGE-based upper bound
    * bits = ⌊log2(max(range,1))⌋+1 on any in-chunk delta, and the
    * estimated encoded size against plain 8-byte storage. Chunk
    * layout comes from the bucket-parallel rank (q603's recipe) — the
    * "is this column worth delta-encoding" storage probe. */
  def q631: Q = Q(
    "q631_delta_encoding_bits",
    Some("""
      |WITH rk AS (
      |  SELECT (row_number() OVER (ORDER BY l_orderkey, l_linenumber)
      |            - 1) // 8192 AS chunk,
      |         l_orderkey AS k
      |  FROM lineitem),
      |g AS (
      |  SELECT chunk, count(*) AS rows_, min(k) AS mn, max(k) AS mx,
      |         CAST(floor(log2(CAST(greatest(mx - mn, 1) AS DOUBLE)))
      |              AS BIGINT) + 1 AS bits
      |  FROM rk GROUP BY 1),
      |ag AS (
      |  SELECT count(*) AS n_chunks, sum(rows_) AS n_rows,
      |         sum(bits * rows_) AS bit_rows
      |  FROM g)
      |SELECT CAST(n_chunks AS BIGINT) AS n_chunks,
      |       CAST(n_rows AS BIGINT) AS n_rows,
      |       CAST((1000 * bit_rows) // n_rows AS BIGINT)
      |         AS avg_bits_milli,
      |       CAST((1000 * bit_rows) // (64 * n_rows) AS BIGINT)
      |         AS size_ratio_milli
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val rk = graft.dedup.SortedNeighborhood.globalRankCum(
        Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("k"), col("l_linenumber"),
            (col("l_orderkey") * 8 + col("l_linenumber")).as("uid"))
          .withColumn("__bkt", expr("k div 4096")),
        idCol = "uid", bucketCol = "__bkt", tieCols = Seq("k"))
      .select(expr("(__rank - 1) div 8192").as("chunk"), col("k"))
    val g = rk.groupBy(col("chunk"))
      .agg(count(lit(1)).as("rows_"), min(col("k")).as("mn"),
        max(col("k")).as("mx"))
      .withColumn("bits",
        expr("CAST(floor(log2(CAST(greatest(mx - mn, 1) AS DOUBLE)))" +
          " AS BIGINT) + 1"))
    g.agg(count(lit(1)).as("n_chunks"), sum(col("rows_")).as("n_rows"),
        sum(col("bits") * col("rows_")).as("bit_rows"))
      .select(col("n_chunks"), col("n_rows"),
        expr("(1000 * bit_rows) div n_rows").as("avg_bits_milli"),
        expr("(1000 * bit_rows) div (64 * n_rows)")
          .as("size_ratio_milli"))
  }

  /** Small-files read-amplification audit: treat each (event_type,
    * day) partition as one file with bytes ≈ 64 + len(props) per row;
    * amplification = actual file count over the ideal
    * ⌈bytes / 1 MiB⌉ packing — the compaction-backlog number a
    * lakehouse table health check leads with. */
  def q632: Q = Q(
    "q632_small_files_audit",
    Some("""
      |WITH f AS (
      |  SELECT event_type,
      |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |         sum(64 + length(coalesce(props, ''))) AS bytes
      |  FROM events GROUP BY 1, 2),
      |ag AS (
      |  SELECT event_type, count(*) AS n_files, sum(bytes) AS bytes,
      |         sum(CAST(ceil(CAST(bytes AS DOUBLE) / 1048576.0)
      |             AS BIGINT)) AS pad
      |  FROM f GROUP BY 1),
      |id_ AS (
      |  SELECT event_type, n_files, bytes,
      |         greatest(CAST(ceil(CAST(bytes AS DOUBLE) / 1048576.0)
      |                  AS BIGINT), 1) AS ideal
      |  FROM ag)
      |SELECT event_type, CAST(n_files AS BIGINT) AS n_files,
      |       CAST(bytes AS BIGINT) AS total_bytes,
      |       CAST(ideal AS BIGINT) AS ideal_files,
      |       CAST((1000 * n_files) // ideal AS BIGINT)
      |         AS amplification_milli
      |FROM id_ ORDER BY event_type
      |""".stripMargin)) { (s, dir) =>
    val f = Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("(ts div 1000) div 86400000000").as("day"))
      .agg(sum(lit(64L) + length(coalesce(col("props"), lit(""))))
        .as("bytes"))
    f.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"))
      .withColumn("ideal",
        greatest(expr("CAST(ceil(CAST(bytes AS DOUBLE) / 1048576.0)" +
          " AS BIGINT)"), lit(1L)))
      .select(col("event_type"), col("n_files"),
        col("bytes").as("total_bytes"), col("ideal").as("ideal_files"),
        expr("(1000 * n_files) div ideal").as("amplification_milli"))
      .orderBy(col("event_type"))
  }

  /** Mann–Kendall trend test on daily net revenue (dollars): exact
    * S = Σ_{i<j} sign(v_j − v_i) over day PAIRS — day² is bounded by
    * the calendar, not the data — with the tie-corrected variance
    * Var = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 and a
    * continuity-corrected z². The distribution-free "is there ANY
    * monotone drift" screen Sen's slope (q theil_sen) quantifies. */
  def q633: Q = Q(
    "q633_mann_kendall",
    Some(s"""
      |WITH ${DailyNet.sql.stripPrefix("\n")},
      |dv AS (
      |  SELECT day, CAST(floor(CAST(net AS DOUBLE) / 100.0) AS BIGINT)
      |           AS v
      |  FROM d),
      |pr AS (
      |  SELECT sum(CASE WHEN b.v > a.v THEN 1
      |                  WHEN b.v < a.v THEN -1 ELSE 0 END) AS s
      |  FROM dv a JOIN dv b ON b.day > a.day),
      |nn AS (SELECT count(*) AS n FROM dv),
      |ties AS (
      |  SELECT coalesce(sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)),
      |                  0) AS tc
      |  FROM (SELECT v, count(*) AS t FROM dv GROUP BY 1
      |        HAVING count(*) > 1) g)
      |SELECT CAST(nn.n AS BIGINT) AS n_days, CAST(pr.s AS BIGINT) AS s,
      |       CAST(floor((CAST(abs(pr.s) - 1 AS DOUBLE))
      |           * (CAST(abs(pr.s) - 1 AS DOUBLE))
      |         / (CAST(CAST(nn.n AS HUGEINT) * (nn.n - 1) * (2 * nn.n + 5)
      |                 - ties.tc AS DOUBLE) / 18.0)
      |         * 1000.0) AS BIGINT) AS z2_milli
      |FROM pr CROSS JOIN nn CROSS JOIN ties
      |""".stripMargin)) { (s, dir) =>
    val d = DailyNet.frame(s, dir)
      .select(col("day"),
        expr("CAST(floor(CAST(net AS DOUBLE) / 100.0) AS BIGINT)")
          .as("v"))
      .materialize() // the pair join, n, and ties read it
    val pr = d.as("a").join(d.as("b"), col("b.day") > col("a.day"))
      .agg(sum(when(col("b.v") > col("a.v"), 1L)
        .when(col("b.v") < col("a.v"), -1L).otherwise(0L)).as("s"))
    val nn = d.agg(count(lit(1)).as("n"))
    val ties = d.groupBy(col("v")).agg(count(lit(1)).as("t"))
      .where(col("t") > 1)
      .agg(coalesce(sum(expr(
        "CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)")), lit(0))
        .as("tc"))
    pr.crossJoin(broadcast(nn)).crossJoin(broadcast(ties))
      .select(col("n").as("n_days"), col("s"),
        expr("CAST(floor((CAST(abs(s) - 1 AS DOUBLE))" +
          " * (CAST(abs(s) - 1 AS DOUBLE))" +
          " / (CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) * (2 * n + 5)" +
          " - tc AS DOUBLE) / 18.0)" +
          " * 1000.0) AS BIGINT)").as("z2_milli"))
  }

  /** Cox–Stuart paired-sign trend test: day i paired with day i + m
    * (m = ⌊n/2⌋ — first half vs second half of the observed-day
    * series), count rises vs falls, continuity-corrected
    * z² = (|plus − minus| − 1)²/(plus + minus). The five-line trend
    * test that needs nothing but signs. */
  def q634: Q = Q(
    "q634_cox_stuart",
    Some(s"""
      |WITH ${DailyNet.sql.stripPrefix("\n")},
      |dv AS (SELECT day, net AS v FROM d),
      |rk AS MATERIALIZED (
      |  SELECT v, row_number() OVER (ORDER BY day) AS rn FROM dv),
      |nn AS (SELECT count(*) AS n, count(*) // 2 AS m FROM dv),
      |pairs AS (
      |  SELECT a.v AS v1, b.v AS v2
      |  FROM rk a CROSS JOIN nn
      |  JOIN rk b ON b.rn = a.rn + nn.m
      |  WHERE a.rn <= nn.m),
      |cnt AS (
      |  SELECT count(*) FILTER (v2 > v1) AS plus,
      |         count(*) FILTER (v2 < v1) AS minus
      |  FROM pairs)
      |SELECT CAST(nn.n AS BIGINT) AS n_days,
      |       CAST(cnt.plus AS BIGINT) AS n_rises,
      |       CAST(cnt.minus AS BIGINT) AS n_falls,
      |       CAST(floor((CAST(abs(cnt.plus - cnt.minus) - 1 AS DOUBLE))
      |           * (CAST(abs(cnt.plus - cnt.minus) - 1 AS DOUBLE))
      |         / CAST(cnt.plus + cnt.minus AS DOUBLE) * 1000.0)
      |         AS BIGINT) AS z2_milli
      |FROM cnt CROSS JOIN nn
      |""".stripMargin)) { (s, dir) =>
    val d = DailyNet.frame(s, dir)
      .select(col("day"), col("net").as("v"))
      .materialize()
    // the rank runs over the calendar-bounded day dim
    val rk = d.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("day"))))
    val nn = d.agg(count(lit(1)).as("n"), expr("count(1) div 2").as("m"))
    val pairs = rk.select(col("v").as("v1"), col("rn").as("rn1"))
      .crossJoin(broadcast(nn))
      .where(col("rn1") <= col("m"))
      .join(rk.select(col("v").as("v2"), col("rn").as("rn2")),
        col("rn2") === col("rn1") + col("m"))
    val cnt = pairs.agg(count(when(col("v2") > col("v1"), 1)).as("plus"),
      count(when(col("v2") < col("v1"), 1)).as("minus"))
    cnt.crossJoin(broadcast(nn))
      .select(col("n").as("n_days"), col("plus").as("n_rises"),
        col("minus").as("n_falls"),
        expr("CAST(floor((CAST(abs(plus - minus) - 1 AS DOUBLE))" +
          " * (CAST(abs(plus - minus) - 1 AS DOUBLE))" +
          " / CAST(plus + minus AS DOUBLE) * 1000.0) AS BIGINT)")
          .as("z2_milli"))
  }

  /** Bowker's symmetry test on the user event-transition matrix:
    * χ² = Σ_{i<j} (n_ij − n_ji)²/(n_ij + n_ji) — is traffic between
    * event types directionally balanced, or does (view→purchase)
    * genuinely outweigh (purchase→view)? Transitions come from
    * user-partitioned lag windows (scale-parallel by user); the
    * matrix is the 4×4 type dim. */
  def q635: Q = Q(
    "q635_bowker_symmetry",
    Some("""
      |WITH ev AS (
      |  SELECT user_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
      |           AS prev
      |  FROM events),
      |tr AS (
      |  SELECT prev AS a, event_type AS b, count(*) AS c
      |  FROM ev WHERE prev IS NOT NULL GROUP BY 1, 2),
      |pp AS (
      |  SELECT x.a, x.b, x.c AS nij, coalesce(y.c, 0) AS nji
      |  FROM tr x LEFT JOIN tr y ON y.a = x.b AND y.b = x.a
      |  WHERE x.a < x.b),
      |ag AS (
      |  SELECT count(*) AS n_cells, sum(nij + nji) AS n_offdiag,
      |         sum(CAST(floor(CAST((nij - nji) * (nij - nji) AS DOUBLE)
      |             / CAST(nij + nji AS DOUBLE) * 1000.0) AS BIGINT))
      |           AS chi2_milli
      |  FROM pp WHERE nij + nji > 0)
      |SELECT CAST(n_cells AS BIGINT) AS n_pairs,
      |       CAST(n_offdiag AS BIGINT) AS n_transitions,
      |       CAST(chi2_milli AS BIGINT) AS chi2_milli
      |FROM ag
      |""".stripMargin)) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .withColumn("prev", lag(col("event_type"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(expr("ts div 1000"), col("event_id"))))
    val tr = ev.where(col("prev").isNotNull)
      .groupBy(col("prev").as("a"), col("event_type").as("b"))
      .agg(count(lit(1)).as("c"))
      .materialize() // both matrix halves read it
    val pp = tr.where(col("a") < col("b"))
      .join(tr.select(col("a").as("ya"), col("b").as("yb"),
        col("c").as("yc")),
        col("ya") === col("b") && col("yb") === col("a"), "left")
      .select(col("a"), col("b"), col("c").as("nij"),
        coalesce(col("yc"), lit(0L)).as("nji"))
    pp.where(col("nij") + col("nji") > 0)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("nij") + col("nji")).as("n_transitions"),
        sum(expr("CAST(floor(CAST((nij - nji) * (nij - nji) AS DOUBLE)" +
          " / CAST(nij + nji AS DOUBLE) * 1000.0) AS BIGINT)"))
          .as("chi2_milli"))
      .select(col("n_pairs"), col("n_transitions"), col("chi2_milli"))
  }
}
