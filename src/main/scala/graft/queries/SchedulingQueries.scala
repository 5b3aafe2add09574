package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.Materialize.MatOps
import graft.Tables

/** Round-9 scheduling-theory wave: the classical single/two-machine
  * dispatch rules replayed on day-grain jobs — EDD (optimal for max
  * lateness), SPT/WSPT (optimal for total / weighted completion),
  * Johnson's two-machine flow-shop rule with its CLOSED-FORM makespan
  * (max over prefixes — no simulation), Moore–Hodgson's late-job
  * minimizer (the one genuinely sequential algorithm, an OrderedFold
  * heap replay mirrored by a RECURSIVE CTE oracle), and critical-ratio
  * dispatch vs EDD. Jobs are the ship-days of 1996 (≤366, calendar
  * dim): p = day's total quantity, w = line count, and the stated
  * synthetic due date due_t = (13·t·p̄) div 10 in day order — exact
  * integers everywhere, so every completion/lateness figure is
  * hash-exact. */
object SchedulingQueries {

  val all: Seq[Q] = Seq(q721, q722, q723, q724, q725)

  /** Oracle CTE `jobs(t, day, p, w, p1, p2, due)`. */
  private def sqlJobs: String = """
    |j0 AS (
    |  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
    |         sum(CAST(l_quantity AS BIGINT)) AS p,
    |         count(*) AS w,
    |         sum(CASE WHEN l_linenumber % 2 = 1
    |             THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS p1,
    |         sum(CASE WHEN l_linenumber % 2 = 0
    |             THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS p2
    |  FROM lineitem WHERE year(l_shipdate) = 1996 GROUP BY 1),
    |jb AS (
    |  SELECT row_number() OVER (ORDER BY day) AS t, day, p, w, p1, p2,
    |         sum(p) OVER () AS tp, count(*) OVER () AS n
    |  FROM j0),
    |jobs AS (
    |  SELECT t, day, p, w, p1, p2,
    |         (13 * t * (tp // n)) // 10 AS due
    |  FROM jb)""".stripMargin

  private def jobs(s: SparkSession, dir: String): DataFrame = {
    val j0 = Tables.lineitem(s, dir)
      .where(year(col("l_shipdate")) === 1996)
      .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
        " div 86400000000").as("day"))
      .agg(sum(col("l_quantity").cast("long")).as("p"),
        count(lit(1)).as("w"),
        sum(when(col("l_linenumber") % 2 === 1,
          col("l_quantity").cast("long")).otherwise(0L)).as("p1"),
        sum(when(col("l_linenumber") % 2 === 0,
          col("l_quantity").cast("long")).otherwise(0L)).as("p2"))
    val one = Window.partitionBy(lit(1))
    j0.withColumn("t", row_number().over(Window.orderBy(col("day"))))
      .withColumn("tp", sum(col("p")).over(one))
      .withColumn("n", count(lit(1)).over(one))
      .select(col("t"), col("day"), col("p"), col("w"), col("p1"),
        col("p2"),
        expr("(13 * t * (tp div n)) div 10").as("due"))
  }

  /** EDD sequence (due asc — optimal for L_max by Jackson's rule):
    * max lateness, total tardiness, and the late-job count, all from
    * one prefix sum over the ≤366-job dim. */
  def q721: Q = Q(
    "q721_edd_max_lateness",
    Some(s"""
      |WITH ${sqlJobs},
      |sq AS (
      |  SELECT due, sum(p) OVER (ORDER BY due, day) AS c
      |  FROM jobs)
      |SELECT CAST(count(*) AS BIGINT) AS n_jobs,
      |       CAST(max(c - due) AS BIGINT) AS max_lateness,
      |       CAST(sum(greatest(c - due, 0)) AS BIGINT)
      |         AS total_tardiness,
      |       CAST(sum(CASE WHEN c > due THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_late
      |FROM sq
      |""".stripMargin)) { (s, dir) =>
    jobs(s, dir)
      .withColumn("c", sum(col("p"))
        .over(Window.orderBy(col("due"), col("day"))))
      .agg(count(lit(1)).as("n_jobs"),
        max(col("c") - col("due")).as("max_lateness"),
        sum(greatest(col("c") - col("due"), lit(0L)))
          .as("total_tardiness"),
        sum(when(col("c") > col("due"), 1L).otherwise(0L)).as("n_late"))
  }

  /** SPT vs WSPT: total completion time under SPT (p asc — optimal
    * for ΣC) and weighted completion ΣwC under WSPT (p/w asc, compared
    * via the quantized integer key 10⁶p div w) vs under SPT — the gap
    * is the price of ignoring weights. */
  def q722: Q = Q(
    "q722_spt_wspt",
    Some(s"""
      |WITH ${sqlJobs},
      |sp AS (
      |  SELECT w, sum(p) OVER (ORDER BY p, day) AS c
      |  FROM jobs),
      |ws AS (
      |  SELECT w, sum(p) OVER (ORDER BY (1000000 * p) // w, day) AS c
      |  FROM jobs)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM sp) AS n_jobs,
      |       (SELECT CAST(sum(c) AS BIGINT) FROM sp)
      |         AS spt_total_completion,
      |       (SELECT CAST(sum(CAST(w AS HUGEINT) * c) AS BIGINT)
      |        FROM ws) AS wspt_weighted_completion,
      |       (SELECT CAST(sum(CAST(w AS HUGEINT) * c) AS BIGINT)
      |        FROM sp) AS spt_weighted_completion
      |""".stripMargin)) { (s, dir) =>
    val j = jobs(s, dir).materialize() // ≤366-job dim, feeds two orders
    val sp = j.withColumn("c",
        sum(col("p")).over(Window.orderBy(col("p"), col("day"))))
      .agg(count(lit(1)).as("n_jobs"),
        sum(col("c")).as("spt_total_completion"),
        sum(col("w").cast("decimal(38,0)") * col("c"))
          .cast("long").as("spt_weighted_completion"))
    val ws = j.withColumn("c",
        sum(col("p")).over(
          Window.orderBy(expr("(1000000 * p) div w"), col("day"))))
      .agg(sum(col("w").cast("decimal(38,0)") * col("c"))
        .cast("long").as("wspt_weighted_completion"))
    sp.crossJoin(broadcast(ws))
      .select(col("n_jobs"), col("spt_total_completion"),
        col("wspt_weighted_completion"), col("spt_weighted_completion"))
  }

  /** Johnson's rule for the two-machine flow shop (odd-line quantity =
    * stage 1, even-line = stage 2): jobs with p1<p2 first by p1 asc,
    * the rest by p2 desc. The makespan needs NO simulation — it is
    * max_k (Σ_{i≤k} p1_i + Σ_{i≥k} p2_i) over the sequence, one
    * prefix/suffix window pass; also reports stage-2 idle time. */
  def q723: Q = Q(
    "q723_johnson_flowshop",
    Some(s"""
      |WITH ${sqlJobs},
      |sq AS (
      |  SELECT day, p1, p2,
      |         CASE WHEN p1 < p2 THEN 0 ELSE 1 END AS grp,
      |         CASE WHEN p1 < p2 THEN p1 ELSE -p2 END AS jkey
      |  FROM jobs),
      |pf AS (
      |  SELECT day,
      |         sum(p1) OVER (ORDER BY grp, jkey, day) AS c1,
      |         sum(p2) OVER (ORDER BY grp, jkey, day
      |           ROWS BETWEEN CURRENT ROW
      |           AND UNBOUNDED FOLLOWING) AS s2,
      |         sum(p2) OVER () AS tp2
      |  FROM sq),
      |mk AS (
      |  SELECT c1 + s2 AS span, day, tp2
      |  FROM pf ORDER BY c1 + s2 DESC, day LIMIT 1)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM sq) AS n_jobs,
      |       CAST(span AS BIGINT) AS makespan,
      |       CAST(day AS BIGINT) AS bottleneck_day,
      |       CAST(span - tp2 AS BIGINT) AS stage2_idle
      |FROM mk
      |""".stripMargin)) { (s, dir) =>
    val sq = jobs(s, dir)
      .select(col("day"), col("p1"), col("p2"),
        when(col("p1") < col("p2"), 0L).otherwise(1L).as("grp"),
        when(col("p1") < col("p2"), col("p1")).otherwise(-col("p2"))
          .as("jkey"))
      .materialize()
    val ord = Window.orderBy(col("grp"), col("jkey"), col("day"))
    val pf = sq
      .withColumn("c1", sum(col("p1")).over(ord))
      .withColumn("s2", sum(col("p2")).over(
        ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("tp2", sum(col("p2")).over(Window.partitionBy(lit(1))))
      .withColumn("nj", count(lit(1)).over(Window.partitionBy(lit(1))))
    pf.select((col("c1") + col("s2")).as("span"), col("day"),
        col("tp2"), col("nj"))
      .orderBy(col("span").desc, col("day"))
      .limit(1)
      .select(col("nj").as("n_jobs"), col("span").as("makespan"),
        col("day").cast("long").as("bottleneck_day"),
        (col("span") - col("tp2")).as("stage2_idle"))
  }

  /** Moore–Hodgson: the minimum number of late jobs — walk the EDD
    * sequence keeping a max-heap of scheduled processing times; when
    * the running time passes a due date, evict the LONGEST scheduled
    * job. Spark side is an OrderedFold heap replay (366 steps); the
    * oracle replays the identical walk as a RECURSIVE CTE whose state
    * is a sorted list (the house engine-stable fold shape). */
  def q724: Q = Q(
    "q724_moore_hodgson",
    Some(s"""
      |WITH RECURSIVE ${sqlJobs},
      |sq AS (
      |  SELECT row_number() OVER (ORDER BY due, day) AS i, p, due
      |  FROM jobs),
      |nn AS (SELECT count(*) AS n FROM sq),
      |mh AS (
      |  SELECT 0 AS i, CAST(0 AS HUGEINT) AS tm,
      |         CAST([] AS BIGINT[]) AS heap, 0 AS late
      |  UNION ALL
      |  SELECT sq.i,
      |         CASE WHEN mh.tm + sq.p > sq.due
      |              THEN mh.tm + sq.p - list_sort(
      |                     list_append(mh.heap, sq.p))[-1]
      |              ELSE mh.tm + sq.p END,
      |         CASE WHEN mh.tm + sq.p > sq.due
      |              THEN list_sort(list_append(mh.heap, sq.p))[
      |                     1:len(list_append(mh.heap, sq.p)) - 1]
      |              ELSE list_sort(list_append(mh.heap, sq.p)) END,
      |         mh.late + CASE WHEN mh.tm + sq.p > sq.due
      |                        THEN 1 ELSE 0 END
      |  FROM mh JOIN sq ON sq.i = mh.i + 1)
      |SELECT CAST(nn.n AS BIGINT) AS n_jobs,
      |       CAST(nn.n - mh.late AS BIGINT) AS n_on_time,
      |       CAST(mh.late AS BIGINT) AS n_late,
      |       CAST(mh.tm AS BIGINT) AS on_time_makespan
      |FROM mh CROSS JOIN nn WHERE mh.i = nn.n
      |""".stripMargin)) { (s, dir) =>
    val in = jobs(s, dir)
      .select(lit(0L).as("g"), col("due"), col("day"), col("p"))
    val out = StructType(Seq(
      StructField("n_jobs", LongType, nullable = false),
      StructField("n_on_time", LongType, nullable = false),
      StructField("n_late", LongType, nullable = false),
      StructField("on_time_makespan", LongType, nullable = false)))
    // state: (max-heap of scheduled p, running time, late count, seen)
    final case class St(
        heap: java.util.PriorityQueue[Long], var tm: Long,
        var late: Long, var n: Long)
    graft.operators.OrderedFold.foldGroups[St](
      in, Seq("g"), Seq(col("due"), col("day")), out)(
      init = _ => St(new java.util.PriorityQueue[Long](11,
        java.util.Collections.reverseOrder[Long]()), 0L, 0L, 0L),
      step = { (st, row) =>
        val due = row.getLong(1); val p = row.getLong(3)
        st.heap.add(p); st.tm += p; st.n += 1
        if (st.tm > due) { st.tm -= st.heap.poll(); st.late += 1 }
        st
      },
      emit = (_, st) => Iterator.single(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](st.n, st.n - st.late, st.late, st.tm))))
  }

  /** Critical-ratio dispatch (due/p asc via the integer key
    * 10⁶·due div p) vs EDD: total and max tardiness under each static
    * sequence — how much the ratio rule gives up on this load. */
  def q725: Q = Q(
    "q725_critical_ratio",
    Some(s"""
      |WITH ${sqlJobs},
      |cr AS (
      |  SELECT due, sum(p) OVER (ORDER BY (1000000 * due) // p, day)
      |           AS c
      |  FROM jobs),
      |ed AS (
      |  SELECT due, sum(p) OVER (ORDER BY due, day) AS c
      |  FROM jobs)
      |SELECT (SELECT CAST(count(*) AS BIGINT) FROM cr) AS n_jobs,
      |       (SELECT CAST(sum(greatest(c - due, 0)) AS BIGINT) FROM cr)
      |         AS cr_total_tardiness,
      |       (SELECT CAST(max(greatest(c - due, 0)) AS BIGINT) FROM cr)
      |         AS cr_max_tardiness,
      |       (SELECT CAST(sum(greatest(c - due, 0)) AS BIGINT) FROM ed)
      |         AS edd_total_tardiness
      |""".stripMargin)) { (s, dir) =>
    val j = jobs(s, dir).materialize()
    val cr = j.withColumn("c", sum(col("p")).over(
        Window.orderBy(expr("(1000000 * due) div p"), col("day"))))
      .agg(count(lit(1)).as("n_jobs"),
        sum(greatest(col("c") - col("due"), lit(0L)))
          .as("cr_total_tardiness"),
        max(greatest(col("c") - col("due"), lit(0L)))
          .as("cr_max_tardiness"))
    val ed = j.withColumn("c", sum(col("p")).over(
        Window.orderBy(col("due"), col("day"))))
      .agg(sum(greatest(col("c") - col("due"), lit(0L)))
        .as("edd_total_tardiness"))
    cr.crossJoin(broadcast(ed))
      .select(col("n_jobs"), col("cr_total_tardiness"),
        col("cr_max_tardiness"), col("edd_total_tardiness"))
  }
}
