package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps
import graft.Tables

/** Round-10 customer-journey sequence wave: each customer's order
  * history becomes a priority-digit STRING (first 12 orders by date,
  * each order contributing the leading digit of its priority), and
  * the wave audits the population against its MODAL journey with
  * plain edit distance: the distance histogram, the most deviant
  * customers, segment-level conformance, prefix conformance by
  * journey length, and the journey-frequency head.
  *
  * Exactness: journeys are deterministic ordered aggregations (order
  * by date then key, both sides); distances use the engines' standard
  * unit-cost Levenshtein builtins on identical strings — the value is
  * definitionally unique, so the oracle gate also cross-checks the
  * two independent implementations. Modal ties break lexicographic.
  *
  * Scale: one orders scan groups straight to the customer dim
  * (ordered collect of ≤12 chars per customer); the modal journey is
  * a 1-row broadcast; distances are scan-stage column ops on the
  * aggregated dim. */
object JourneyQueries {

  val all: Seq[Q] = Seq(q986, q987, q988, q989, q990)

  /** Journeys + modal CTEs: jy(ck, j), md(mj). */
  private def sqlJy: String = """
    |jy AS MATERIALIZED (
    |  SELECT o_custkey AS ck,
    |         substring(string_agg(substring(o_orderpriority, 1, 1), ''
    |           ORDER BY o_orderdate, o_orderkey), 1, 12) AS j
    |  FROM orders GROUP BY 1),
    |md AS (SELECT j AS mj FROM jy GROUP BY 1
    |       ORDER BY count(*) DESC, j LIMIT 1)""".stripMargin

  /** Spark twin: (journeys jy(ck, j), modal 1-row md(mj)). */
  private def journeys(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val jy = Tables.orders(s, dir)
      .select(col("o_custkey").as("ck"), col("o_orderdate").as("dt"),
        col("o_orderkey").as("ok"),
        substring(col("o_orderpriority"), 1, 1).as("ch"))
      .groupBy(col("ck"))
      .agg(substring(concat_ws("",
        transform(array_sort(collect_list(struct(col("dt"), col("ok"),
          col("ch")))), x => x.getField("ch"))), 1, 12).as("j"))
      .materialize() // customer-dim journey table, read 2-3× per query
    val md = jy.groupBy(col("j")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("j")).limit(1)
      .select(col("j").as("mj"))
    (jy, md)
  }

  /** Edit-distance-to-modal histogram. */
  def q986: Q = Q(
    "q986_journey_distance_hist",
    Some(s"""
      |WITH ${sqlJy}
      |SELECT CAST(levenshtein(j, mj) AS BIGINT) AS dist,
      |       CAST(count(*) AS BIGINT) AS n_customers
      |FROM jy CROSS JOIN md GROUP BY 1 ORDER BY dist
      |""".stripMargin)) { (s, dir) =>
    val (jy, md) = journeys(s, dir)
    jy.crossJoin(broadcast(md))
      .select(levenshtein(col("j"), col("mj")).cast("long").as("dist"))
      .groupBy(col("dist")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("dist"))
  }

  /** The 10 most deviant customers. */
  def q987: Q = Q(
    "q987_most_deviant_journeys",
    Some(s"""
      |WITH ${sqlJy}
      |SELECT CAST(ck AS BIGINT) AS custkey,
      |       CAST(length(j) AS BIGINT) AS journey_len,
      |       CAST(levenshtein(j, mj) AS BIGINT) AS dist
      |FROM jy CROSS JOIN md
      |ORDER BY dist DESC, custkey LIMIT 10
      |""".stripMargin)) { (s, dir) =>
    val (jy, md) = journeys(s, dir)
    jy.crossJoin(broadcast(md))
      .select(col("ck").cast("long").as("custkey"),
        length(col("j")).cast("long").as("journey_len"),
        levenshtein(col("j"), col("mj")).cast("long").as("dist"))
      .orderBy(col("dist").desc, col("custkey")).limit(10)
  }

  /** Conformance by market segment: mean distance (milli) and the
    * worst journey per segment. */
  def q988: Q = Q(
    "q988_segment_conformance",
    Some(s"""
      |WITH ${sqlJy}
      |SELECT c_mktsegment AS segment,
      |       CAST(count(*) AS BIGINT) AS n_customers,
      |       CAST((1000 * sum(levenshtein(j, mj))) // count(*)
      |            AS BIGINT) AS mean_dist_milli,
      |       CAST(max(levenshtein(j, mj)) AS BIGINT) AS max_dist
      |FROM jy CROSS JOIN md
      |JOIN customer ON c_custkey = ck
      |GROUP BY 1 ORDER BY segment
      |""".stripMargin)) { (s, dir) =>
    val (jy, md) = journeys(s, dir)
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey").as("ck"), col("c_mktsegment").as("segment"))
    jy.crossJoin(broadcast(md)).join(cust, "ck")
      .select(col("segment"),
        levenshtein(col("j"), col("mj")).cast("long").as("d"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"), sum(col("d")).as("sd"),
        max(col("d")).as("max_dist"))
      .select(col("segment"), col("n_customers"),
        expr("CAST((1000 * sd) div n_customers AS BIGINT)")
          .as("mean_dist_milli"),
        col("max_dist"))
      .orderBy(col("segment"))
  }

  /** Prefix conformance by journey length: does the journey START the
    * modal way (first 3 chars)? */
  def q989: Q = Q(
    "q989_prefix_conformance",
    Some(s"""
      |WITH ${sqlJy}
      |SELECT CAST(length(j) AS BIGINT) AS journey_len,
      |       CAST(count(*) AS BIGINT) AS n_customers,
      |       CAST(sum(CASE WHEN substring(j, 1, 3) =
      |            substring(mj, 1, 3) THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_prefix_match,
      |       CAST((1000 * sum(CASE WHEN substring(j, 1, 3) =
      |            substring(mj, 1, 3) THEN 1 ELSE 0 END)) // count(*)
      |            AS BIGINT) AS match_milli
      |FROM jy CROSS JOIN md GROUP BY 1 ORDER BY journey_len
      |""".stripMargin)) { (s, dir) =>
    val (jy, md) = journeys(s, dir)
    jy.crossJoin(broadcast(md))
      .select(length(col("j")).cast("long").as("journey_len"),
        when(substring(col("j"), 1, 3) === substring(col("mj"), 1, 3),
          1L).otherwise(0L).as("pm"))
      .groupBy(col("journey_len"))
      .agg(count(lit(1)).as("n_customers"), sum(col("pm")).as("npm"))
      .select(col("journey_len"), col("n_customers"),
        col("npm").as("n_prefix_match"),
        expr("CAST((1000 * npm) div n_customers AS BIGINT)")
          .as("match_milli"))
      .orderBy(col("journey_len"))
  }

  /** The journey-frequency head: top-5 journeys with counts and ppm
    * share. */
  def q990: Q = Q(
    "q990_journey_head",
    Some(s"""
      |WITH ${sqlJy},
      |gl AS (SELECT count(*) AS n FROM jy)
      |SELECT j AS journey, CAST(count(*) AS BIGINT) AS n_customers,
      |       CAST((1000000 * count(*)) // (SELECT n FROM gl) AS BIGINT)
      |         AS share_ppm
      |FROM jy GROUP BY 1 ORDER BY n_customers DESC, journey LIMIT 5
      |""".stripMargin)) { (s, dir) =>
    val (jy, _) = journeys(s, dir)
    val gl = jy.agg(count(lit(1)).as("n"))
    jy.groupBy(col("j").as("journey")).agg(count(lit(1)).as("nc"))
      .crossJoin(broadcast(gl))
      .select(col("journey"), col("nc").as("n_customers"),
        expr("CAST((1000000 * nc) div n AS BIGINT)").as("share_ppm"))
      .orderBy(col("n_customers").desc, col("journey")).limit(5)
  }
}
