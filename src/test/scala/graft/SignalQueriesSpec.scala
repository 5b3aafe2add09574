package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 tail wave: streaks, CUSUM closed form, integer EWMA,
  * distinctive terms, boolean retrieval (q210-q214 semantics). */
class SignalQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streak islands: gaps split, consecutive days merge") {
    // user 1: days 3,4,5 + 9,10  → streaks (3, 2); user 2: day 7 only
    val days = Seq((1L, 3L), (1L, 4L), (1L, 5L), (1L, 9L), (1L, 10L),
      (2L, 7L)).toDF("user_id", "d")
    val grp = days.withColumn("grp",
      col("d") - row_number().over(
        Window.partitionBy($"user_id").orderBy($"d")))
    val got = grp.groupBy($"user_id", $"grp").agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_streaks"), max($"len").as("longest"),
        sum($"len").as("active"))
      .orderBy($"user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L, 5L), (2L, 1L, 1L, 1L)))
  }

  test("CUSUM closed form equals the max(0, s+dev) recursion") {
    val xs = Seq(5L, 5L, 2L, 9L, 9L, 9L, 1L, 5L)
    val k = xs.sum / xs.length // 5
    // direct recursion
    val direct = xs.scanLeft(0L)((s, x) => math.max(0L, s + (x - k))).tail
    // closed form via windows (the q211 plan)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("d", "x")
    val w = Window.orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = df
      .withColumn("pf", sum($"x" - lit(k)).over(w))
      .withColumn("cusum", $"pf" - least(lit(0L), min($"pf").over(w)))
      .orderBy($"d").select($"cusum").as[Long].collect().toSeq
    assert(got == direct)
  }

  test("integer EWMA fold matches the per-step reference loop") {
    val xs = Seq(8L, 4L, 12L, 0L, 100L)
    val ref = xs.map(_ * 1000000L)
      .reduceLeft((s, x) => (3 * s + x) / 4) // all positive: div == floor
    val got = Seq(xs).toDF("xs")
      .select(expr("""aggregate(slice(transform(xs, x -> x * 1000000L),
          2, size(xs) - 1),
          element_at(transform(xs, x -> x * 1000000L), 1),
          (s, x) -> (3 * s + x) div 4)""").as("e"))
      .as[Long].head()
    assert(got == ref)
  }

  test("distinctive-term ratio: source-exclusive term dominates") {
    // 'zzz' appears only in srcA (4 of its 8 tokens); 'common'
    // appears everywhere. ratio_pm(zzz | srcA) = 1000*4*(T-T_s)/(1*8)
    val docs = Seq(
      ("srcA", "zzz zzz zzz zzz common common common common"),
      ("srcB", "common common common common common common common common"))
      .toDF("source", "text")
    val cs = docs
      .select($"source", explode(split(trim($"text"), "\\s+")).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("c_s"))
    val g = cs.groupBy($"w").agg(sum($"c_s").as("c"))
    val srcT = cs.groupBy($"source").agg(sum($"c_s").as("t_s"))
    val tot = cs.agg(sum($"c_s").as("t"))
    val r = cs.join(g, "w").join(broadcast(srcT), "source")
      .crossJoin(broadcast(tot))
      .select($"source", $"w",
        expr("(1000 * c_s * (t - t_s)) div ((c - c_s + 1) * t_s)")
          .as("ratio_pm"))
      .where($"source" === "srcA").orderBy($"ratio_pm".desc)
      .as[(String, String, Long)].collect().toSeq
    // zzz: 1000*4*8/(1*8) = 4000; common: 1000*4*8/(9*8) = 444
    assert(r == Seq(("srcA", "zzz", 4000L), ("srcA", "common", 444L)))
  }

  test("boolean retrieval: AND is token-exact, prune is a superset") {
    val docs = Seq(
      (1L, "join hash scan"),       // all three tokens → hit
      (2L, "join hash only"),       // missing scan → out
      (3L, "joining hashing scanning"), // substrings pass the prune,
                                        // token filter must reject
      (4L, "scan scan join hash scan")) // hit, tf_total 5
      .toDF("doc_id", "text")
    val terms = Seq("join", "hash", "scan")
    val pruned = docs
      .where(terms.map(t => $"text".contains(t)).reduce(_ && _))
    // the prune is a superset of HITS: doc 2 (no 'scan' substring at
    // all) may drop, doc 3 (substrings only) stays — correctness must
    // not depend on what it keeps
    assert(pruned.count() == 3L)
    val got = pruned
      .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("w"))
      .where($"w".isin(terms: _*))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("tf"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("nt"), sum($"tf").as("tf_total"))
      .where($"nt" === terms.size)
      .orderBy($"tf_total".desc, $"doc_id")
      .select($"doc_id", $"tf_total").as[(Long, Long)].collect().toSeq
    assert(got == Seq((4L, 5L), (1L, 3L)))
  }
}
