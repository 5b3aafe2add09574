package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KmvSketch

/** Round-7: KMV distinct sketch — small-set exactness, estimate
  * sanity, determinism, null handling. */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("groups below k report their exact count with a null kth hash") {
    val df = Seq("a" -> "x", "a" -> "y", "a" -> "x", "b" -> "z")
      .toDF("g", "v")
    val got = KmvSketch.estimate(df, Seq("g"), "v", k = 8, salt = "t")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.isNullAt(3)))).toMap
    assert(got == Map("a" -> ((2L, 2L, true)), "b" -> ((1L, 1L, true))))
  }

  test("estimate lands within the expected error band on 1000 distincts") {
    // k=32 -> relative standard error ~1/sqrt(30) ~ 18%; assert a
    // generous 3-sigma band. Deterministic for the fixed salt.
    val df = (1 to 5000).map(i => ("g", s"val_${i % 1000}")).toDF("g", "v")
    val r = KmvSketch.estimate(df, Seq("g"), "v", k = 32, salt = "t2")
      .head()
    assert(r.getLong(1) == 1000L) // exact rides along
    val est = r.getLong(2)
    assert(est > 450 && est < 2200, s"estimate $est wildly off 1000")
    // determinism: same salt, same data, same sketch
    val est2 = KmvSketch.estimate(df, Seq("g"), "v", k = 32, salt = "t2")
      .head().getLong(2)
    assert(est2 == est)
  }

  test("mergeMinima(old sketch, new batch) is row-identical to minima(all)") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 800).map(i => (s"g${i % 3}", s"v${rnd.nextInt(300)}"))
    val (old, fresh) = rows.splitAt(500)
    val all = rows.toDF("g", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("g", "min_hash", "rank")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._3)).toSeq
    val direct = canon(KmvSketch.minima(all, Seq("g"), "v", 16, "m"))
    val merged = canon(KmvSketch.mergeMinima(
      KmvSketch.minima(old.toDF("g", "v"), Seq("g"), "v", 16, "m"),
      fresh.toDF("g", "v"), Seq("g"), "v", 16, "m"))
    assert(merged == direct)
    // and the sketch-only estimate matches estimate() on the raw data
    val estDirect = KmvSketch.estimate(all, Seq("g"), "v", 16, "m")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val estSketch = KmvSketch.estimateFromMinima(
        KmvSketch.minima(all, Seq("g"), "v", 16, "m"), Seq("g"), 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estSketch == estDirect)
  }

  test("null values drop; keys with only nulls vanish") {
    val df = Seq(("a", Some("x")), ("a", None), ("b", None))
      .toDF("g", "v")
    val got = KmvSketch.estimate(df, Seq("g"), "v", k = 4, salt = "t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L))
  }
}
