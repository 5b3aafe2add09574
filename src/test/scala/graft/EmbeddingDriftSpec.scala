package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.EmbeddingDrift

/** Round-6: embedding centroid drift — identical snapshots give cos 1,
  * opposite centroids give −1, scale invariance of cosine-of-sums,
  * zero-centroid null. */
class EmbeddingDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def drift(a: Seq[(Long, Seq[Float])], b: Seq[(Long, Seq[Float])]) =
    EmbeddingDrift.centroidDrift(
      a.toDF("g", "v"), b.toDF("g", "v"), "g", "v", dims = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap

  test("identical snapshots: cos exactly 1 within one ulp") {
    val rows = Seq((1L, Seq(0.5f, 0.25f, -0.125f)),
      (1L, Seq(0.25f, 0.5f, 0.125f)))
    val c = drift(rows, rows)(1L).get
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("opposite centroids: cos -1") {
    val a = Seq((1L, Seq(0.5f, 0.25f, 0.125f)))
    val b = Seq((1L, Seq(-0.5f, -0.25f, -0.125f)))
    // floor() on negatives shifts by one quantum; use exactly
    // representable multiples of 1/1000? 0.5*1000=500, -0.5*1000=-500:
    // floor keeps both exact, so the centroids are exact negatives.
    assert(math.abs(drift(a, b)(1L).get + 1.0) < 1e-12)
  }

  test("cosine of sums is sample-size invariant for duplicated snapshots") {
    val a = Seq((1L, Seq(0.5f, 0.25f, 0.125f)))
    val b = Seq((1L, Seq(0.5f, 0.25f, 0.125f)),
      (1L, Seq(0.5f, 0.25f, 0.125f)))
    assert(math.abs(drift(a, b)(1L).get - 1.0) < 1e-12)
  }

  test("a zero centroid yields null, not NaN") {
    val a = Seq((1L, Seq(0f, 0f, 0f)))
    val b = Seq((1L, Seq(0.5f, 0.25f, 0.125f)))
    assert(drift(a, b)(1L).isEmpty)
  }
}
