package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 property checks on the new waves — internal consistency
  * the DuckDB oracle cannot see (both engines share each formula, so
  * only cross-query identities catch a transcription slip):
  *  - DP segmentation OPTIMALITY: the k = 4 optimum is ≤ the
  *    equal-width baseline AND ≤ greedy binary segmentation (both
  *    regret ratios ≥ 1000‰), and the elbow curve is monotone
  *    non-increasing in k;
  *  - weighted paths: every per-source dilation is ≥ 1000‰ (the
  *    hop-count lower bound is a true lower bound), and the
  *    relaxation label mass never increases across rounds;
  *  - WHT Parseval: the spectrum/signal energy difference is EXACTLY
  *    zero when all 256 days are present;
  *  - records: upper records are at most the day count and at least 1.
  */
class Round10WaveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def ready = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$sf/orders.parquet"))

  test("DP segmentation dominates equal-width and greedy baselines") {
    assume(ready)
    val eq = graft.queries.SegmentDpQueries.q974.run(spark, sf).head()
    assert(eq.getLong(2) >= 1000L,
      s"equal-width regret ${eq.getLong(2)}‰ < 1000‰ — optimum not optimal")
    val gr = graft.queries.SegmentDpQueries.q975.run(spark, sf).head()
    assert(gr.getLong(2) >= 1000L,
      s"greedy regret ${gr.getLong(2)}‰ < 1000‰ — optimum not optimal")
  }

  test("DP elbow curve is monotone non-increasing in k") {
    assume(ready)
    val rows = graft.queries.SegmentDpQueries.q972.run(spark, sf)
      .collect().sortBy(_.getLong(0))
    val costs = rows.map(_.getLong(1))
    assert(costs.zip(costs.tail).forall { case (a, b) => b <= a },
      s"elbow not monotone: ${costs.mkString(",")}")
  }

  test("weighted-path dilation never undercuts the hop lower bound") {
    assume(ready)
    val rows = graft.queries.WeightedPathQueries.q963.run(spark, sf)
      .collect()
    val bad = rows.filter(r => !r.isNullAt(3) && r.getLong(3) < 1000L)
    assert(bad.isEmpty,
      s"dilation below 1000‰ for sources ${bad.map(_.getLong(0)).toSeq}")
  }

  test("relaxation monotonicity: reach only grows, improvements dry up") {
    assume(ready)
    val rows = graft.queries.WeightedPathQueries.q965.run(spark, sf)
      .collect().sortBy(_.getLong(0))
    val pairs = rows.map(_.getLong(1))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => b >= a },
      s"reached-pair count shrank across rounds: ${pairs.mkString(",")}")
    // improvements can only come from new reach or shorter labels; a
    // round with zero improvements must stay at zero forever
    val improved = rows.map(_.getLong(2))
    val afterDry = improved.dropWhile(_ > 0)
    assert(afterDry.forall(_ == 0L),
      s"improvements resumed after quiescence: ${improved.mkString(",")}")
  }

  test("WHT Parseval difference is exactly zero on a full 256-day window") {
    assume(ready)
    val r = graft.queries.WalshQueries.q998.run(spark, sf).head()
    if (r.getLong(0) == 256L)
      assert(r.getLong(3) == 0L,
        s"Parseval diff ${r.getLong(3)} != 0 on a complete window")
  }

  test("record counts are sane (1 <= records <= days)") {
    assume(ready)
    val r = graft.queries.RecordTheoryQueries.q1026.run(spark, sf).head()
    val (days, up, dn) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(up >= 1 && up <= days && dn >= 1 && dn <= days,
      s"records out of range: days=$days up=$up dn=$dn")
  }
}
