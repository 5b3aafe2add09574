package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-11 property checks on the new waves — internal consistency
  * the DuckDB oracle cannot see (both engines share each formula, so
  * only cross-query identities catch a transcription slip):
  *  - ordinal patterns: the order-3 distribution and the entropy
  *    query agree on the window count, the normalized entropy is a
  *    true fraction, and observed + forbidden order-4 patterns = 24;
  *  - drift: every PSI contribution is ≥ 0, the drift curve is 0 at
  *    the reference year, and TV/Hellinger respect H² ≤ TV ≤ √2·H;
  *  - circular: circular variance complements the resultant length;
  *  - two-sample: the overlap coefficient complements total
  *    variation (OVL = 1 − TV) across two INDEPENDENT queries;
  *  - Passing–Bablok: net-vs-gross slope is positive and below
  *    parity, and the day concordance is strongly positive;
  *  - meta-analysis: I² is a true fraction and the random-effects
  *    pool lies inside the study-effect envelope.
  */
class Round11WaveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def ready = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$sf/orders.parquet"))

  test("ordinal distribution and entropy agree on the window count") {
    assume(ready)
    val dist = graft.queries.OrdinalPatternQueries.q1046.run(spark, sf)
      .collect()
    val ent = graft.queries.OrdinalPatternQueries.q1047.run(spark, sf)
      .head()
    assert(dist.map(_.getLong(1)).sum == ent.getLong(0),
      "q1046 pattern counts do not sum to q1047's n_windows")
    assert(ent.getLong(3) >= 0 && ent.getLong(3) <= 1000,
      s"normalized permutation entropy ${ent.getLong(3)}‰ outside [0,1000]")
  }

  test("observed + forbidden order-4 patterns partition the 24") {
    assume(ready)
    val r = graft.queries.OrdinalPatternQueries.q1048.run(spark, sf)
      .head()
    assert(r.getLong(1) + r.getLong(2) == 24,
      s"observed ${r.getLong(1)} + forbidden ${r.getLong(2)} != 24")
    assert(r.getLong(4) >= 1, "modal order-4 count must be >= 1")
  }

  test("PSI contributions are non-negative and the ref-year PSI is 0") {
    assume(ready)
    val contrib = graft.queries.DriftMonitorQueries.q1052.run(spark, sf)
      .collect()
    assert(contrib.forall(_.getLong(5) >= 0),
      "a PSI contribution is negative — (p-q)ln(p/q) must be >= 0")
    val curve = graft.queries.DriftMonitorQueries.q1054.run(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(curve.head.getLong(2) == 0,
      s"PSI of the reference year vs itself is ${curve.head.getLong(2)}")
  }

  test("distance panel respects H^2 <= TV <= sqrt(2)*H") {
    assume(ready)
    val r = graft.queries.DriftMonitorQueries.q1055.run(spark, sf).head()
    val tv = r.getLong(0) / 1e6
    val h = r.getLong(1) / 1e6
    assert(h * h <= tv + 2e-6, s"H^2 ${h * h} > TV $tv")
    assert(tv <= math.sqrt(2) * h + 2e-6, s"TV $tv > sqrt(2)*H")
  }

  test("circular variance complements the resultant length") {
    assume(ready)
    val r = graft.queries.CircularStatQueries.q1060.run(spark, sf).head()
    val (res, cv) = (r.getLong(1), r.getLong(2))
    assert(math.abs(res + cv - 1000000L) <= 1,
      s"resultant_ppm $res + circ_var_ppm $cv != 1e6 (+-1)")
  }

  test("overlap coefficient complements total variation across queries") {
    assume(ready)
    val tv = graft.queries.TwoSampleDistQueries.q1069.run(spark, sf)
      .head().getLong(0)
    val ovl = graft.queries.TwoSampleDistQueries.q1070.run(spark, sf)
      .head().getLong(0)
    assert(math.abs(tv + ovl - 1000000L) <= 2,
      s"tv_micro $tv + ovl_ppm $ovl != 1e6 (+-2) — OVL = 1 - TV broken")
  }

  test("Passing-Bablok slope is positive, below parity, concordant") {
    assume(ready)
    val sl = graft.queries.MethodCompQueries.q1071.run(spark, sf).head()
    assert(sl.getLong(2) > 0 && sl.getLong(2) < 1000000L,
      s"net-vs-gross PB slope ${sl.getLong(2)}ppm outside (0, 1e6)")
    val tau = graft.queries.MethodCompQueries.q1073.run(spark, sf)
      .head().getLong(4)
    assert(tau > 500, s"gross-vs-net Kendall tau ${tau}‰ <= 500‰")
  }

  test("embedding geometry: intrinsic dim within ambient, purity a ppm") {
    assume(ready)
    val id = graft.queries.EmbeddingIntrinsicQueries.q1086.run(spark, sf)
      .head()
    assert(id.getLong(2) > 0 && id.getLong(2) <= 64000,
      s"intrinsic dim ${id.getLong(2)}milli outside (0, 64] ambient")
    val pu = graft.queries.EmbeddingIntrinsicQueries.q1089.run(spark, sf)
      .head()
    assert(pu.getLong(1) >= 0 && pu.getLong(1) <= 1000000,
      s"1-NN purity ${pu.getLong(1)}ppm outside [0, 1e6]")
    assert(pu.getLong(2) >= 0 && pu.getLong(2) <= 5000,
      s"mean same-label-in-5 ${pu.getLong(2)}milli outside [0, 5000]")
  }

  test("Dunn ratio is consistent with its own extremes") {
    assume(ready)
    val r = graft.queries.EmbeddingIntrinsicQueries.q1088.run(spark, sf)
      .head()
    val (mi, ma, dunn) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(dunn == 1000L * mi / ma,
      s"dunn_milli $dunn != 1000*$mi/$ma")
  }

  test("meta-analysis: I^2 is a fraction, RE pool inside the envelope") {
    assume(ready)
    val q = graft.queries.MetaAnalysisQueries.q1082.run(spark, sf).head()
    assert(q.getLong(3) >= 0 && q.getLong(3) <= 1000,
      s"I^2 ${q.getLong(3)}‰ outside [0,1000]")
    val loo = graft.queries.MetaAnalysisQueries.q1083.run(spark, sf)
      .collect()
    val re = graft.queries.MetaAnalysisQueries.q1085.run(spark, sf)
      .head().getLong(2)
    val (lo, hi) = (loo.map(_.getLong(1)).min, loo.map(_.getLong(1)).max)
    // the RE pool must lie within (generously) the LOO envelope span
    val pad = (hi - lo).max(1L)
    assert(re >= lo - pad && re <= hi + pad,
      s"random-effects pool $re far outside LOO envelope [$lo, $hi]")
  }
}
