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

  test("Donchian position and Williams %R are complements per epoch") {
    assume(ready)
    val pos = graft.queries.TechIndicatorQueries.q1101.run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val wr = graft.queries.TechIndicatorQueries.q1103.run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pos.keySet == wr.keySet, "epoch sets differ")
    pos.foreach { case (e, p) =>
      val s = p + wr(e)
      // per-day floors: pos + wr in [999, 1000]; integer epoch means
      // of those sums stay within [998, 1000]
      assert(s >= 998 && s <= 1000,
        s"epoch $e: mean_pos $p + mean_wr ${wr(e)} = $s outside [998,1000]")
    }
  }

  test("Ichimoku above/in/below cloud partition the epoch days") {
    assume(ready)
    graft.queries.TechIndicator2Queries.q1108.run(spark, sf).collect()
      .foreach { r =>
        assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == r.getLong(1),
          s"epoch ${r.getLong(0)}: cloud position counts do not " +
            s"partition n_days ${r.getLong(1)}")
      }
  }

  test("Higuchi: segment counts n−k, HFD and DFA alpha in range") {
    assume(ready)
    val lk = graft.queries.FractalQueries.q1111.run(spark, sf).collect()
    val n = lk.map(r => r.getLong(1) + r.getLong(0)).distinct
    assert(n.length == 1, s"n_segments + k is not constant: ${n.toSeq}")
    val hfd = graft.queries.FractalQueries.q1112.run(spark, sf)
      .head().getLong(1)
    assert(hfd >= 900 && hfd <= 2100,
      s"Higuchi dimension $hfd milli outside [0.9, 2.1]")
    val alpha = graft.queries.FractalQueries.q1115.run(spark, sf)
      .head().getLong(1)
    assert(alpha >= -100 && alpha <= 2000,
      s"DFA alpha $alpha milli outside [-0.1, 2.0]")
  }

  test("semivariogram pairs and CCF bounds") {
    assume(ready)
    val g = graft.queries.GeostatQueries.q1096.run(spark, sf).collect()
    val nPlusH = g.map(r => r.getLong(1) + r.getLong(0)).distinct
    assert(nPlusH.length == 1,
      s"n_pairs + h is not the constant day count: ${nPlusH.toSeq}")
    assert(g.forall(_.getLong(3) >= 0), "variogram ratio negative")
    val ccf = graft.queries.UnitRootQueries.q1119.run(spark, sf)
      .collect()
    assert(ccf.forall(r => math.abs(r.getLong(2)) <= 1000),
      "a CCF value is outside [-1, 1]")
    val n0 = ccf.find(_.getLong(0) == 0L).get.getLong(1)
    assert(ccf.forall(r => r.getLong(1) + math.abs(r.getLong(0)) == n0),
      "CCF n_pairs != n - |h|")
  }

  test("Dickey-Fuller on daily revenue rejects the unit root") {
    assume(ready)
    // daily revenue is mean-reverting noise around a level: phi near
    // -1, tau far below any critical value — both DF variants agree
    val t1 = graft.queries.UnitRootQueries.q1116.run(spark, sf)
      .head().getLong(2)
    val t2 = graft.queries.UnitRootQueries.q1117.run(spark, sf)
      .head().getLong(3)
    assert(t1 < -2000 && t2 < -2000,
      s"DF tau_milli $t1 / $t2 not strongly negative on a stationary series")
  }

  test("readability: SMOG pooled counts match the fog complex shares") {
    assume(ready)
    val smog = graft.queries.ReadabilityQueries.q1095.run(spark, sf)
      .collect()
    assert(smog.forall(r => r.getLong(4) >= 3000),
      "a SMOG grade fell below its formula floor of 3.1291")
    val fog = graft.queries.ReadabilityQueries.q1094.run(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(smog.map(r => r.getString(0) -> r.getLong(1)).toMap == fog,
      "q1094 and q1095 disagree on per-source doc counts")
  }

  test("KDE: q1126 and q1127 agree on the triangular mass per grid") {
    assume(ready)
    val tri = graft.queries.DensityQueries.q1126.run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val epa = graft.queries.DensityQueries.q1127.run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri == epa, "independent triangular-mass computations differ")
    val cdf = graft.queries.DensityQueries.q1129.run(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(cdf.sliding(2).forall(p => p(0).getLong(3) <= p(1).getLong(3)),
      "empirical CDF not monotone over the grid")
    assert(cdf.last.getLong(3) == 1000000L,
      s"empirical CDF at the max grid point is ${cdf.last.getLong(3)}")
  }

  test("ESS: tau >= 1 and ess <= n; bootstrap CIs bracket the mean") {
    assume(ready)
    val e = graft.queries.EssQueries.q1136.run(spark, sf).head()
    assert(e.getLong(2) >= 1000 && e.getLong(3) <= e.getLong(0),
      s"tau ${e.getLong(2)} or ess ${e.getLong(3)} out of range")
    val ci = graft.queries.BootstrapQueries.q1133.run(spark, sf).head()
    assert(ci.getLong(2) <= ci.getLong(3),
      "percentile CI bounds inverted")
  }

  test("Benford: per-digit counts sum to n; 9 digits per year") {
    assume(ready)
    val fd = graft.queries.BenfordQueries.q1141.run(spark, sf).collect()
    assert(fd.length == 9, s"${fd.length} first digits")
    val yr = graft.queries.BenfordQueries.q1145.run(spark, sf).collect()
    assert(yr.forall(_.getLong(1) == 9),
      "a ship-year is missing a leading digit")
  }

  test("Box-Cox at lambda=1 reproduces the raw-scale skewness") {
    assume(ready)
    val bc = graft.queries.TransformQueries.q1146.run(spark, sf)
      .collect().find(_.getLong(0) == 1000L).get.getLong(2)
    val raw = graft.queries.TransformQueries.q1147.run(spark, sf)
      .collect().find(_.getString(0) == "raw").get.getLong(2)
    assert(bc == raw,
      s"lambda=1 Box-Cox skew $bc != raw skew $raw (shift invariance)")
  }

  test("experiment: SRM splits sum to slice totals; OBF at k=5 is z_a/2") {
    assume(ready)
    val gs = graft.queries.ExperimentQueries.q1153.run(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(gs.last.getLong(4) == 2040L,
      s"OBF bound at the final look is ${gs.last.getLong(4)} milli")
    assert(gs.map(_.getLong(1)).distinct.length >= 1)
  }

  test("LM divergences: JS within [0, ln 2]; Spearman within [-1, 1]") {
    assume(ready)
    val js = graft.queries.LmDivergenceQueries.q1162.run(spark, sf)
      .collect()
    assert(js.forall(r => r.getLong(2) >= -1 &&
      r.getLong(2) <= 693148), "a JS divergence is outside [0, ln 2]")
    val sp = graft.queries.LmDivergenceQueries.q1164.run(spark, sf)
      .collect()
    assert(sp.forall(r => math.abs(r.getLong(2)) <= 1000000),
      "a Spearman correlation is outside [-1, 1]")
  }

  test("bandit: every arm initialized; halving keeps 12/6/3/1") {
    assume(ready)
    val ucb = graft.queries.BanditQueries.q1166.run(spark, sf).collect()
    assert(ucb.forall(_.getLong(1) >= 1),
      "an arm was never played (init phase broken)")
    val sh = graft.queries.BanditQueries.q1169.run(spark, sf)
      .collect().sortBy(_.getLong(0))
    assert(sh.map(_.getLong(1)).toSeq == Seq(12L, 6L, 3L, 1L),
      s"survivor counts ${sh.map(_.getLong(1)).toSeq}")
  }

  test("ABC: revenue shares are ordered and part shares sum to ~1") {
    assume(ready)
    val a = graft.queries.AbcLotQueries.q1171.run(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(a("A")._2 >= a("B")._2 && a("B")._2 >= a("C")._2,
      "ABC revenue shares not descending")
    val partSum = a.values.map(_._1).sum
    assert(math.abs(partSum - 1000000L) <= 3,
      s"part shares sum to $partSum ppm")
  }
}
