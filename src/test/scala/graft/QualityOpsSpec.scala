package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.{Dsir, DupSpans, QualityRules, Sampling}

/** Round-4 second wave: Gopher/C4 quality rules, duplicate-span
  * removal, DSIR-lite importance scores, cluster-balanced sampling.
  */
class QualityOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- QualityRules ---------------------------------------------------

  test("gopherFlags: each rule trips on its designed offender only") {
    val p = QualityRules.GopherParams(minWords = 3, maxWords = 10,
      minMeanWordLen = 2, maxMeanWordLen = 6, minStopwordHits = 1)
    val docs = Seq(
      (1L, "the quick brown fox jumps"),            // clean
      (2L, "a b"),                                  // too few words
      (3L, "the x ##### ### #### jumps again"),     // symbol wall
      (4L, "the 123 456 789 000 111"),              // non-alpha words
      (5L, "zz yy xx ww vv"),                       // no stopwords
      (6L, "the lorem words are here too"))         // blocklist hit
      .toDF("doc_id", "text")
    val out = QualityRules.gopherFlags(docs, "text", p)
      .select("doc_id", "words_ok", "symbol_ok", "alpha_ok",
        "stopword_ok", "blocklist_ok", "keep")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toMap
    assert(out(1L) === ((true, true, true, true, true, true)))
    assert(out(2L)._1 === false)
    assert(out(3L)._2 === false)
    assert(out(4L)._3 === false) // 5 of 6 words alpha = 83%>80 ... digits: 5 non-alpha of 6
    assert(out(5L)._4 === false)
    assert(out(6L)._5 === false)
    assert(!out(2L)._6 && !out(3L)._6 && !out(4L)._6 && !out(5L)._6 && !out(6L)._6)
  }

  test("gopherFlags line rules: bullets and ellipses count per line") {
    val p = QualityRules.GopherParams(minWords = 1, maxWords = 1000,
      minMeanWordLen = 1, maxMeanWordLen = 100, minStopwordHits = 0,
      maxBulletLinePct = 50, maxEllipsisLinePct = 25)
    val bulletHeavy = "- the first point\n- the second point\nplain line"
    val ellipsisHeavy = "to be continued...\nand more…\nthe end"
    val docs = Seq((1L, bulletHeavy), (2L, ellipsisHeavy), (3L, "the a"))
      .toDF("doc_id", "text")
    val out = QualityRules.gopherFlags(docs, "text", p)
      .select("doc_id", "bullet_ok", "ellipsis_ok")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2)))
      .toMap
    assert(out(1L)._1 === false) // 2 of 3 lines bulleted > 50%
    assert(out(2L)._2 === false) // 2 of 3 lines ellipsis-ended > 25%
    assert(out(3L) === ((true, true)))
  }

  test("cleanLines drops short/bullet/ellipsis lines, keeps order") {
    val text = "the good long line here\nok\n- bullet item\nmore text ends now\ntrailing off..."
    val out = QualityRules.cleanLines(Seq((1L, text)).toDF("doc_id", "text"),
      "text", minLineWords = 3)
      .select("clean_text").as[String].head()
    assert(out === "the good long line here\nmore text ends now")
  }

  // ---- DupSpans.removeSpans ------------------------------------------

  test("removeSpans deletes exactly the covered positions and reassembles") {
    // "x y z" appears in docs 1 AND 2 -> duplicated shingle.
    val docs = Seq(
      (1L, "a b x y z c d"),
      (2L, "p x y z q r s"),
      (3L, "u v w t m n o")) // fully unique
      .toDF("doc_id", "text")
    val out = DupSpans.removeSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((7L, 4L, "a b c d")))
    assert(out(2L) === ((7L, 4L, "p q r s")))
    assert(out(3L) === ((7L, 7L, "u v w t m n o")))
  }

  test("removeSpans: fully duplicated doc comes back empty, not missing") {
    val docs = Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
    val out = DupSpans.removeSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((0L, "")))
    assert(out(2L) === ((0L, "")))
  }

  test("removeSpans overlapping spans merge: covered set is a union") {
    // doc 1 tokens: a b c d e; dup shingles start at 0 ("a b c") and
    // 2 ("c d e") via doc 2/3 -> covered {0,1,2} ∪ {2,3,4} = all 5.
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c q q"),
      (3L, "q q c d e"))
      .toDF("doc_id", "text")
    val out = DupSpans.removeSpans(docs, "doc_id", "text", n = 3)
      .filter(col("doc_id") === 1L).select("kept_tokens").as[Long].head()
    assert(out === 0L)
  }

  // ---- Dsir -----------------------------------------------------------

  test("dsir: tokens typical of the target score above anti-target tokens") {
    val docs = Seq(
      (1L, "ml ml ml data", true),
      (2L, "ml data code code", true),
      (3L, "web web web spam", false),
      (4L, "spam spam web web", false),
      (5L, "ml ml code data", false), // target-like candidate
      (6L, "web spam spam web", false)) // anti-target candidate
      .toDF("doc_id", "text", "tgt")
    val out = Dsir.importanceScores(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(5L) > out(6L))
    // weights are per-token ratios: every doc got a finite BIGINT score
    assert(out.values.forall(_ >= 0L))
  }

  test("dsir is partitioning-independent") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"tok${i % 7} tok${i % 3} tok${i % 5}", i % 4 == 0))
      .toDF("doc_id", "text", "tgt")
    def run(parts: Int) =
      Dsir.importanceScores(docs.repartition(parts), "doc_id", "text",
        col("tgt")).orderBy("doc_id").collect().toSeq
    assert(run(1) === run(13))
  }

  // ---- Sampling.cellBalancedSample -----------------------------------

  test("cellBalancedSample caps big cells, keeps small cells whole") {
    val rows = (1L to 100L).map(i => (i, if (i <= 95) "big" else "small"))
      .toDF("id", "cell")
    val out = Sampling.cellBalancedSample(rows, "id", "cell",
      perCell = 7, salt = "s1")
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("big") === 7L)
    assert(out("small") === 5L)
  }

  test("cellBalancedSample pick is deterministic and salt-sensitive") {
    val rows = (1L to 50L).map(i => (i, (i % 3).toString)).toDF("id", "cell")
    def ids(salt: String) =
      Sampling.cellBalancedSample(rows, "id", "cell", perCell = 4, salt)
        .select("id").as[Long].collect().toSet
    assert(ids("a") === ids("a"))
    assert(ids("a") !== ids("b")) // new salt reshuffles the picks
    // avalanche guard: a single polynomial fold over short ids never
    // wraps the modulus and silently degenerates to "k smallest ids"
    assert(ids("a") !== (1L to 12L).toSet)
  }

  // ---- saltedHash independence across salts --------------------------

  test("resalted hashSample overlaps like an independent draw, not a shift") {
    // One linear fold makes salt v2 a constant bucket rotation of v1:
    // ~49/50 of a 50% sample survives resalting. Independent draws
    // overlap ~25%. The double-fold must land near the latter.
    val docs = (1L to 1000L).toDF("doc_id")
    def kept(salt: String) =
      Sampling.hashSample(docs, "doc_id", pct = 50, salt)
        .select("doc_id").as[Long].collect().toSet
    val overlap = (kept("v1") & kept("v2")).size
    assert(overlap > 150 && overlap < 350,
      s"overlap $overlap/1000 — salted resample is not independent-like")
  }

  test("resalted epoch shards give a fresh order, not a rotation") {
    import graft.text.Sharding
    // A rotation keeps almost every adjacent pair adjacent; a fresh
    // shuffle of 200 docs keeps ~1 by chance.
    val docs = (1L to 200L).toDF("doc_id")
    def order(salt: String) =
      Sharding.shuffleShards(docs, "doc_id", nShards = 1, salt)
        .orderBy("pos").select("doc_id").as[Long].collect().toSeq
    val next2 = order("ep2").sliding(2).map(p => (p.head, p.last)).toSet
    val preserved = order("ep1").sliding(2).count(p => next2((p.head, p.last)))
    assert(preserved < 10,
      s"$preserved/199 adjacent pairs survived resalting — rotation, not shuffle")
  }

  test("tokenEntropy: repetitive text scores low, uniform distinct text at ln(n)") {
    val docs = Seq(
      (1L, "a a a a a a a a"),            // 1 distinct token -> H = 0
      (2L, "a b c d e f g h"),           // uniform over 8 -> H = ln(8)
      (3L, "a a a a a a a b")).toDF("doc_id", "text") // skewed
    val got = graft.text.TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def q9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((8L, 1L, 0.0)))
    // each of the 8 uniform terms quantizes BEFORE the sum (the
    // operator's contract), so the reference is 8 × q9(term)
    assert(got(2L)._3 === 8 * q9(-(1.0 / 8) * math.log(1.0 / 8)))
    val skew = q9(-(7.0 / 8) * math.log(7.0 / 8)) + q9(-(1.0 / 8) * math.log(1.0 / 8))
    assert(math.abs(got(3L)._3 - skew) < 1e-12)
    // the quality-signal ordering: boilerplate < skewed < uniform
    assert(got(1L)._3 < got(3L)._3 && got(3L)._3 < got(2L)._3)
  }
}
