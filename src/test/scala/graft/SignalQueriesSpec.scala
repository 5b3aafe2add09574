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

  test("canonical text folds NFC, case, and whitespace runs") {
    import graft.functions.TextNorm
    val precomposed = "Café  du   Monde"       // é as U+00E9
    val combining = "café du monde"            // e + U+0301
    val df = Seq(precomposed, combining, "  café   DU  monde ",
      "\tCafé du\nmonde\r")           // RE2-\s chars fold too
      .toDF("text")
      .select(TextNorm.canonicalText($"text").as("c"))
    val got = df.as[String].collect().toSeq
    assert(got.toSet == Set("café du monde"))
    // null stays null
    val n = Seq(Option.empty[String]).toDF("text")
      .select(TextNorm.canonicalText($"text")).collect().head
    assert(n.isNullAt(0))
  }

  test("canonical fingerprints unify visually-identical docs") {
    import graft.dedup.Dedup
    import graft.functions.TextNorm
    val docs = Seq((1L, "Hello   World"), (2L, "hello world"),
      (3L, "different")).toDF("doc_id", "text")
    val got = docs
      .select($"doc_id",
        Dedup.contentFingerprint(TextNorm.canonicalText($"text")).as("fp"))
      .groupBy($"fp").agg(min($"doc_id").as("keep"), count(lit(1)).as("n"))
      .orderBy($"keep").as[(Long, Long, Long)].collect().toSeq
      .map { case (_, k, n) => (k, n) }
    assert(got == Seq((1L, 2L), (3L, 1L)))
  }

  test("largest-remainder quotas sum exactly to the budget") {
    // strata 7/5/3 of N=15, budget 10: exact shares 4.67/3.33/2.0 →
    // bases 4/3/2 (sum 9), one extra to the largest remainder (a: .67)
    val docs = (1 to 7).map(i => (i.toLong, "a")) ++
      (8 to 12).map(i => (i.toLong, "b")) ++
      (13 to 15).map(i => (i.toLong, "c"))
    val df = docs.toDF("doc_id", "lang")
    val wDim = Window.partitionBy()
    val alloc = df.groupBy($"lang").agg(count(lit(1)).as("n_s"))
      .withColumn("__n", sum($"n_s").over(wDim))
      .withColumn("base", expr("(10 * n_s) div __n"))
      .withColumn("rem", expr("(10 * n_s) % __n"))
      .withColumn("extras", lit(10) - sum($"base").over(wDim))
      .withColumn("rk", row_number().over(
        Window.orderBy($"rem".desc, $"lang")))
      .withColumn("quota", $"base" +
        when($"rk" <= $"extras", 1L).otherwise(0L))
      .select($"lang", $"quota").orderBy($"lang")
      .as[(String, Long)].collect().toSeq
    assert(alloc == Seq(("a", 5L), ("b", 3L), ("c", 2L)))
    assert(alloc.map(_._2).sum == 10L)
  }

  test("session paths: gap splits sessions, path truncates at 5") {
    val us = 1000000L // µs per second
    val events = Seq(
      // user 1, session 1: 6 events 1 min apart → path truncated to 5
      (1L, 0L * us), (2L, 60L * us), (3L, 120L * us), (4L, 180L * us),
      (5L, 240L * us), (6L, 300L * us),
      // user 1, session 2 after a 40-min gap
      (7L, 2700L * us), (8L, 2760L * us))
      .map { case (id, t) => (1L, t, id, s"e$id") }
      .toDF("user_id", "t_us", "event_id", "event_type")
    val wo = Window.partitionBy($"user_id").orderBy($"t_us", $"event_id")
    val got = events
      .withColumn("prev", lag($"t_us", 1).over(wo))
      .withColumn("grp", sum(
        when($"prev".isNull || $"t_us" - $"prev" >= 1800000000L, 1L)
          .otherwise(0L))
        .over(wo.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy($"user_id", $"grp")
      .agg(array_sort(collect_list(struct($"t_us", $"event_id",
        $"event_type"))).as("arr"))
      .select(array_join(
        slice(transform($"arr", e => e.getField("event_type")), 1, 5),
        ">").as("path"))
      .orderBy($"path").as[String].collect().toSeq
    assert(got == Seq("e1>e2>e3>e4>e5", "e7>e8"))
  }

  test("rendezvous node failover moves ONLY the dead node's keys") {
    import graft.text.Sharding
    val nodes = Seq("n0", "n1", "n2", "n3")
    val ids = (1L to 200L).toDF("id")
    val before = Sharding.rendezvousAssignNodes(ids, "id", nodes, "t")
      .select($"id", $"node".as("nb"))
    val after = Sharding.rendezvousAssignNodes(ids, "id",
        nodes.filterNot(_ == "n2"), "t")
      .select($"id", $"node".as("na"))
    val j = before.join(after, "id").collect()
    assert(j.forall { r =>
      val (nb, na) = (r.getAs[String]("nb"), r.getAs[String]("na"))
      if (nb == "n2") na != "n2" else na == nb
    })
    // and some keys actually lived on the dead node
    assert(j.count(_.getAs[String]("nb") == "n2") > 0)
  }

  test("rendezvous node labels with '#' are rejected") {
    import graft.text.Sharding
    val ids = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Sharding.rendezvousAssignNodes(ids, "id", Seq("a#b"), "t")
    }
  }

  test("HLL inclusion-exclusion: identical sets overlap at est exactly") {
    import graft.operators.HyperLogLog
    // two sources with the SAME tokens → same registers → union
    // registers identical → est_overlap = estA + estB − estU = estA
    val rows = (1 to 300).flatMap(i => Seq(("sA", s"tok$i"), ("sB", s"tok$i")))
    val sk = HyperLogLog.sketch(rows.toDF("source", "tok"),
      Seq("source"), "tok", m = 64, salt = "hll")
    val est = HyperLogLog.estimate(sk, Seq("source"))
      .select($"source", $"est").as[(String, Double)].collect().toMap
    val union = HyperLogLog.estimate(
      HyperLogLog.merge(sk.withColumn("source", lit("u")), Seq("source")),
      Seq("source")).select($"est").as[Double].head()
    assert(est("sA") == est("sB"))
    assert(union == est("sA")) // same registers merge to themselves
    assert(est("sA") + est("sB") - union == est("sA"))
  }

  test("bigram entropy: deterministic successors give zero micro-nats") {
    val docs = Seq(("det", "x y x y x y x y"),
      ("mix", "a b a c a b a c a d")).toDF("source", "text")
    val t = docs.select($"source", split(trim($"text"), "\\s+").as("toks"))
    val bg = t.select($"source", explode(expr(
      """transform(slice(toks, 1, greatest(size(toks) - 1, 0)),
        |  (x, i) -> struct(x AS a, toks[i + 1] AS b))""".stripMargin))
      .as("p")).select($"source", $"p.a", $"p.b")
    val cab = bg.groupBy($"source", $"a", $"b")
      .agg(count(lit(1)).as("c_ab"))
    val ca = cab.groupBy($"source", $"a").agg(sum($"c_ab").as("c_a"))
    val n = cab.groupBy($"source").agg(sum($"c_ab").as("n_bg"))
    val got = cab.join(ca, Seq("source", "a"))
      .select($"source",
        ($"c_ab" * floor(log($"c_a".cast("double") /
          $"c_ab".cast("double")).cast("decimal(18,9)") * 1000000)
          .cast("long")).as("term"))
      .groupBy($"source").agg(sum($"term").as("ts"))
      .join(n, "source")
      .select($"source", expr("ts div n_bg").as("e"))
      .as[(String, Long)].collect().toMap
    assert(got("det") == 0L)       // every prev has one successor
    assert(got("mix") > 0L)        // 'a' branches three ways
  }

  test("join-skew report ranks keys by output fan-out, one-sided keys 0") {
    import graft.operators.Relational
    val l = Seq("a", "a", "a", "b", "c").toDF("k")      // a:3 b:1 c:1
    val r = Seq("a", "a", "b", "b", "b", "d").toDF("k") // a:2 b:3 d:1
    val got = Relational.joinSkewReport(l, "k", r, "k", topK = 4)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 3L, 2L, 6L), ("b", 1L, 3L, 3L),
      ("c", 1L, 0L, 0L), ("d", 0L, 1L, 0L)))
  }

  test("sorted-array pair expansion emits each unordered pair once") {
    val got = Seq(Seq("a", "b", "c", "d")).toDF("ts")
      .select(explode(expr(
        """flatten(transform(ts, (a, i) ->
          |  transform(slice(ts, i + 2, size(ts)),
          |            b -> struct(a AS t_a, b AS t_b))))""".stripMargin))
        .as("p"))
      .select($"p.t_a", $"p.t_b").as[(String, String)].collect().toSet
    assert(got == Set(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d")))
  }
}
