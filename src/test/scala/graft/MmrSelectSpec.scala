package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.MmrSelect

/** Round-6: MMR greedy selection — diversity beats raw quality,
  * lambda extremes, tie determinism, k > pool. */
class MmrSelectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(
      rows: Seq[(Long, Long, Seq[String])], k: Int, lam: Int) =
    MmrSelect.select(rows.toDF("id", "q", "s"), "id", "q", "s", k, lam)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq

  private val pool: Seq[(Long, Long, Seq[String])] = Seq(
    (1L, 900L, Seq("a", "b", "c")),
    (2L, 890L, Seq("a", "b", "c", "d")), // near-copy of 1
    (3L, 500L, Seq("x", "y", "z")),      // diverse, mediocre
    (4L, 880L, Seq("a", "b", "d")))      // near-copy of 1

  test("diversity penalty promotes the dissimilar mediocre doc") {
    // λ=0.5: after picking 1, near-copies score 445-ish minus heavy
    // sim penalty; the disjoint doc 3 wins round 2.
    val out = run(pool, 2, 50)
    assert(out.map(_._1) == Seq(1L, 3L))
    assert(out.head._4 == 0L)
  }

  test("lambda=100 is pure quality top-k") {
    assert(run(pool, 3, 100).map(_._1) == Seq(1L, 2L, 4L))
  }

  test("equal scores break toward the smaller id") {
    val rows = Seq((7L, 100L, Seq("p")), (3L, 100L, Seq("q")))
    assert(run(rows, 1, 100).map(_._1) == Seq(3L))
  }

  test("k larger than the pool selects everything once") {
    val out = run(pool, 10, 70)
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    assert(out.map(_._2) == Seq(1L, 2L, 3L, 4L))
  }

  test("selectDistributed is row-identical to the driver greedy") {
    val rnd = new scala.util.Random(11)
    val els = ('a' to 'p').map(_.toString)
    val big: Seq[(Long, Long, Seq[String])] = (1L to 60L).map { i =>
      (i, rnd.nextInt(1000).toLong,
        rnd.shuffle(els).take(2 + rnd.nextInt(6)).toSeq)
    }
    for ((k, lam) <- Seq((5, 50), (8, 80), (60, 30))) {
      val driver = run(big, k, lam)
      val dist = MmrSelect
        .selectDistributed(big.toDF("id", "q", "s"), "id", "q", "s", k, lam)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
      assert(dist == driver, s"k=$k lam=$lam")
    }
  }

  test("coverSelectDistributed is row-identical to the driver greedy") {
    val rnd = new scala.util.Random(7)
    val els = ('a' to 'z').map(_.toString)
    val big: Seq[(Long, Seq[String])] = (1L to 50L).map { i =>
      (i, rnd.shuffle(els).take(1 + rnd.nextInt(8)).toSeq)
    }
    for (k <- Seq(1, 6, 50)) {
      val driver = MmrSelect
        .coverSelect(big.toDF("id", "s"), "id", "s", k)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
      val dist = MmrSelect
        .coverSelectDistributed(big.toDF("id", "s"), "id", "s", k)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
      assert(dist == driver, s"k=$k")
    }
  }

  test("distributed variants handle empty element sets") {
    val rows = Seq((1L, 10L, Seq.empty[String]), (2L, 5L, Seq("a")))
    val got = MmrSelect
      .selectDistributed(rows.toDF("id", "q", "s"), "id", "q", "s", 2, 50)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got.map(_._1) == Seq(1L, 2L))
    val cov = MmrSelect
      .coverSelectDistributed(rows.toDF("id", "q", "s")
        .select($"id", $"s"), "id", "s", 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    // max gain first: doc 2 covers 1 element, doc 1 covers none
    assert(cov.map(_._1) == Seq(2L, 1L))
    assert(cov.map(_._3) == Seq(1L, 0L))
  }
}
