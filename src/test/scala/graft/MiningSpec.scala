package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sim.{Mining, Similarity}

/** Contrastive mining must agree with a driver-side reference that
  * trusts ONLY the cell kernel (itself pinned bit-exactly by q69's
  * oracle): collect cells and vectors, redo the in-cell pair scan,
  * band split, and hardest-first rank in plain Scala, and compare.
  */
class MiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dims = 4
  // deterministic corpus: LCG-ish directions spread across cells, with
  // planted near-dup pairs (scaled copies ⇒ cosine 1) and near misses
  private lazy val vecs: Seq[(Long, Seq[Float])] = {
    val base = (0 until 40).map { i =>
      val a = ((i * 37 + 11) % 19).toFloat - 9f
      val b = ((i * 53 + 7) % 17).toFloat - 8f
      val c = ((i * 71 + 3) % 13).toFloat - 6f
      val d = ((i * 29 + 5) % 11).toFloat - 5f
      (i.toLong, Seq(a, b, c, d))
    }
    val dups = Seq(
      (100L, base(3)._2.map(_ * 2f)),   // exact positive of id 3
      (101L, base(8)._2.map(_ * 0.5f))) // exact positive of id 8
    base ++ dups
  }

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p.toDouble * q.toDouble }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  private lazy val df = {
    import spark.implicits._
    vecs.toDF("vec_id", "embedding")
  }

  private def reference(tPos: Double, hardLo: Double, hardHi: Double,
      cellBits: Int, k: Int): Set[(Long, String, Long)] = {
    val cells = df.select(col("vec_id"),
        Similarity.hyperplaneSignature(col("embedding"), cellBits, dims)
          .as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byId = vecs.toMap
    val tagged = for {
      (a, ca) <- cells.toSeq; (b, cb) <- cells.toSeq
      if a != b && ca == cb
      cos = cosine(byId(a), byId(b))
      kind <- if (cos >= tPos) Some("pos")
              else if (cos >= hardLo && cos < hardHi) Some("hard_neg")
              else None
    } yield (a, kind, b, cos)
    tagged.groupBy(t => (t._1, t._2)).toSeq.flatMap { case (_, g) =>
      g.sortBy(t => (-t._4, t._3)).take(k)
    }.map(t => (t._1, t._2, t._3)).toSet
  }

  test("matches the driver-side reference, caps per (anchor, kind)") {
    val got = Mining.contrastivePairs(df, "vec_id", "embedding", dims,
        tPos = 0.95, hardLo = 0.5, hardHi = 0.95, cellBits = 2, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = reference(0.95, 0.5, 0.95, cellBits = 2, k = 2)
    assert(got === want)
    assert(want.exists(_._2 == "pos"), "fixture must yield positives")
    assert(want.exists(_._2 == "hard_neg"), "fixture must yield hard negatives")
    // planted scaled copies are positives of their originals
    assert(got.contains((3L, "pos", 100L)) && got.contains((100L, "pos", 3L)))
  }

  test("margin gap [hardHi, tPos) is mined as neither kind") {
    val got = Mining.contrastivePairs(df, "vec_id", "embedding", dims,
        tPos = 0.95, hardLo = 0.3, hardHi = 0.6, cellBits = 2, k = 100)
      .collect()
    val cos = got.map(_.getDouble(3))
    assert(cos.forall(c => c >= 0.95 || (c >= 0.3 && c < 0.6)))
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ===
      reference(0.95, 0.3, 0.6, cellBits = 2, k = 100))
  }

  test("rejects an inverted or positive-overlapping band") {
    intercept[IllegalArgumentException] {
      Mining.contrastivePairs(df, "vec_id", "embedding", dims,
        tPos = 0.5, hardLo = 0.6, hardHi = 0.9)
    }
  }
}
