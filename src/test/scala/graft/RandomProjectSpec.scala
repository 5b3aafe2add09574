package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sim.RandomProject

/** Round-6: JL projection — deterministic sign matrix, integer
  * exactness, linearity. */
class RandomProjectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def proj(vecs: Seq[Seq[Float]], in: Int, out: Int) =
    RandomProject.projectMilli(vecs.map(Tuple1(_)).toDF("v"),
        col("v"), in, out, "t_v1")
      .select("proj").collect().map(_.getSeq[Long](0).toVector)

  test("sign matrix is deterministic and ±1") {
    val s1 = (0 until 8).map(i => (0 until 4).map(j =>
      RandomProject.sign(i, j, "t_v1")))
    val s2 = (0 until 8).map(i => (0 until 4).map(j =>
      RandomProject.sign(i, j, "t_v1")))
    assert(s1 == s2)
    assert(s1.flatten.forall(s => s == 1 || s == -1))
    // a different salt flips at least one sign on an 8x4 matrix
    val s3 = (0 until 8).map(i => (0 until 4).map(j =>
      RandomProject.sign(i, j, "other")))
    assert(s1 != s3)
  }

  test("projection is the exact signed milli sum") {
    val out = proj(Seq(Seq(1.0f, 2.0f)), in = 2, out = 2)
    val s = (0 until 2).map(j =>
      RandomProject.sign(0, j, "t_v1") * 1000L +
        RandomProject.sign(1, j, "t_v1") * 2000L)
    assert(out.head == s.toVector)
  }

  test("zero vector projects to zero; linearity in the input") {
    val out = proj(Seq(Seq(0f, 0f, 0f), Seq(1f, 1f, 0f), Seq(2f, 2f, 0f)),
      in = 3, out = 2)
    assert(out(0) == Vector(0L, 0L))
    assert(out(2) == out(1).map(_ * 2))
  }
}
