package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Triangles

/** Round-5 wave 19: exact triangle counting via degree orientation. */
class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def n(edges: DataFrame) =
    Triangles.triangleCount(edges, "a", "b").as[Long].collect().head

  test("known graphs count exactly") {
    // K4: C(4,3) = 4 triangles
    val k4 = (for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j))
      .toDF("a", "b")
    assert(n(k4) == 4L)
    // a 5-cycle has none; adding one chord makes exactly one
    val c5 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
      .toDF("a", "b")
    assert(n(c5) == 0L)
    assert(n(c5.unionByName(Seq((1L, 3L)).toDF("a", "b"))) == 1L)
  }

  test("duplicate, reversed, and self-loop edges do not distort the count") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 3L)).toDF("a", "b")
    assert(n(messy) == 1L)
  }

  test("matches the naive triple join on a random graph") {
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(600)(
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)).toDF("a", "b")
    val canon = Triangles.canonical(edges, "a", "b")
    val e1 = canon.select($"src".as("x"), $"dst".as("y"))
    val e2 = canon.select($"src".as("y"), $"dst".as("z"))
    val e3 = canon.select($"src".as("x"), $"dst".as("z"))
    val naive = e1.join(e2, "y").join(e3, Seq("x", "z"), "left_semi").count()
    assert(n(edges) == naive)
  }
}
