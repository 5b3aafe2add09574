package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PolyHashImpl
import graft.text.FeatureHash
import org.apache.spark.unsafe.types.UTF8String

/** Round-6: hashing-trick featurization — values equal a JVM replay of
  * hash/dim/sign, tf weighting, zero-sum sparsity, determinism. */
class FeatureHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 32

  private def refVec(text: String): Map[Long, Long] = {
    val mod = 2147483647L
    def poly(s: String) = PolyHashImpl.hash(UTF8String.fromString(s), 131L, mod)
    text.trim.split("\\s+").toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .toSeq.map { case (tok, tf) =>
        val h = poly("fh:" + poly(tok + ":fh").toString)
        val sign = if (((h >> 5) & 1L) == 1L) 1L else -1L
        (h & (dims - 1), sign * tf)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .filter(_._2 != 0L).toMap
  }

  private def run(text: String): Map[Long, Long] =
    FeatureHash.hashedBagOfWords(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", dims, "fh")
      .select("dim", "value").as[(Long, Long)].collect().toMap

  test("vector equals the JVM hash replay, tf-weighted") {
    val text = "alpha beta gamma alpha alpha beta delta epsilon zeta"
    assert(run(text) == refVec(text))
  }

  test("deterministic across invocations and independent of order") {
    val a = run("one two three four")
    val b = run("four three two one")
    assert(a == b && a.nonEmpty)
  }

  test("a token repeated n times scales its dim by n") {
    val one = run("solo")
    val five = run("solo solo solo solo solo")
    assert(one.size == 1 && five.size == 1)
    assert(five.head._2 == 5 * one.head._2)
  }
}
