package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native kernels are callable from SQL after registration") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_polyhash('ab')").head.getLong(0) === 12805L)
    assert(spark.sql("SELECT graft_shingles('a b c d', 3)").head.getSeq[String](0)
      === Seq("a b c", "b c d"))
    assert(spark.sql(
      "SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F))").head.getDouble(0) === 1.0)
    val sig = spark.sql("SELECT graft_minhash(graft_shingles('a b c d e', 3), 8)")
      .head.getSeq[Long](0)
    assert(sig.length === 8)
    assert(spark.sql("SELECT graft_simhash(array('a','b'))").head.getLong(0) >= 0L)
  }
}
