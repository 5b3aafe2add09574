package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LinearCount

/** LinearCount sketch/estimate contracts, including the union-merge
  * semantics ADVICE r5 flagged: a plain DataFrame union of shard
  * sketches keeps duplicate (keys, bucket) rows, and estimate() must
  * dedupe them (countDistinct) or the merged estimate silently
  * inflates. The sketch also carries its m, so a mixed-m union fails
  * loudly instead of estimating garbage.
  */
class LinearCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(ids: Range) =
    ids.map(i => ("g", s"value_$i")).toDF("grp", "v")

  test("estimate is within 10% of the true distinct count") {
    val df = docs(0 until 400)
    val est = LinearCount.distinctEstimate(df, Seq("grp"), "v", m = 4096)
      .select("est").as[Double].head()
    assert(math.abs(est - 400) / 400.0 < 0.10, s"est=$est")
  }

  test("union of shard sketches == sketch of the union (merge is exact)") {
    // overlapping shards: values 0-299 and 200-499 share 100 values,
    // so the naive row count over the union double-counts their buckets
    val s1 = LinearCount.sketch(docs(0 until 300), Seq("grp"), "v", m = 1024)
    val s2 = LinearCount.sketch(docs(200 until 500), Seq("grp"), "v", m = 1024)
    val merged = LinearCount.estimate(s1.union(s2), Seq("grp"))
      .select("d", "est").as[(Long, Double)].head()
    val direct = LinearCount.distinctEstimate(
      docs(0 until 500), Seq("grp"), "v", m = 1024)
      .select("d", "est").as[(Long, Double)].head()
    assert(merged === direct)
  }

  test("union mixing different m fails loudly") {
    val s1 = LinearCount.sketch(docs(0 until 10), Seq("grp"), "v", m = 512)
    val s2 = LinearCount.sketch(docs(0 until 10), Seq("grp"), "v", m = 1024)
    val e = intercept[Exception] {
      LinearCount.estimate(s1.union(s2), Seq("grp")).collect()
    }
    assert(e.getMessage.contains("different m") ||
      Option(e.getCause).exists(_.getMessage.contains("different m")))
  }

  test("saturated sketch (d = m) estimates null") {
    // m=2 and many distinct values: both buckets occupied w.h.p.
    val out = LinearCount.distinctEstimate(
      docs(0 until 100), Seq("grp"), "v", m = 2)
      .select("d", "est").collect().head
    assert(out.getLong(0) === 2L)
    assert(out.isNullAt(1))
  }

  test("streaming face: stateful dropDuplicates sketch across micro-batches == batch") {
    // the sketch IS a distinct (keys, bucket, m) set, so its streaming
    // face is dropDuplicates state: duplicates arriving in LATER
    // micro-batches are suppressed cross-batch, and estimate() over the
    // accumulated sink equals the batch one-shot
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, String)]
    val sketch = LinearCount.sketch(
      mem.toDF().toDF("grp", "v"), Seq("grp"), "v", m = 256)
      .dropDuplicates("grp", "bucket", "m")
    val q = sketch.writeStream.format("memory").queryName("lc_stream_test")
      .outputMode("append").start()
    mem.addData((0 until 60).map(i => ("g", s"value_$i")): _*)
    q.processAllAvailable()
    mem.addData((30 until 90).map(i => ("g", s"value_$i")): _*) // 30 dupes
    q.processAllAvailable()
    q.stop()
    val streamed = LinearCount.estimate(
      spark.table("lc_stream_test"), Seq("grp"))
      .select("d", "est").as[(Long, Double)].head()
    val batch = LinearCount.distinctEstimate(
      docs(0 until 90), Seq("grp"), "v", m = 256)
      .select("d", "est").as[(Long, Double)].head()
    assert(streamed === batch)
  }

  test("null values drop (COUNT DISTINCT convention)") {
    val df = Seq(("g", Some("a")), ("g", None), ("g", Some("b")))
      .toDF("grp", "v")
    val d = LinearCount.distinctEstimate(df, Seq("grp"), "v", m = 64)
      .select("d").as[Long].head()
    assert(d === 2L)
  }
}
