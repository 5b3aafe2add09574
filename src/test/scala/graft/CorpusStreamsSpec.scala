package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.CorpusStreams
import graft.text.{Chunking, Packing}

/** Stream-vs-batch equality for the incremental corpus-prep faces:
  * chunking (stateless, runs unchanged on a stream) and greedy packing
  * (cross-micro-batch cursor state). */
class CorpusStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // docs with ids 1..12, lengths chosen so several bins close mid-stream
  private def fixture: Seq[(Long, String)] =
    (1L to 12L).map(i => i -> (1 to (i % 5 + 1).toInt).map(k => s"w${i}_$k").mkString(" "))

  /** Stage `rows` as one parquet file named `name` inside `dir` (file
    * source streams files in name order here since writes are sequential). */
  private def stage(dir: java.nio.file.Path, name: String,
      rows: Seq[(Long, String)]): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cs_stage")
    rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).iterator()
    var moved = false
    while (part.hasNext && !moved) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) {
        java.nio.file.Files.copy(p, dir.resolve(name)); moved = true
      }
    }
    assert(moved)
  }

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))

  test("chunking on a stream equals the batch fan-out (stateless face)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cs_chunk")
    stage(dir, "b1.parquet", fixture.take(6))
    stage(dir, "b2.parquet", fixture.drop(6))
    val expected = Chunking.chunk(fixture.toDF("doc_id", "text"),
      "doc_id", "text", chunkSize = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = Chunking.chunk(stream, "doc_id", "text", chunkSize = 3, stride = 2)
      .writeStream.format("memory").queryName("chunk_stream_test")
      .outputMode("append").start()
    q.processAllAvailable()
    val got = spark.table("chunk_stream_test")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    q.stop()
    assert(got === expected)
  }

  test("PII redaction on a stream equals the batch projection (stateless face)") {
    // redaction is a pure scan-stage projection — it runs UNCHANGED on a
    // stream, which is the point: scrubbing happens at ingest, before
    // any text is ever persisted downstream
    import graft.text.Redaction
    val piiDocs = (1L to 8L).map(i =>
      i -> s"doc $i mail u$i@ex.org tel 555-000-000$i ip 10.0.0.$i")
    val dir = java.nio.file.Files.createTempDirectory("graft_cs_pii")
    stage(dir, "b1.parquet", piiDocs.take(4))
    stage(dir, "b2.parquet", piiDocs.drop(4))
    def project(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), Redaction.redact(col("text")).as("r"))
    val expected = project(piiDocs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = project(stream)
      .writeStream.format("memory").queryName("redact_stream_test")
      .outputMode("append").start()
    q.processAllAvailable()
    val got = spark.table("redact_stream_test")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    q.stop()
    assert(got === expected)
    assert(got.values.forall(t =>
      t.contains("<EMAIL>") && t.contains("<PHONE>") && t.contains("<IP>")))
  }

  test("gopher quality flags on a stream equal the batch flags (stateless face)") {
    // rule filtering is scan-stage column math — it runs UNCHANGED on a
    // stream, so quality gating can happen at ingest like redaction
    import graft.text.QualityRules
    val docs = (1L to 8L).map { i =>
      val body = (1 to (i * 3).toInt).map(j => s"tok$j").mkString(" ")
      i -> (if (i % 3 == 0) s"the a of $body" else body)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_cs_gopher")
    stage(dir, "b1.parquet", docs.take(4))
    stage(dir, "b2.parquet", docs.drop(4))
    val p = QualityRules.GopherParams(minWords = 5, maxWords = 30)
    def project(df: org.apache.spark.sql.DataFrame) =
      QualityRules.gopherFlags(df, "text", p)
        .select("doc_id", "n_words", "keep")
    val expected = project(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = project(stream)
      .writeStream.format("memory").queryName("gopher_stream_test")
      .outputMode("append").start()
    q.processAllAvailable()
    val got = spark.table("gopher_stream_test")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    q.stop()
    assert(got === expected)
    assert(expected.values.exists(_._2) && expected.values.exists(!_._2),
      "fixture must exercise both keep outcomes")
  }

  test("greedy packing stream under OUT-OF-ORDER arrival: bins stay valid, every doc packed once") {
    // later micro-batch delivers SMALLER ids — bin numbering may differ
    // from the batch replay (documented contract) but bins must never
    // overfill and every doc must land exactly once
    val dir = java.nio.file.Files.createTempDirectory("graft_cs_ooo")
    stage(dir, "b1.parquet", fixture.drop(6)) // ids 7-12 first
    stage(dir, "b2.parquet", fixture.take(6)) // ids 1-6 after
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = CorpusStreams.greedyPackStream(stream, "doc_id", "text",
      capacity = 6L, nBuckets = 2, salt = "s")
      .writeStream.format("memory").queryName("pack_ooo_test")
      .outputMode("append").start()
    q.processAllAvailable()
    val rows = spark.table("pack_ooo_test").collect()
    q.stop()
    assert(rows.map(_.getAs[Long]("doc_id")).sorted === (1L to 12L).toArray)
    val byBin = rows.groupBy(r => (r.getAs[Int]("bucket"), r.getAs[Int]("bin_idx")))
    assert(byBin.values.forall { bs =>
      bs.map(_.getAs[Long]("n_tokens")).sum <= 6L || bs.length == 1
    })
  }

  test("greedy packing stream equals batch under ordered arrival; cursor spans batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cs_pack")
    stage(dir, "b1.parquet", fixture.take(6))
    stage(dir, "b2.parquet", fixture.drop(6))
    val expected = Packing.greedyPack(fixture.toDF("doc_id", "text"),
      "doc_id", "text", capacity = 6L, nBuckets = 2, salt = "s")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("bucket"), r.getAs[Int]("bin_idx"),
          r.getAs[Long]("bin_offset"), r.getAs[Long]("n_tokens"))).toMap
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = CorpusStreams.greedyPackStream(stream, "doc_id", "text",
      capacity = 6L, nBuckets = 2, salt = "s")
      .writeStream.format("memory").queryName("pack_stream_test")
      .outputMode("append").start()
    q.processAllAvailable()
    val got = spark.table("pack_stream_test")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("bucket"), r.getAs[Int]("bin_idx"),
          r.getAs[Long]("bin_offset"), r.getAs[Long]("n_tokens"))).toMap
    q.stop()
    assert(got === expected)
    // the equality above is only meaningful if some bin actually spans
    // the two micro-batches — verify at least one bucket's first batch-2
    // doc continued a batch-1 bin (nonzero offset or reused bin_idx)
    val batch1MaxBin = got.filter(_._1 <= 6L).values.groupBy(_._1)
      .view.mapValues(_.map(_._2).max).toMap
    val batch2Continues = got.filter(_._1 > 6L).exists { case (_, (bkt, bin, off, _)) =>
      batch1MaxBin.get(bkt).exists(m => bin == m || (bin == m && off > 0) || bin <= m)
    }
    assert(batch2Continues, "no bin spanned the micro-batch boundary — fixture too weak")
  }

  test("streaming weighted reservoir equals the batch sample, any arrival order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.CorpusStreams
    import graft.text.Sampling
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows: Seq[(Long, Long)] =
      (1L to 40L).map(i => i -> (i % 7 + 1)) // (id, weight)
    val mem = MemoryStream[(Long, Long)]
    val q = CorpusStreams.weightedReservoirStream(
      mem.toDF.toDF("id", "w").withColumn("g", lit("all")),
      "g", "id", "w", k = 5, salt = "res1")
      .writeStream.format("memory").queryName("res_out")
      .outputMode("update").start()
    try {
      // arrival order deliberately scrambled + one re-delivery
      val (b1, b2) = rows.reverse.splitAt(15)
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2 ++ b1.take(3): _*)
      q.processAllAvailable()
      val out = spark.table("res_out")
      val maxV = out.agg(max("version")).head().getLong(0)
      val streamed = out.where(col("version") === maxV)
        .orderBy("rank").select("id").as[Long].collect().toSeq
      val batch = Sampling.weightedSample(
        rows.toDF("id", "w"), "id", "w", k = 5, salt = "res1")
        .select("id").as[Long].collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
