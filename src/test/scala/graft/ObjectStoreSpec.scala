package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{LakePaths, ObjectStore}

/** S3A conf surface (reference `src/common/spark.py:63-72` parity):
  * conf assembly, env contract, builder wiring, and URI-agnostic lake
  * paths. No real object-store IO — the sandbox ships no hadoop-aws
  * jar or MinIO; what a deployment needs is exactly these confs plus
  * the standard jars. */
class ObjectStoreSpec extends AnyFunSuite {

  test("s3aConfs carries the full reference conf set") {
    val c = ObjectStore.s3aConfs("http://minio:9000", "ak", "sk")
    assert(c("spark.hadoop.fs.s3a.endpoint") == "http://minio:9000")
    assert(c("spark.hadoop.fs.s3a.access.key") == "ak")
    assert(c("spark.hadoop.fs.s3a.secret.key") == "sk")
    assert(c("spark.hadoop.fs.s3a.path.style.access") == "true")
    assert(c("spark.hadoop.fs.s3a.connection.ssl.enabled") == "false")
    assert(c("spark.hadoop.fs.s3a.impl")
      == "org.apache.hadoop.fs.s3a.S3AFileSystem")
    assert(c("spark.hadoop.fs.s3a.aws.credentials.provider")
      == "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider")
  }

  test("env contract: endpoint gates the confs; defaults match the reference") {
    assert(ObjectStore.s3aConfsFromEnv(Map.empty).isEmpty)
    val c = ObjectStore.s3aConfsFromEnv(
      Map("MINIO_ENDPOINT" -> "http://minio:9000"))
    assert(c("spark.hadoop.fs.s3a.access.key") == "admin")
    assert(c("spark.hadoop.fs.s3a.secret.key") == "admin123")
    val https = ObjectStore.s3aConfsFromEnv(
      Map("MINIO_ENDPOINT" -> "https://s3.example.com",
        "MINIO_ACCESS_KEY" -> "a", "MINIO_SECRET_KEY" -> "b"))
    assert(https("spark.hadoop.fs.s3a.connection.ssl.enabled") == "true")
  }

  test("live-session application reaches the shared hadoop conf") {
    // the suite-shared session (a fresh builder+getOrCreate would just
    // return it — and stopping it would strand every other suite)
    val spark = TestSpark.spark
    ObjectStore.applyToSession(spark,
      ObjectStore.s3aConfs("http://minio:9000", "ak", "sk"))
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.endpoint") == "http://minio:9000")
    assert(hc.get("fs.s3a.access.key") == "ak")
    assert(hc.get("fs.s3a.path.style.access") == "true")
  }

  test("PipelineRunner fails loudly on s3a paths its IO cannot honor") {
    val spark = TestSpark.spark
    // bronze ingest lists inputDir via java.nio — object-store input
    // must be rejected at entry, not mangled into './s3a:/...'
    val e1 = intercept[IllegalArgumentException] {
      graft.jobs.PipelineRunner.run(spark, "s3a://bucket/in", "/tmp/lake")
    }
    assert(e1.getMessage.contains("bronze ingest"))
    // the manifest protocol hard-links locally — s3a roots must pair
    // with the plain overwrite protocol
    val e2 = intercept[IllegalArgumentException] {
      graft.jobs.PipelineRunner.run(spark, "/tmp/in", "s3a://bucket/lake",
        graft.jobs.PipelineConfig(commitProtocol = "manifest"),
        None, None)
    }
    assert(e2.getMessage.contains("manifest"))
  }

  test("LakePaths stays URI-agnostic for s3a roots") {
    val lake = LakePaths("s3a://bucket/lake")
    assert(lake.bronze("M/regular_compact")
      == "s3a://bucket/lake/bronze/M/regular_compact")
    assert(lake.silver("M", "elo") == "s3a://bucket/lake/silver/M/elo")
    assert(ObjectStore.isObjectStorePath("s3a://bucket/lake"))
    assert(ObjectStore.isObjectStorePath("s3://bucket/lake"))
    assert(!ObjectStore.isObjectStorePath("/tmp/lake"))
    assert(!ObjectStore.isObjectStorePath("file:///tmp/lake"))
  }
}
