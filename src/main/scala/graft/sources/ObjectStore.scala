package graft.sources

import org.apache.spark.sql.SparkSession

/** Object-store (S3A) configuration surface ≙ reference
  * `src/common/spark.py:63-72`: the reference's lakehouse lives on
  * `s3a://` against MinIO, wired through `fs.s3a.*` Hadoop confs read
  * from `MINIO_ENDPOINT` / `MINIO_ACCESS_KEY` / `MINIO_SECRET_KEY`.
  * This mirrors that contract for the Scala engine so a
  * [[graft.jobs.PipelineRunner]] run accepts an `s3a://` lakeRoot with
  * no code changes — [[LakePaths]] is already URI-agnostic (string
  * concatenation), every reader/writer goes through `spark.read`/
  * `df.write`, and the only missing piece was the session conf.
  *
  * Sandbox note: `/opt/spark/jars` ships no hadoop-aws/aws-sdk bundle
  * and there is no MinIO, so actual `s3a://` IO is untestable here;
  * the conf assembly, env contract, and builder wiring are spec-tested
  * (ObjectStoreSpec) and the keys are the standard public
  * hadoop-aws surface that any real deployment provides the jars for.
  */
object ObjectStore {

  /** The `fs.s3a.*` conf map for a path-style (MinIO-like) endpoint.
    * Keys carry the `spark.hadoop.` prefix so they apply cleanly at
    * BUILDER time (SparkContext hands them to the Hadoop conf); when
    * applied to a live session use [[applyToSession]], which strips
    * the prefix and sets them on the shared Hadoop configuration
    * instead (runtime `spark.conf.set` of hadoop keys is a no-op for
    * already-created FileSystem objects — the classic silent trap). */
  def s3aConfs(
      endpoint: String,
      accessKey: String,
      secretKey: String,
      pathStyleAccess: Boolean = true,
      sslEnabled: Boolean = false): Map[String, String] = Map(
    "spark.hadoop.fs.s3a.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem",
    "spark.hadoop.fs.s3a.aws.credentials.provider" ->
      "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider",
    "spark.hadoop.fs.s3a.endpoint" -> endpoint,
    "spark.hadoop.fs.s3a.access.key" -> accessKey,
    "spark.hadoop.fs.s3a.secret.key" -> secretKey,
    "spark.hadoop.fs.s3a.path.style.access" -> pathStyleAccess.toString,
    "spark.hadoop.fs.s3a.connection.ssl.enabled" -> sslEnabled.toString)

  /** The reference's env contract: confs assembled from
    * `MINIO_ENDPOINT` / `MINIO_ACCESS_KEY` / `MINIO_SECRET_KEY`.
    * Returns empty when no endpoint is configured — a local-filesystem
    * run must not inject dangling S3A settings. (The reference
    * defaults all three; requiring the endpoint explicitly is the one
    * deliberate difference: silently pointing at `http://minio:9000`
    * from outside the compose network produces a hang, not an error.) */
  def s3aConfsFromEnv(
      env: Map[String, String] = sys.env): Map[String, String] =
    env.get("MINIO_ENDPOINT").map { endpoint =>
      s3aConfs(
        endpoint,
        env.getOrElse("MINIO_ACCESS_KEY", "admin"),
        env.getOrElse("MINIO_SECRET_KEY", "admin123"),
        pathStyleAccess = true,
        sslEnabled = endpoint.startsWith("https://"))
    }.getOrElse(Map.empty)

  /** Apply an s3a conf map to a session builder (pre-start wiring —
    * the normal path). */
  def configure(
      builder: SparkSession.Builder,
      confs: Map[String, String]): SparkSession.Builder =
    confs.foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }

  /** Apply to a LIVE session: hadoop keys must land on the shared
    * `hadoopConfiguration` (stripped of the `spark.hadoop.` prefix) —
    * setting them through `spark.conf.set` after startup does not
    * reach FileSystem initialization. */
  def applyToSession(spark: SparkSession, confs: Map[String, String]): Unit =
    confs.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration
        .set(k.stripPrefix("spark.hadoop."), v)
    }

  /** True when `path` targets an object store (scheme-qualified s3a/
    * s3/s3n URI) — callers that need a local filesystem (e.g. the
    * driver-side CSV sink's atomic rename) use this to fail loudly
    * instead of mangling the URI through java.nio. */
  def isObjectStorePath(path: String): Boolean =
    path.matches("^s3a?://.*") || path.startsWith("s3n://")
}
