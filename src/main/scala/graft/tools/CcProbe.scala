package graft.tools
import graft.Materialize.MatOps
import org.apache.spark.sql.SparkSession

/** Diagnostic: round count + wall split of q65's stages at a given SF. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    var t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.8)
      .materialize()
    val nPairs = pairs.count()
    println(f"[ccprobe] pairs: $nPairs rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val (labels, rounds) = graft.dedup.Dedup.alternatingStarCC(pairs, 50)
    val n = labels.count()
    println(f"[ccprobe] cc: $n labels, $rounds rounds in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
