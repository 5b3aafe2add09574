package graft.tools
import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** A/B the materialization policy (graft.Materialize) on the heaviest
  * materialize-using queries: local checkpoint (default) vs the
  * cluster-safe persist(MEMORY_AND_DISK) mode. Evidence for VERDICT r5
  * #4's "policy swappable, bench neutral" criterion.
  */
object MatModeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = Seq("q87_dsir_scores", "q95_curated_corpus",
      "q98_bm25_topk", "q68_training_corpus", "q99_textrank_keywords")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def run(mode: String): Map[String, Double] = {
      if (mode == "local") spark.conf.unset(graft.Materialize.ModeKey)
      else spark.conf.set(graft.Materialize.ModeKey, mode)
      names.map { n =>
        val t0 = System.nanoTime()
        Registry.byName(n).run(spark, dir).count()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        n -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    run("local") // warm-up pass
    val local = run("local")
    val persist = run("persist")
    names.foreach { n =>
      println(f"[matmode] $n local=${local(n)}%.2f persist=${persist(n)}%.2f")
    }
    spark.stop()
  }
}
