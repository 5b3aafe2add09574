package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Materialize.MatOps

/** Throwaway stage-timing probe for the SupplierGraph spine (round-9
  * perf work): times the edge build and the q473 BFS pieces in
  * isolation so plan changes are judged on measurements, not guesses. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Tables.lineitem(spark, sfDir).count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val e = t("edges build")(
        graft.queries.SupplierGraph.edges(spark, sfDir))
      println(s"[probe] |E| = ${e.count()}")
      val ed = t("ed (both dirs) mat")(
        e.select(col("a"), col("c"))
          .unionAll(e.select(col("c").as("a"), col("a").as("c")))
          .select(col("a").as("ea"), col("c").as("ec")).materialize())
      val deg = ed.groupBy(col("ea")).agg(count(lit(1)).as("dg"))
      val hub = deg.orderBy(col("dg").desc, col("ea")).limit(32)
        .select(col("ea").as("src"))
      val spr = deg.orderBy(pmod(col("ea") * 2654435761L, lit(2147483648L)),
          col("ea")).limit(32).select(col("ea").as("src"))
      val budget = hub.unionAll(spr).distinct()
      var reach = t("bfs init")(budget.select(col("src"),
        col("src").as("node"), lit(0L).as("d")).materialize(truncate = true))
      var frontier = reach
      for (depth <- 1L to 4L) {
        frontier = t(s"bfs round $depth frontier")(
          frontier.join(ed, col("node") === col("ea"))
            .select(col("src"), col("ec").as("node"), lit(depth).as("d"))
            .distinct()
            .join(reach.select(col("src").as("rs"), col("node").as("rn")),
              col("src") === col("rs") && col("node") === col("rn"),
              "left_anti")
            .materialize(truncate = true))
        reach = t(s"bfs round $depth union")(
          reach.unionAll(frontier).materialize(truncate = true))
      }
      t("walk agg + collect") {
        reach.groupBy(col("src"))
          .agg(max(col("d")).as("ecc"), count(lit(1)).as("reached"))
          .collect()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
