package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Prints, per custom kernel, whether its projection runs inside a
  * WholeStageCodegen span (i.e. the expression participates in codegen
  * via doGenCode rather than falling back to interpreted eval, which
  * would split the span and cost a virtual call per EXPRESSION per row
  * instead of one per kernel). Exit code 1 if any kernel breaks the span.
  */
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.PolyHash.polyHash
    import graft.functions.SketchExprs
    import org.apache.spark.sql.functions._

    val ids = spark.range(3)
    val text = ids.select(concat(lit("a b c d e f "), col("id").cast("string")).as("t"))
    val vecs = ids.select(array((0 until 8).map(i => (col("id") + i).cast("float")): _*).as("v"))
    val pqEntries = Array.tabulate(2, 4, 4)((m, k, i) => (m + k + i).toFloat)

    def span(name: String, df: DataFrame): Boolean = {
      val plan = df.queryExecution.executedPlan.toString
      // the kernel's Project must sit INSIDE a WholeStageCodegen stage:
      // a fallback expression leaves a bare "Project [...]" line without
      // the "*(n)" stage marker while the scan below still codegens, so
      // checking for any "*(" in the whole plan would miss it
      val fallbackProject = plan.linesIterator.exists { l =>
        val t = l.dropWhile(c => c == ' ' || c == '+' || c == '-' || c == ':')
        t.startsWith("Project") // un-codegen'd; inside a span it prints "*(n) Project"
      }
      val ok = plan.contains("*(") && !fallbackProject
      println(s"[codegen] $name: ${if (ok) "WHOLE-STAGE" else "FALLBACK"}")
      if (!ok) println(plan)
      df.collect() // and it actually evaluates
      ok
    }

    val results = Seq(
      span("PolyHash", text.select(polyHash(col("t")).as("h"))),
      span("Shingles", text.select(SketchExprs.shingles(col("t"), 3).as("sh"))),
      span("MinHashSig", text.select(SketchExprs.minHashSig(
        SketchExprs.shingles(col("t"), 3), 4, 131L, 2147483647L,
        Array(3L, 5L, 7L, 11L), Array(1L, 2L, 3L, 4L)).as("sig"))),
      span("SimHash64", text.select(SketchExprs.simHash64(
        split(col("t"), " "), 32, 131L, 2147483647L).as("sh"))),
      span("CosineSim", vecs.select(SketchExprs.cosineSim(col("v"), col("v")).as("c"))),
      span("HyperplaneSig", vecs.select(SketchExprs.hyperplaneSig(col("v"), 4, 8).as("s"))),
      span("PqEncode", vecs.select(SketchExprs.pqEncode(col("v"), pqEntries).as("c"))),
      span("PqDistTable", vecs.select(SketchExprs.pqDistTable(col("v"), pqEntries).as("qd"))),
      span("CanonicalText", text.select(
        graft.functions.TextNorm.canonicalText(col("t")).as("c"))))
    spark.stop()
    if (results.exists(!_)) sys.exit(1)
  }
}
