package graft.tools
import org.apache.spark.sql.SparkSession
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.PolyHash.polyHash
    import org.apache.spark.sql.functions._
    val df = spark.range(3).select(polyHash(concat(lit("ab"), col("id").cast("string"))).as("h"))
    df.queryExecution.debug.codegen()
    df.show()
    spark.stop()
  }
}
