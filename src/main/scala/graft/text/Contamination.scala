package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Benchmark-contamination detection for training-corpus hygiene: for each
  * document of a (small) benchmark/eval set, the fraction of its distinct
  * word n-gram shingles that appear anywhere in the (huge) training
  * corpus. The published decontamination recipes (GPT-3 appendix C and its
  * descendants) are exactly this n-gram-overlap test.
  *
  * Scale shape (train ≫ bench is the only regime that matters):
  *   1. benchmark shingles — distinct per doc, exploded — form a SMALL
  *      (bench_docs × grams) table that fits in a broadcast;
  *   2. the training corpus is scanned ONCE and its shingles are
  *      semi-joined in the scan stage against the broadcast benchmark
  *      gram set: no global distinct of training grams ever happens,
  *      only the surviving subset (≤ the benchmark gram count) is
  *      distinct'd;
  *   3. per-benchmark-doc hit counting joins that tiny survivor set back
  *      against the benchmark grams, broadcast again.
  * The training side never shuffles its text or its full gram set — the
  * only wide work against the 100 TB side is the scan + broadcast filter.
  */
object Contamination {

  /** Per-benchmark-doc overlap counts against the training corpus:
    * (doc_id, n_grams, n_hits, contamination = n_hits/n_grams).
    * Benchmark docs with fewer than n tokens have no shingles and are
    * omitted (nothing to test). The fraction is an exact int/int division.
    */
  def overlap(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    def grams(df: DataFrame) = df.select(
      col(idCol).as("doc_id"),
      explode(array_distinct(Dedup.shingles(col(textCol), n))).as("gram"))
    val benchGrams = grams(bench)
    val trainHits = grams(train).select("gram")
      .join(broadcast(benchGrams.select("gram").distinct()), Seq("gram"), "left_semi")
      .distinct()
    benchGrams
      .join(broadcast(trainHits.withColumn("hit", lit(1))), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hits"))
      .select(col("doc_id"), col("n_grams"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_grams")).as("contamination"))
  }
}
