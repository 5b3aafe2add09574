package graft.sim

import graft.Materialize.MatOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse TF-IDF cosine similarity join — document-to-document
  * similarity via posting-list intersection (document-at-a-time dot
  * products), the lexical sibling of the embedding near-dup joins:
  * catches reworded-but-same-vocabulary duplicates that embedding
  * models may merge and exact shingle Jaccard may miss.
  *
  * Scale design:
  *  - the dot product decomposes over shared terms, so candidates come
  *    from a TERM-keyed self-join of the (doc, term, weight) table —
  *    never a doc×doc cross join. Per-term cost is df², which is why
  *    `maxDf` is load-bearing: terms in more than `maxDf` documents
  *    are dropped BEFORE the join (the classic DAAT stop-term prune).
  *    That is simultaneously the quality choice (ubiquitous terms
  *    carry no discrimination — their idf ≈ 0 anyway) and the skew
  *    bound (no posting list, hence no join partition, exceeds
  *    maxDf rows).
  *  - weights are exact integers: idf = ln(N/df) is quantized to
  *    DECIMAL(18,9) the moment it leaves the ln (NOTES rule 4 — the
  *    last ulp of ln is not cross-engine portable), then floored to a
  *    milli-scale integer; the component is tf·idf_milli. Dots and
  *    norms are then exact DECIMAL(38,0) sums in any order, and the
  *    cosine is ONE pinned double sequence dot/(√na·√nb).
  *  - the tf table (per-doc distinct terms — sub-corpus-sized) is
  *    materialized once and feeds the df dim, both self-join sides,
  *    and the norms; nothing re-scans the raw corpus.
  *
  * Output: (doc_a, doc_b, dot, norm_a, norm_b, cos) with
  * doc_a < doc_b, filtered to cos ≥ minCos. dot/norms are
  * DECIMAL(38,0) (callers cast for emission).
  */
object SparseSim {

  /** @param docs     one row per document
    * @param idCol    document id column name
    * @param termsCol array-of-terms expression (tokens, shingles, …)
    * @param maxDf    posting-list cap: terms in more docs are pruned
    * @param minCos   cosine threshold in [0, 1]
    */
  def tfidfCosinePairs(
      docs: DataFrame,
      idCol: String,
      termsCol: Column,
      maxDf: Long,
      minCos: Double): DataFrame = {
    require(maxDf >= 1, "maxDf must be >= 1")
    require(minCos >= 0.0 && minCos <= 1.0, s"minCos in [0,1]: $minCos")
    val d38 = "decimal(38,0)"
    val tf = docs
      .select(col(idCol).as("__id"), explode(termsCol).as("__t"))
      .groupBy(col("__id"), col("__t"))
      .agg(count(lit(1)).as("__tf"))
      .materialize()
    val tot = tf.agg(countDistinct(col("__id")).as("__n"))
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf)
    // idf_milli = ⌊1000 · q9(ln(N/df))⌋ — quantize the ln OUTPUT first
    // (q98/q105 discipline), floor the already-exact decimal, and only
    // then cast the integral value (no decimal→int rounding ambiguity)
    val weights = dfreq.crossJoin(broadcast(tot))
      .withColumn("__w",
        floor(log(col("__n").cast("double") / col("__df").cast("double"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)) * 1000)
          .cast("long"))
      .select(col("__t"), col("__w"))
    val comp = tf.join(weights, "__t")
      .select(col("__id"), col("__t"), (col("__tf") * col("__w")).as("__c"))
      .materialize()
    val norms = comp.groupBy(col("__id"))
      .agg(sum((col("__c") * col("__c")).cast(d38)).cast(d38).as("__n2"))
    val x = comp.select(col("__id").as("__xa"), col("__t"),
      col("__c").as("__ca"))
    val y = comp.select(col("__id").as("__xb"), col("__t"),
      col("__c").as("__cb"))
    val dots = x.join(y, Seq("__t"))
      .where(col("__xa") < col("__xb"))
      .groupBy(col("__xa"), col("__xb"))
      .agg(sum((col("__ca") * col("__cb")).cast(d38)).cast(d38).as("dot"))
    dots
      .join(norms.select(col("__id").as("__xa"), col("__n2").as("norm_a")),
        "__xa")
      .join(norms.select(col("__id").as("__xb"), col("__n2").as("norm_b")),
        "__xb")
      .withColumn("cos",
        col("dot").cast("double") /
          (sqrt(col("norm_a").cast("double")) *
            sqrt(col("norm_b").cast("double"))))
      .where(col("cos") >= minCos)
      .select(col("__xa").as("doc_a"), col("__xb").as("doc_b"),
        col("dot"), col("norm_a"), col("norm_b"), col("cos"))
  }
}
