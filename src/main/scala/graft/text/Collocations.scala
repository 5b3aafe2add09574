package graft.text

import graft.Materialize.MatOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pointwise-mutual-information collocations — which adjacent token
  * pairs occur together far more than their unigram frequencies
  * predict ("new york", "machine learning"): phrase mining for
  * tokenizer vocabularies, stop-phrase lists, and the "is this corpus
  * templated?" diagnostic (a natural corpus has a long PMI tail; a
  * templated one has a few giant collocations).
  *
  * PMI = ln( p(w,v) / (p(w)·p(v)) ) with p from corpus counts reduces
  * to the exact integer rational c_wv·T1² / (T2·c_w·c_v) (T1 = total
  * tokens, T2 = total bigrams). The ratio is ONE pinned double divide
  * of exact DECIMAL(38,0) products, the ln is quantized to
  * DECIMAL(18,9) the moment it's computed (NOTES rule 4), and the
  * emitted pmi is the exact integral ⌊1000·q9(ln)⌋.
  *
  * Scale shape: one corpus scan fans into the bigram count and the
  * unigram count, both reduced to vocabulary-sized dims and
  * materialized; the pair table joins its two unigram legs against
  * the broadcast unigram dim. `minCount` prunes rare pairs BEFORE the
  * joins — PMI's known pathology (a 1-occurrence pair of two rare
  * words scores astronomically) and the fan-out bound in one knob.
  *
  * Output: (w, v, c_pair, c_w, c_v, pmi_milli).
  */
object Collocations {

  def pmiPairs(
      docs: DataFrame,
      textCol: Column,
      minCount: Long): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val d38 = "decimal(38,0)"
    val toks = docs.select(explode(TextAnalysis.tokens(textCol)).as("w"))
    val c1 = toks.groupBy(col("w")).agg(count(lit(1)).as("c_w"))
      .materialize() // vocab dim: feeds totals + two join legs
    val biAll = docs
      .select(explode(graft.dedup.Dedup.shingles(textCol, 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c_pair"))
      .materialize() // bigram dim: feeds the total AND the pruned pairs
    // T2 is the total over ALL bigrams — p(w,v)'s denominator must be
    // computed before the rare-pair prune or every probability inflates
    val t1 = c1.agg(sum(col("c_w")).as("__t1"))
    val t2 = biAll.agg(sum(col("c_pair")).as("__t2"))
    val bi = biAll
      .where(col("c_pair") >= minCount)
      .withColumn("w", element_at(split(col("g"), " "), 1))
      .withColumn("v", element_at(split(col("g"), " "), 2))
    bi
      .join(broadcast(c1.select(col("w"), col("c_w"))), "w")
      .join(broadcast(c1.select(col("w").as("v"), col("c_w").as("c_v"))), "v")
      .crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
      .withColumn("__num",
        (col("c_pair").cast(d38) * col("__t1") * col("__t1")).cast(d38))
      .withColumn("__den",
        (col("__t2").cast(d38) * col("c_w") * col("c_v")).cast(d38))
      .withColumn("pmi_milli",
        floor(log(col("__num").cast("double") / col("__den").cast("double"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)) * 1000)
          .cast("long"))
      .select(col("w"), col("v"), col("c_pair"), col("c_w"), col("c_v"),
        col("pmi_milli"))
  }
}
