package graft.operators
import graft.Materialize.MatOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.SketchExprs

/** Bloom-pruned joins — the runtime-filter idea made an explicit,
  * composable operator. The regime: a fact table joins a dimension
  * whose (filtered) key set is too LARGE for a broadcast hash join
  * (tens of millions of keys blow the driver/executor hash-map budget)
  * but whose BLOOM is small — 50M keys at 1% fpp is ~60 MB of bits.
  * Broadcasting the bloom prunes the fact side in its scan stage, so
  * the shuffle that feeds the exact join moves only the (approximate)
  * matches instead of the whole fact table. At 100 TB the exchange IS
  * the cost; a 2% survivor rate is a 50× cheaper shuffle bought with
  * one scan-stage codegen'd expression per row.
  *
  * Exactness: blooms have no false negatives, so pruning never drops a
  * true match; false positives are eliminated by the exact join that
  * follows. Results are therefore bit-identical to the unpruned join —
  * the q116 oracle runs the plain semi-join and hash-matches.
  */
object BloomJoin {

  private def bloomBits(
      keys: DataFrame, keyCol: String, expected: Long, fpp: Double) = {
    val bloom = keys.stat.bloomFilter(keyCol, expected, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** `facts LEFT SEMI JOIN dim ON facts.keyCol = dim.dimKeyCol`, with a
    * bloom over the dimension keys pruning the fact side before the
    * shuffle. `expectedKeys` sizes the bloom (estimate high: an
    * undersized bloom only raises the false-positive rate, never loses
    * matches). Keys are integral (long); null fact keys never match a
    * semi-join and the bloom expression is null-safe the same way.
    *
    * The exact semi-join still runs on the survivors — the bloom moves
    * work, it never answers. Plans as: scan facts → bloom filter →
    * exchange(key) ⋈ exchange(dim keys), with the fact exchange sized
    * by survivors only.
    */
  def semiPruned(
      facts: DataFrame,
      keyCol: String,
      dim: DataFrame,
      dimKeyCol: String,
      expectedKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    require(expectedKeys > 0, s"expectedKeys must be > 0: $expectedKeys")
    require(fpp > 0 && fpp < 1, s"fpp in (0,1): $fpp")
    require(!facts.columns.contains("__bj_key"),
      "fact column __bj_key clashes with join internals")
    // renamed key side: fact and dim key columns routinely SHARE a
    // name in star schemas, and an unqualified equi-join on it would
    // be ambiguous
    val keys = dim.select(col(dimKeyCol).as("__bj_key")).materialize(eager = false)
    val bits = bloomBits(keys, "__bj_key", expectedKeys, fpp)
    facts
      .where(coalesce(
        SketchExprs.bloomMightContainLong(col(keyCol), bits), lit(false)))
      .join(keys, col(keyCol) === col("__bj_key"), "left_semi")
  }

  /** The anti complement: `facts LEFT ANTI JOIN dim`. Definite bloom
    * misses (and null keys, which an anti-join keeps) bypass the
    * shuffle entirely; only the maybe-contained sliver is verified by
    * the exact anti-join. Same exactness argument, inverted: a bloom
    * miss PROVES absence, so the bypass branch is correct by
    * construction.
    */
  def antiPruned(
      facts: DataFrame,
      keyCol: String,
      dim: DataFrame,
      dimKeyCol: String,
      expectedKeys: Long,
      fpp: Double = 0.01): DataFrame = {
    require(expectedKeys > 0, s"expectedKeys must be > 0: $expectedKeys")
    require(fpp > 0 && fpp < 1, s"fpp in (0,1): $fpp")
    require(!facts.columns.contains("__bj_key"),
      "fact column __bj_key clashes with join internals")
    val keys = dim.select(col(dimKeyCol).as("__bj_key")).materialize(eager = false)
    val bits = bloomBits(keys, "__bj_key", expectedKeys, fpp)
    val maybe = SketchExprs.bloomMightContainLong(col(keyCol), bits)
    facts.where(coalesce(!maybe, lit(true)))
      .unionByName(facts.where(coalesce(maybe, lit(false)))
        .join(keys, col(keyCol) === col("__bj_key"), "left_anti"))
  }
}
