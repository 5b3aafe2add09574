package graft.text
import graft.Materialize.MatOps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004) = damped
  * PageRank over the token co-occurrence graph — the canonical
  * ITERATIVE graph computation, done the way a Spark-native engine
  * should do fixpoints (cf. `Dedup.alternatingStarCC`): a bounded
  * number of dataflow rounds with an eager localCheckpoint per round,
  * so round k's plan starts from round k−1's ROWS instead of replaying
  * an ever-deepening lineage (the classic iterative-algorithm failure
  * mode: exponential plan growth, re-scanned inputs, stack-depth
  * blowups).
  *
  * Exactness: every rank is a SCALED INTEGER (q67's trick applied to
  * power iteration) — rank r is ⌊scale·p⌋-ish with the update
  *
  *   r'(v) = (3·scale) div (20·N)  +  Σ_{u→v} (17·((w_uv·r(u)) div W_u)) div 20
  *
  * (damping 17/20 = 0.85, teleport 3/20, W_u = Σ_out w). Integer
  * division and integer sums are bit-identical on any engine and any
  * partitioning, so the whole iteration — not just the final ranking —
  * replays exactly in DuckDB (q99), where float PageRank could never
  * hash-compare. Flooring leaks ≤ 1 rank unit per edge per round: at
  * scale = 1e9 that is a ~1e-9-relative perturbation, irrelevant to
  * ranking and identically reproduced everywhere.
  *
  * Scale shape: edges/out-weights/nodes are checkpointed stage
  * boundaries (the corpus is tokenized once); each round is one
  * shuffled aggregation on the dst key (partial map-side sums) plus a
  * left join back to the node set. Overflow headroom: w_uv·r(u) needs
  * w_uv·scale < 2^63 — at scale = 1e9 any edge weight below ~9.2e9
  * is safe (a single bigram repeated 9 billion times).
  */
object TextRank {

  /** Damped PageRank over a directed weighted graph, scaled-integer
    * exact. `edges` needs (`srcCol`, `dstCol`, `wCol`: positive longs).
    * Returns (node, rank) with rank a BIGINT in units of 1/scale.
    * Dangling nodes (no out-edges) simply emit nothing — callers that
    * need stochastic completeness should symmetrize first (as
    * [[keywords]] does, which guarantees none exist).
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      iterations: Int = 5,
      scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 1 && scale >= 1000L,
      s"bad params iterations=$iterations scale=$scale")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).as("w")).materialize()
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
      .materialize()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().materialize()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val init = scale / n
    val base = (3L * scale) / (20L * n)
    var ranks = nodes.select(col("node"), lit(init).as("rank"))
      .materialize()
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(outw, Seq("src"))
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr("(17 * ((w * rank) div wout)) div 20").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      // eager checkpoint per round: constant-depth plans (see scaladoc)
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("s"), lit(0L))).as("rank"))
        .materialize(truncate = true) // per-round: plans must stay constant-depth
    }
    ranks
  }

  /** Personalized PageRank — [[pageRank]] with the teleport restricted
    * to a SEED set: rank becomes "importance relative to the seeds"
    * (random walks restart at seeds only), the propagation trick
    * behind seed-based quality scoring of a document graph (trusted
    * sources push mass to whatever they link/resemble) and
    * related-item expansion from a labeled core. Same scaled-integer
    * discipline — seeds get teleport (3·scale) div (20·S) and initial
    * mass scale div S; non-seeds start (and teleport) at zero — so the
    * whole iteration stays hash-exact. Seeds outside the graph are
    * ignored; S counts the ones present. */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      seeds: DataFrame,
      seedCol: String,
      iterations: Int = 5,
      scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 1 && scale >= 1000L,
      s"bad params iterations=$iterations scale=$scale")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).as("w")).materialize()
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
      .materialize()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().materialize()
    val sd = seeds.select(col(seedCol).as("node")).distinct()
      .join(nodes, Seq("node"), "leftsemi")
      .withColumn("__seed", lit(1L))
      .materialize()
    val sCount = sd.count()
    require(sCount > 0, "no seed appears in the graph")
    val init = scale / sCount
    val base = (3L * scale) / (20L * sCount)
    def withSeedFlag(df: DataFrame): DataFrame =
      df.join(sd, Seq("node"), "left")
    var ranks = withSeedFlag(nodes)
      .select(col("node"),
        when(col("__seed").isNotNull, lit(init)).otherwise(lit(0L))
          .as("rank"))
      .materialize()
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(outw, Seq("src"))
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr("(17 * ((w * rank) div wout)) div 20").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = withSeedFlag(nodes).join(contribs, Seq("node"), "left")
        .select(col("node"),
          (when(col("__seed").isNotNull, lit(base)).otherwise(lit(0L)) +
            coalesce(col("s"), lit(0L))).as("rank"))
        .materialize(truncate = true) // per-round: constant-depth plans
    }
    ranks
  }

  /** TextRank keywords: rank tokens by PageRank over the symmetrized
    * adjacent-token (bigram) co-occurrence graph; top-k by (rank desc,
    * token). Self-loops (a token repeated back-to-back) are dropped.
    */
  def keywords(
      docs: DataFrame,
      textCol: String,
      iterations: Int = 5,
      k: Int = 30): DataFrame = {
    val pair = docs.select(
        explode(graft.dedup.Dedup.shingles(col(textCol), 2)).as("g"))
      .select(element_at(split(col("g"), " "), 1).as("a"),
        element_at(split(col("g"), " "), 2).as("b"))
      .where(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val e = pair.select(col("a").as("src"), col("b").as("dst"), col("c"))
      .unionByName(pair.select(col("b").as("src"), col("a").as("dst"), col("c")))
      .groupBy(col("src"), col("dst")).agg(sum(col("c")).as("w"))
    pageRank(e, "src", "dst", "w", iterations)
      .orderBy(col("rank").desc, col("node"))
      .limit(k)
  }
}
