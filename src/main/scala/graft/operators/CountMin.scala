package graft.operators
import graft.Materialize.MatOps

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHash

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a distributed
  * aggregate: approximate per-item counts in `depth × width` integers of
  * state, independent of corpus size — the bounded-memory way to ask
  * "how often does each token/n-gram occur" over 100 TB without
  * shuffling a full vocabulary. Estimates only ever OVER-count
  * (collisions add, never subtract): error ≤ 2N/width with probability
  * 1 − 2^−depth.
  *
  * Unlike HLL's register internals (q38 stays rows-only), a CMS is
  * DETERMINISTIC given its hash rows — here row r buckets item x at
  * `saltedHash(x, "cms<r>") % width` — so sketch contents and estimates
  * replay exactly in the DuckDB oracle (q94).
  *
  * Scale shape: build = one explode(depth) + one grouped count with
  * map-side partials — at most depth × width rows survive per
  * partition, so the shuffle is sketch-sized, not corpus-sized.
  * Estimate = broadcast the (tiny) sketch against the query items and
  * take the per-item min over rows.
  */
object CountMin {

  /** Bucket of `item` in hash row `row` — the one recipe both the
    * builder, the estimator, and the oracle SQL replay. */
  def bucketFor(item: Column, row: Int, width: Int): Column =
    PolyHash.saltedHash(item, s"cms$row") % width

  /** Build the sketch: (row, bucket, cnt) with at most depth × width
    * rows; absent (row, bucket) pairs mean a zero counter. */
  def build(items: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape $depth x $width")
    items
      .select((0 until depth).map(r =>
        bucketFor(col(itemCol), r, width).as(s"b$r")): _*)
      .select(posexplode(array((0 until depth).map(r => col(s"b$r")): _*))
        .as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[build]] over PRE-AGGREGATED (item, weight) rows: bucket counters
    * sum the weights instead of counting rows. By CMS linearity this
    * equals `build` on the expanded multiset exactly (spec-pinned) —
    * and it is the shape to prefer when a counts table already exists
    * or feeds other consumers (the q67 pre-aggregation discipline: the
    * corpus contributes one wordcount, the vocabulary-sized counts
    * table fans out from there). */
  def buildWeighted(counts: DataFrame, itemCol: String, weightCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape $depth x $width")
    counts
      .select(col(weightCol).as("__w") +: (0 until depth).map(r =>
        bucketFor(col(itemCol), r, width).as(s"b$r")): _*)
      .select(col("__w"),
        posexplode(array((0 until depth).map(r => col(s"b$r")): _*))
          .as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Merge sketches built with the SAME (depth, width): counter-wise
    * sum. CMS is a linear sketch — merge(build(A), build(B)) ≡
    * build(A ∪ B) exactly (spec-pinned) — which is what makes it
    * incremental: per-micro-batch (or per-partition, per-day) sketches
    * combine associatively with no corpus re-scan, the same contract
    * Spark's own partial aggregation exploits. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("row", "bucket")
      .agg(sum(col("cnt")).as("cnt"))

  /** Equi-join cardinality estimation via the CMS inner product
    * (the AMS idea carried by CMS linearity, Cormode & Muthukrishnan
    * §4.3): |A ⋈ B| on a key = Σ_k fA(k)·fB(k), estimated as
    * min over hash rows r of Σ_b A[r][b]·B[r][b]. Like point queries
    * it only ever OVER-estimates (collisions add cross terms, never
    * subtract — spec-pinned), with error ≤ N_A·N_B/width per row. This
    * is the sketch-sized answer to the planner question "how big would
    * this join be?" — both inputs are summarized in depth × width
    * integers, so the estimate costs nothing at 100 TB while the real
    * join costs everything.
    *
    * Both sketches must share (depth, width) and the [[bucketFor]]
    * recipe. Products run in DECIMAL(38,0): two corpus-sized counts
    * multiply to ~N², past long range long before 38 digits. Output:
    * one row, `join_size_est` DECIMAL(38,0).
    */
  def joinSizeEstimate(sketchA: DataFrame, sketchB: DataFrame,
      depth: Int = 4): DataFrame = {
    require(depth >= 1, s"depth must be >= 1: $depth")
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val a = sketchA.select(col("row"), col("bucket"),
      col("cnt").cast(dec).as("__ca"))
    val b = sketchB.select(col("row"), col("bucket"),
      col("cnt").cast(dec).as("__cb"))
    // absent (row, bucket) cells are zero counters: they contribute 0
    // to the product, so the inner join loses nothing — EXCEPT a hash
    // row whose sketches share no bucket at all, whose inner product
    // is 0 and must not vanish from the min (left join from the row
    // range, coalesce 0)
    val ip = a.join(b, Seq("row", "bucket"))
      .groupBy(col("row"))
      .agg(sum(col("__ca") * col("__cb")).as("__ip"))
    sketchA.sparkSession.range(depth.toLong)
      .select(col("id").cast("int").as("row"))
      .join(ip, Seq("row"), "left")
      .agg(min(coalesce(col("__ip"), lit(0L).cast(dec)))
        .as("join_size_est"))
  }

  /** Point-query the sketch for every row of `queries`: attach
    * `cms_est` = min over hash rows of the addressed counters. One
    * broadcast left-join per hash row (the sketch is ≤ depth × width
    * rows by construction, each row-slice smaller still), then a single
    * `least` across the looked-up counters — no explode, no aggregation,
    * NO shuffle: the query side never moves, so estimating stays
    * scan-stage even when `queries` is itself corpus-sized. Row
    * multiplicity is preserved exactly (duplicate query rows each get
    * their own estimate — there is no groupBy to collapse them). Items
    * absent from every hash row estimate 0.
    */
  def estimate(sketch: DataFrame, queries: DataFrame, itemCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1, s"depth must be >= 1: $depth")
    val clash = queries.columns.filter(c => c == "cms_est" ||
      c.startsWith("__cms_"))
    require(clash.isEmpty, s"query columns clash with estimator: ${clash.toSeq}")
    // the sketch is sliced once per hash row — materialize it first so
    // the (possibly corpus-sized) build plan behind it runs ONCE, not
    // depth times; ≤ depth × width rows, so the checkpoint is trivial
    val sk = sketch.materialize()
    val looked = (0 until depth).foldLeft(queries) { (df, r) =>
      val slice = sk.where(col("row") === r)
        .select(col("bucket").as(s"__cms_b$r"), col("cnt").as(s"__cms_c$r"))
      df.withColumn(s"__cms_b$r", bucketFor(col(itemCol), r, width))
        .join(broadcast(slice), Seq(s"__cms_b$r"), "left")
    }
    val ests = (0 until depth).map(r => coalesce(col(s"__cms_c$r"), lit(0L)))
    looked
      .withColumn("cms_est",
        if (depth == 1) ests.head else least(ests: _*))
      .drop((0 until depth).flatMap(r =>
        Seq(s"__cms_b$r", s"__cms_c$r")): _*)
  }
}
