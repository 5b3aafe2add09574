package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — record linkage's fuzzy-match
  * kernel: all pairs within Levenshtein distance `maxDist`, without
  * the all-pairs cross product. Two strings within distance d differ
  * in length by at most d, so bucketing by length band
  * (width d+1) and probing only adjacent bands is a LOSSLESS blocking:
  * every qualifying pair shares or neighbors a band. One side explodes
  * to its three candidate bands, the other stays put, and the join is
  * a plain shuffled equi-join on the band id with the exact
  * `levenshtein` (codegen'd built-in) as residual filter — the
  * RangeJoin discipline applied to string similarity.
  *
  * Each unordered pair emerges exactly once: the probe side covers the
  * partner's unique home band, and `id_a < id_b` keeps one direction.
  *
  * Scale honesty: length blocking alone leaves same-band quadratic
  * work, which is fine when bands are balanced (trimmed prefixes,
  * titles, codes) and wrong for a corpus where one length dominates —
  * compose with a content prefilter (n-gram LSH from [[graft.dedup
  * .Dedup]]) before the residual in that regime.
  */
object FuzzyJoin {

  /** All (id_a, id_b, dist) with `dist = levenshtein ≤ maxDist`,
    * `id_a < id_b`, over non-null strings of `strCol`. Band width is
    * `maxDist + 1`; `maxDist = 0` degrades to an exact-match
    * self-join (still banded, never cross).
    */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val w = maxDist + 1
    val base = df
      .where(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"),
        graft.operators.RangeJoin.floorDiv(
          length(col(strCol)).cast("long"), w.toLong).as("__band"))
    val probe = base.select(col("__id").as("id_a"), col("__s").as("s_a"),
      explode(array((-1 to 1).map(o => col("__band") + lit(o)): _*))
        .as("__band"))
    val home = base.select(col("__id").as("id_b"), col("__s").as("s_b"),
      col("__band"))
    // threshold form, computed ONCE into a column: O(d·len) per pair
    // and shared by filter and output, vs two full O(len²) DPs
    val d = levenshtein(col("s_a"), col("s_b"), maxDist)
    probe.join(home, Seq("__band"))
      .where(col("id_a") < col("id_b"))
      .where(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist", d)
      .where(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** [[editDistancePairs]] with PassJoin segment blocking layered on
    * the length filter — for the regime where one length DOMINATES
    * and length bands alone degrade to the quadratic within-band
    * verify (fixed-width prefixes, codes, normalized titles).
    *
    * The pigeonhole theorem (PassJoin, public literature): split a
    * into d+1 segments; any b within edit distance d contains at
    * least ONE segment verbatim, at a position shifted by at most d.
    * So the A side emits its d+1 segments keyed by
    * (length, segment#, text), the B side emits every substring that
    * could BE such a segment for partner lengths within ±d (a
    * (2d+1)²(d+1)-way data-independent fan-out of id-plus-short-string
    * rows), and candidates fall out of a shuffled equi-join on the
    * segment key — then the exact threshold-Levenshtein verifies.
    * Segments of length 0 (strings shorter than d+1) keep the theorem
    * trivially true: an empty key matches broadly and verification
    * stays exact, it just prunes less on those few rows.
    *
    * Each unordered pair can surface from either side's segmentation
    * and several segments — candidates normalize to (min id, max id)
    * and dedup BEFORE the verify, so Levenshtein runs once per pair.
    */
  def editDistancePairsSegmented(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val k = maxDist + 1
    val base0 = df
      .where(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"),
        length(col(strCol)).as("__len"))
    // the (2d+1)²(d+1)-arm probe explode multiplies whatever
    // parallelism the scan delivers: a small input arrives as ONE
    // parquet split and the fan-out + segment join then run
    // near-single-threaded. Spread ONLY when (a) the input plan is
    // scan-shaped — a plan containing a shuffle-introducing node
    // already has shuffle-width parallelism, AND probing `.rdd` on it
    // would EXECUTE those upstream stages once for the probe and again
    // for the real job (AQE finalizes stages on rdd access) — and
    // (b) the scan is narrower than the session's shuffle width. A
    // wide (100 TB) input passes neither test and never pays a
    // corpus-sized reshuffle; on a scan-only plan `.rdd` just lists
    // files, no job runs.
    import org.apache.spark.sql.catalyst.plans.logical._
    val hasShuffle = base0.queryExecution.analyzed.collectFirst {
      case p @ (_: Join | _: Aggregate | _: Window | _: Sort |
                _: Distinct | _: RepartitionOperation) => p
    }.nonEmpty
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val base =
      if (!hasShuffle && base0.rdd.getNumPartitions < n) base0.repartition(n)
      else base0
    // scheme of a length-L string: segment i has
    //   len_i = L div k + (1 if i < L mod k)  and
    //   start_i = 1 + i*(L div k) + min(i, L mod k)
    def floorDivK(l: org.apache.spark.sql.Column) =
      graft.operators.RangeJoin.floorDiv(l.cast("long"), k.toLong)
    def segLen(l: org.apache.spark.sql.Column, i: Int) =
      floorDivK(l) + when(lit(i) < l % k, 1L).otherwise(0L)
    def segStart(l: org.apache.spark.sql.Column, i: Int) =
      lit(1L) + lit(i.toLong) * floorDivK(l) + least(lit(i.toLong), (l % k).cast("long"))
    // both fan-outs are explodes of per-row struct arrays — ONE scan
    // each, not a union of (2d+1)²(d+1) re-scans of the source
    val segArms = (0 until k).map { i =>
      struct(col("__len").cast("long").as("la"), lit(i).as("i"),
        col("__s").substr(segStart(col("__len"), i).cast("int"),
          segLen(col("__len"), i).cast("int")).as("seg"))
    }
    val segs = base
      .select(col("__id").as("id_a"), col("__s").as("s_a"),
        explode(array(segArms: _*)).as("__e"))
      .select(col("id_a"), col("s_a"), col("__e.la").as("la"),
        col("__e.i").as("i"), col("__e.seg").as("seg"))
    // the (2d+1)²(d+1) probe arms ride a BROADCAST DIM, not a literal
    // struct array: unrolling 75 substr CASEs into one explode blew
    // whole-stage codegen past the 64 KB method cap (Janino
    // InternalCompilerException → silent interpreted fallback, the one
    // such fallback in the round-8 verify log). A 75-row cross join
    // produces the identical fan-out with ONE parameterized substr in
    // the generated code, so the stage stays codegen'd.
    val probeDim = {
      import df.sparkSession.implicits._
      (for {
        i <- 0 until k
        dl <- -maxDist to maxDist
        o <- -maxDist to maxDist
      } yield (i, dl.toLong, o.toLong)).toDF("__i", "__dl", "__o")
    }
    def segLenC(l: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      floorDivK(l) + when(i.cast("long") < l % k, 1L).otherwise(0L)
    def segStartC(l: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      lit(1L) + i.cast("long") * floorDivK(l) +
        least(i.cast("long"), (l % k).cast("long"))
    val probes = {
      val la = (col("__len") + col("__dl")).cast("long") // partner length
      base.crossJoin(broadcast(probeDim))
        .select(col("__id").as("id_b"), col("__s").as("s_b"),
          la.as("la"), col("__i").as("i"),
          // starts below 1 are invalid shifts, not from-the-end reads;
          // la < 1 serves no string — both emit a null seg, filtered here
          when(la >= 1L && segStartC(la, col("__i")) + col("__o") >= 1L,
            col("__s").substr(
              (segStartC(la, col("__i")) + col("__o")).cast("int"),
              segLenC(la, col("__i")).cast("int"))).as("seg"))
        .where(col("seg").isNotNull)
    }
    val cand = segs.join(probes, Seq("la", "i", "seg"))
      .where(col("id_a") =!= col("id_b"))
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        when(col("id_a") < col("id_b"), col("s_a")).otherwise(col("s_b"))
          .as("s_a"),
        when(col("id_a") < col("id_b"), col("s_b")).otherwise(col("s_a"))
          .as("s_b"))
      .distinct()
    val d = levenshtein(col("s_a"), col("s_b"), maxDist)
    cand
      .where(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .where(d >= 0)
      .select(col("id_a"), col("id_b"), d.as("dist"))
  }
}
