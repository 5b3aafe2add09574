package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
import graft.functions.PolyHash.polyHash
import graft.text.TextAnalysis

/** Streaming faces for incremental corpus preparation — the natural next
  * step after the cross-batch exact-dedup stream (Dedup.exactDedupStream):
  * documents arrive continuously and chunk/pack output flows out without
  * re-running the batch job over the whole corpus.
  *
  * Chunking needs no face at all: `Chunking.chunk` is a stateless per-row
  * fan-out (select + explode), which Structured Streaming runs unchanged
  * on a readStream frame — pinned stream-vs-batch in CorpusStreamsSpec.
  * Packing is genuinely stateful (each assignment reads the running bin
  * fill), so it gets the `flatMapGroupsWithState` treatment here.
  */
object CorpusStreams {

  final case class PackInput(bucket: Int, doc_id: Long, n_tokens: Long)
  final case class PackedDoc(
      bucket: Int, doc_id: Long, n_tokens: Long, bin_idx: Int, bin_offset: Long)
  final case class PackCursor(bin: Int, cur: Long)

  /** Streaming greedy sequence packing — same bucket hash, capacity rule
    * and output shape as `Packing.greedyPack`, with the per-bucket
    * (bin, fill) cursor carried ACROSS micro-batches as group state
    * (state size: one cursor per bucket, O(nBuckets), unbounded by
    * corpus size — no watermark needed).
    *
    * Ordering contract, stated honestly: within a micro-batch each
    * bucket's documents pack in doc-id order (the batch operator's
    * order); across micro-batches they pack in ARRIVAL order — a
    * streaming packer cannot wait for smaller ids that may never come.
    * Output therefore equals the batch pack exactly when ids arrive
    * nondecreasing across batches (the append-only ingest case, pinned
    * in spec); under out-of-order arrival bins remain valid (never
    * overfilled) but bin numbering differs from the batch replay.
    * Per-invocation buffering is one bucket's slice of one micro-batch
    * (needed for the in-batch sort) — micro-batch-sized, not
    * corpus-sized.
    */
  def greedyPackStream(
      df: DataFrame, idCol: String, textCol: String,
      capacity: Long, nBuckets: Int, salt: String): Dataset[PackedDoc] = {
    require(capacity >= 1 && nBuckets >= 1)
    val idType = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"greedyPackStream needs an integral id column; '$idCol' is $idType")
    val spark = df.sparkSession
    import spark.implicits._
    val src = df.select(
      (polyHash(concat(col(idCol).cast("string"), lit(":" + salt))) % nBuckets)
        .cast("int").as("bucket"),
      col(idCol).cast("long").as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tokens")).as[PackInput]
    src.groupByKey(_.bucket)
      .flatMapGroupsWithState[PackCursor, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket, rows, state) =>
          var st = state.getOption.getOrElse(PackCursor(0, 0L))
          val out = rows.toSeq.sortBy(_.doc_id).map { r =>
            val (bin, off, cur) =
              if (st.cur + r.n_tokens > capacity && st.cur > 0)
                (st.bin + 1, 0L, r.n_tokens)
              else (st.bin, st.cur, st.cur + r.n_tokens)
            st = PackCursor(bin, cur)
            PackedDoc(bucket, r.doc_id, r.n_tokens, bin, off)
          }
          state.update(st)
          out.iterator
      }
  }

  final case class ResIn(group: String, id: Long, es_key: Double)
  final case class ResState(version: Long, top: List[(Double, Long)])
  final case class ResOut(
      group: String, version: Long, rank: Int, id: Long, es_key: Double)

  /** Streaming weighted reservoir (Efraimidis–Spirakis top-k by
    * u^(1/w), the same deterministic salted-hash keys as
    * `Sampling.weightedSample`) — per group, the k highest-key items
    * seen so far, carried across micro-batches as O(k) group state.
    * Because the keys are data-deterministic (no RNG state), the
    * reservoir after ANY arrival order equals the batch operator over
    * the same rows — the property the spec pins, and the reason this
    * face composes with replay/backfill (re-running the stream cannot
    * change the sample).
    *
    * Emits the full reservoir after every batch, stamped with a
    * monotonically increasing state version; readers take the max
    * version per group (Update-mode sinks see one row set per batch).
    */
  def weightedReservoirStream(
      df: DataFrame, groupCol: String, idCol: String, weightCol: String,
      k: Int, salt: String): Dataset[ResOut] = {
    require(k >= 1, s"reservoir needs k >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val mod = graft.functions.PolyHash.DefaultMod
    val u = (graft.functions.PolyHash.saltedHash(col(idCol), salt)
      .cast("double") + lit(0.5)) / lit(mod.toDouble)
    val src = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(groupCol).cast("string").as("group"),
        col(idCol).cast("long").as("id"),
        pow(u, lit(1.0) / col(weightCol).cast("double")).as("es_key"))
      .as[ResIn]
    src.groupByKey(_.group)
      .flatMapGroupsWithState[ResState, ResOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group, rows, state) =>
          val prev = state.getOption.getOrElse(ResState(0L, Nil))
          // merge batch into the O(k) reservoir: higher key wins,
          // ties break toward the smaller id (the batch tie rule)
          val merged = (prev.top ++ rows.map(r => (r.es_key, r.id)))
            .distinct // re-delivered ids carry identical keys: idempotent
            .sortBy { case (es, id) => (-es, id) }
            .take(k)
          val st = ResState(prev.version + 1, merged)
          state.update(st)
          merged.zipWithIndex.iterator.map { case ((es, id), i) =>
            ResOut(group, st.version, i + 1, id, es)
          }
      }
  }
}
