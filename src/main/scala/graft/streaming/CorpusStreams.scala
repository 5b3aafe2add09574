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
}
