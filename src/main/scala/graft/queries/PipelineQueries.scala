package graft.queries

/** Training-data pipeline operators (dedup, similarity search, text
  * analysis, multimodal plumbing) over documents/embeddings. Filled in
  * incrementally; see graft.text / graft.dedup / graft.sim.
  */
object PipelineQueries {
  val all: Seq[Q] = Seq()
}
