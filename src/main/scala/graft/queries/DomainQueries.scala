package graft.queries

/** March-mania domain operator coverage (SURVEY.md §2.13) over a games
  * table derived deterministically from the synthetic data. Filled in
  * incrementally; see graft.marchmania for the operator implementations.
  */
object DomainQueries {
  val all: Seq[Q] = Seq()
}
