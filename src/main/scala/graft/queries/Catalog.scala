package graft.queries

/** All declared queries (SURVEY.md §2 inventory). Names are stable — the
  * driver's correctness gate keys on them. */
object Catalog {
  val all: Seq[QueryDef] = Relational.defs ++ EventsQ.defs ++ TextQ.defs ++ VectorQ.defs

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
