package graft.queries

import graft.QueryDef

/** SURVEY.md §2B–2G MIINT domain surface queries (filled incrementally). */
object LayerB {
  val queries: Seq[QueryDef] = Seq()
}
