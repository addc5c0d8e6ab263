package graft.queries

import graft.QueryDef

/** Large-scale training-data pipeline operators (dedup, similarity
  * search, text analysis, multimodal) — filled incrementally.
  */
object LlmPipeline {
  val queries: Seq[QueryDef] = Seq()
}
