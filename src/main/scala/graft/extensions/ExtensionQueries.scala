package graft.extensions

import graft.Q

/** Large-scale training-data-pipeline operators (dedup, similarity
  * search, text analysis, multimodal) — assembled here; implementations
  * land module by module.
  */
object ExtensionQueries {
  val all: Seq[Q] = Seq.empty
}
