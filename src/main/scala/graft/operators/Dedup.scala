package graft.operators

import graft.Q

object Dedup {
  val queries: Seq[Q] = Seq()
}
