package graft.operators

import graft.Q

object CatalogOps {
  val queries: Seq[Q] = Seq()
}
