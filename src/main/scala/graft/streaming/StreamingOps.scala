package graft.streaming

import graft.Q

object StreamingOps {
  val queries: Seq[Q] = Seq()
}
