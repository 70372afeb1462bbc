package graft.queries

import graft.GraftQuery

/** CDC apply / decode query surface — filled by the ApplyEngine slice. */
object Cdc {
  def all: Seq[GraftQuery] = Seq.empty
}
