package graft.queries

import graft.GraftQuery

/** Catalog / maintenance query surface (SURVEY §2.4 J3–J6, §2.5 G2). */
object Catalog {
  def all: Seq[GraftQuery] = Seq.empty
}
