package graft.queries

import graft.GraftQuery

/** Training-data pipeline ops: dedup, similarity, text analysis. */
object TrainingData {
  def all: Seq[GraftQuery] = Seq.empty
}
