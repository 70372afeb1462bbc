package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training pipelines: assign documents to
  * fixed-token-budget training sequences. The rule is offset binning —
  * a doc belongs to bin `floor(start_offset / budget)` where
  * `start_offset` is the running token count of all earlier docs in
  * its group — so bin assignment is a pure window cumsum: integer
  * arithmetic, deterministic, identical in any engine, one shuffle on
  * the group key. (True first-fit packing is a prefix-dependent
  * recursion no engine can window-express; offset binning is the
  * streaming approximation production packers use — bins overflow by
  * at most one straddling doc.)
  *
  * At scale the group is a shard/source, so no window partition ever
  * sees more than one shard — the cumsum never becomes a global
  * bottleneck.
  */
object Packing {

  /** Adds `seq_id`: the training-sequence index of each doc within
    * its `groupCol`, by `orderCol` order, packing `tokens` per doc
    * into `budget`-token bins. */
  def assignSequences(df: DataFrame, groupCol: String, orderCol: String,
                      tokens: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tok", tokens)
      .withColumn("seq_id",
        floor((sum(col("__tok")).over(w) - col("__tok")) / lit(budget)))
      .drop("__tok")
  }

  /** Per-sequence stats: docs packed and total tokens — the shape a
    * downstream batcher consumes. */
  def packedStats(df: DataFrame, groupCol: String, orderCol: String,
                  tokens: Column, budget: Long): DataFrame =
    assignSequences(df, groupCol, orderCol, tokens, budget)
      .withColumn("__tok", tokens)
      .groupBy(col(groupCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"))
}
