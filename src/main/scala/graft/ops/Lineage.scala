package graft.ops

import org.apache.spark.sql.DataFrame

/** Per-round lineage truncation for iterative operators
  * ([[Dedup.connectedComponents]], [[Dedup.connectedComponentsStar]]).
  * Without a cut, each round's plan nests the previous round's and
  * Catalyst re-analyzes a plan that grows linearly in iteration count.
  *
  * Two strategies, chosen by the caller's failure model:
  *
  *  - [[Lineage.Local]] (default): `localCheckpoint` — blocks live in
  *    executor memory/disk, zero extra I/O. Fast, but NOT
  *    fault-tolerant: truncated lineage cannot be recomputed, so a
  *    lost executor kills the job. The right choice on a dedicated
  *    cluster or in local mode.
  *  - [[Lineage.Reliable]]: parquet round-trip through a caller-owned
  *    scratch directory on reliable storage (HDFS / object store).
  *    Each round's state is re-rooted at a file scan, so executor —
  *    and even whole-stage — loss replays from storage instead of
  *    failing. The right choice on preemptible/spot clusters running
  *    the 100 TB dedup graphs these loops exist for. Costs one
  *    write+read of the (edge-sized, ≪ corpus) state per round.
  *
  * The scratch dir accumulates one `state_N` subdir per cut; the
  * caller owns its lifecycle (delete after the job — states are only
  * needed while a round that reads them can still be replayed).
  */
object Lineage {
  sealed trait Strategy
  /** Executor-memory lineage cut — fast, not fault-tolerant. */
  case object Local extends Strategy
  /** Parquet round-trip through `dir` — survives executor loss. */
  final case class Reliable(dir: String) extends Strategy

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** Truncate `df`'s lineage per `strategy`. Local cuts are lazy
    * (materialize on first use); Reliable cuts materialize now (the
    * write is the checkpoint). */
  def cut(df: DataFrame, strategy: Strategy): DataFrame = strategy match {
    case Local => df.localCheckpoint(eager = false)
    case Reliable(dir) =>
      val path = s"$dir/state_${seq.incrementAndGet()}"
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
  }
}
