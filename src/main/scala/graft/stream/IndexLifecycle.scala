package graft.stream

import org.apache.hadoop.fs.{FileSystem, Path}

/** The shared mechanics of every batch-keyed persisted-index family
  * (the minhash band index and the winnowing fingerprint index today;
  * any future family tomorrow): one `batch=K` directory per committed
  * micro-batch, folded by a compactor that stages the merged rows to
  * `.compact_staging_<target>`, swaps the staging in, and recovers by
  * ROLLING FORWARD after a crash. Extracting the primitives here
  * keeps a fourth index family from quietly diverging on the parts
  * that must agree for recovery to be sound:
  *
  *  - the staging prefix (recovery must recognize every family's
  *    staging dirs the same way);
  *  - the batch-key listing (committed-only compaction windows);
  *  - the delete-target-then-rename swap (the order that makes the
  *    staging the single source of truth the moment anything is
  *    deleted).
  *
  * What stays PER-FAMILY is the merge semantics and therefore the
  * recovery protocol: ROW-SET indexes (band, winnow) tolerate
  * transient duplicates — components are edge-duplication-invariant
  *  and the winnow probe dedupes matched rows — so their recovery may
  * leave stale sources for the next `distinct()` to heal; ADDITIVE
  * registers ([[DocIngest.compactSketch]]) would double-count, so
  * their staging carries a source manifest and recovery deletes
  * exactly the listed dirs. A new family must pick one of those two
  * contracts explicitly.
  */
private[graft] object IndexLifecycle {

  /** Shared by every compactor so recovery passes recognize each
    * other's staging dirs. */
  val stagingPrefix = ".compact_staging_"

  def batchPath(root: Path, k: Long): Path = new Path(root, s"batch=$k")

  /** The committed batch keys in `[fromBatch, upToBatch]`, sorted —
    * the compaction window. */
  def listBatchKeys(fs: FileSystem, root: Path,
      fromBatch: Long, upToBatch: Long): Seq[Long] =
    fs.listStatus(root).map(_.getPath.getName).toSeq
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
      .filter(k => k >= fromBatch && k <= upToBatch).sorted

  /** The staging dirs of `root`, oldest first. */
  def stagingDirs(fs: FileSystem, root: Path)
      : Seq[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(root).toSeq
      .filter(_.getPath.getName.startsWith(stagingPrefix))

  /** Swap a fully-written staging dir in over its target: delete the
    * target FIRST (from that moment the staging holds the only copy
    * and recovery must roll forward — the order every family must
    * share), then any other merged sources (`alsoDelete` — the
    * row-set contract deletes them here, pre-rename; the additive
    * contract passes Nil and deletes via its manifest after), then
    * rename. `what` names the calling compactor in the failure
    * message. */
  def swapIn(fs: FileSystem, root: Path, staging: Path,
      targetName: String, what: String,
      alsoDelete: Seq[Path] = Nil): Unit = {
    fs.delete(new Path(root, targetName), true)
    alsoDelete.foreach(fs.delete(_, true))
    if (!fs.rename(staging, new Path(root, targetName)))
      throw new IllegalStateException(
        s"$what: failed to swap in $targetName")
  }

  /** ROW-SET recovery (band/winnow contract): finish a crashed swap's
    * rename when the target is missing; otherwise the staged write
    * never finished and the sources are intact, so drop the staging.
    * Stale source dirs merely duplicate rows — admission-invariant,
    * healed by the next compaction's `distinct()`. */
  def recoverRowSetDir(fs: FileSystem, root: Path, what: String): Unit =
    stagingDirs(fs, root).foreach { st =>
      val target = new Path(root,
        st.getPath.getName.stripPrefix(stagingPrefix))
      if (!fs.exists(target)) {
        if (!fs.rename(st.getPath, target)) throw new IllegalStateException(
          s"$what: recovery rename to $target failed")
      } else fs.delete(st.getPath, true)
    }
}
