package graft.stream

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming training-data ingest: the document-side composition of
  * the ops library under Structured Streaming — a quality floor
  * (narrow column expressions), exact content dedup bounded by a
  * watermark (state evicts, so memory is O(docs per watermark
  * window), never O(corpus)), and a windowed throughput aggregate
  * for pipeline health.
  *
  * At 100 TB/day this is the shape that holds: every stage is either
  * a narrow map or keyed streaming state with eviction; nothing
  * accumulates unbounded.
  */
object DocIngest {

  /** Quality-filter + dedup a document stream: drop docs under
    * `minTokens`, then drop re-deliveries of identical content
    * (md5 fingerprint) within `watermark`. Adds `n_tokens` and `fp`
    * columns to the survivors. */
  def clean(docs: DataFrame, tsCol: String, textCol: String,
            minTokens: Int = 3, watermark: String = "1 minute"): DataFrame = {
    Seq("n_tokens", "fp").foreach { c =>
      require(!docs.columns.contains(c),
        s"input already has a $c column (reserved name)")
    }
    docs
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .filter(col("n_tokens") >= minTokens)
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
  }

  /** Tumbling-window ingest health over a [[clean]]ed stream: docs
    * and tokens admitted per window. */
  def throughput(cleaned: DataFrame, tsCol: String,
                 windowLength: String = "30 seconds"): DataFrame =
    cleaned
      .groupBy(window(col(tsCol), windowLength))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .select(col("window.start").as("window_start"),
        col("n_docs"), col("n_tokens"))

  /** One batch of cross-corpus near-dup admission: probe `index`
    * (None for the first batch) and return (survivors, their
    * band-index rows to append).
    *
    * Semantics: transitive components — the same clustering
    * discipline as [[graft.ops.Dedup.dedupCorpus]]. Over the batch's
    * verified pair graph (new×index and new×new edges), a new doc is
    * admitted iff its component contains NO already-admitted doc and
    * it is the component's lowest new id. Conservative by design: a
    * doc linked to the corpus only through a rejected doc is still
    * rejected (its content is represented by the component's keeper),
    * matching how connected-component dedup treats chains.
    *
    * The returned survivors frame is localCheckpoint'd: the caller
    * writes it AND derives index rows from it, and without the
    * checkpoint both actions would re-run the whole admission
    * pipeline.
    */
  def admitBatch(batch: DataFrame, index: Option[DataFrame],
      idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 16, threshold: Double = 0.8)
      : (DataFrame, DataFrame) = {
    val pairs = index match {
      case Some(ix) => Dedup.incrementalNearDuplicates(
        batch, ix, idCol, textCol, numHashes, bands, threshold)
      case None => Dedup.minhashNearDuplicates(
        batch, idCol, textCol, numHashes, bands, threshold)
    }
    val survivors = survivorsByPairs(batch, pairs, idCol)
    (survivors,
      Dedup.minhashBandIndex(survivors, idCol, textCol, numHashes, bands))
  }

  /** [[admitBatch]]'s span-match sibling: one batch of cross-corpus
    * WINNOWING admission — probe the persisted fingerprint index
    * (None for the first batch) with
    * [[graft.ops.Winnowing.incrementalWinnowPairs]] and return
    * (survivors, their [[graft.ops.Winnowing.winnowIndex]] rows to
    * append). Same transitive-component admission semantics as
    * [[admitBatch]] (shared core), different duplication signal: a
    * doc is rejected when it SHARES A SPAN (≥ minShared rare
    * fingerprints, guaranteed for any common run of w+k−1 tokens)
    * with the corpus or a kept batch-mate — the boilerplate/
    * quote-reuse admission gate, where minhash's whole-document
    * Jaccard would admit a doc that embeds a long verbatim excerpt
    * inside enough fresh text. */
  def admitBatchWinnow(batch: DataFrame, index: Option[DataFrame],
      idCol: String, textCol: String,
      k: Int = 4, w: Int = 4, minShared: Long = 3, maxDf: Int = 64,
      validateParams: Boolean = true)
      : (DataFrame, DataFrame) = {
    import graft.ops.Winnowing
    val pairs = index match {
      case Some(ix) => Winnowing.incrementalWinnowPairs(
        batch, ix, idCol, textCol, k, w, minShared, maxDf,
        validateParams)
      case None => Winnowing.winnowingPairs(
        batch, idCol, textCol, k, w, minShared, maxDf)
    }
    val survivors = survivorsByPairs(batch, pairs, idCol)
    (survivors, Winnowing.winnowIndex(survivors, idCol, textCol, k, w))
  }

  /** The admission core shared by [[admitBatch]] and
    * [[admitBatchWinnow]]: transitive components over the batch's
    * verified pair graph (new×index and new×new edges); a new doc is
    * admitted iff its component contains NO already-admitted doc and
    * it is the component's lowest new id. The survivors frame is
    * localCheckpoint'd: callers write it AND derive index rows from
    * it. */
  private def survivorsByPairs(batch: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    // components over the (tiny) pair graph; members only
    val members = Dedup.connectedComponents(pairs)
      .localCheckpoint(eager = false) // feeds three subtrees below
    val newIds = batch.select(col(idCol).as("__nid")).distinct()
    val newMembers =
      members.join(newIds, members("id") === newIds("__nid"), "left_semi")
    // components tainted by an already-admitted (non-batch) member
    val tainted =
      members.join(newIds, members("id") === newIds("__nid"), "left_anti")
        .select(col("comp")).distinct()
    val keepers = newMembers
      .join(tainted, Seq("comp"), "left_anti")
      .groupBy(col("comp")).agg(min(col("id")).as("id"))
      .select(col("id"))
    val removed = newMembers.select(col("id"))
      .join(keepers, Seq("id"), "left_anti")
      .select(col("id").as(idCol))
    batch.join(removed, Seq(idCol), "left_anti")
      .localCheckpoint(eager = false)
  }

  /** Streaming sketch maintenance — the proof of the sketch layer's
    * "runnable unchanged as a bounded-state streaming aggregation"
    * contract: each micro-batch's log-histogram registers
    * ([[graft.ops.Sketches.logHistogram]] of `measure`, grouped by
    * `groupCols`) land in a batch-keyed directory (overwrite →
    * replay-idempotent, the [[nearDupIngest]] discipline), and the
    * corpus-lifetime sketch is merge-on-read: counts ADD, so reading
    * is one bounded aggregation over ≤ batches·groups·buckets rows —
    * the corpus itself is long gone. Quantile readout via
    * [[graft.ops.Sketches.logHistQuantiles]] on [[mergedSketch]] is
    * IDENTICAL to the batch path on the concatenated corpus (the
    * merge is the same monoid Spark runs map-side; spec-pinned).
    */
  def sketchStream(docs: DataFrame, measure: org.apache.spark.sql.Column,
      groupCols: Seq[String], sketchDir: String, checkpointDir: String,
      subBits: Int = 6,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : StreamingQuery = {
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.Sketches.logHistogram(batch, groupCols, measure, subBits)
          .write.mode("overwrite").parquet(s"$sketchDir/batch=$batchId")
        ()
      }
      .start()
  }

  /** The corpus-lifetime sketch from a [[sketchStream]] directory:
    * merge-on-read over the batch-keyed register dirs (counts add).
    * Runs [[compactSketch]]'s crash recovery first — a compaction
    * that died between its rename and its source deletions would
    * otherwise leave the merged counts ALSO present in the stale
    * source dirs, silently doubling them in the sum. */
  def mergedSketch(spark: org.apache.spark.sql.SparkSession,
      sketchDir: String, groupCols: Seq[String],
      stagingGraceMs: Long = 60000L): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(sketchDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) recoverSketchDir(fs, root, stagingGraceMs)
    spark.read.parquet(sketchDir).drop("batch")
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum(col("count")).as("count"))
  }

  // the shared staging prefix: every compactor's recovery pass must
  // recognize every family's staging dirs the same way
  private val sketchStagingPrefix = IndexLifecycle.stagingPrefix
  private val sketchManifestName = "_merged_dirs.txt"

  /** [[compactSketch]]'s roll-forward recovery, shared with
    * [[mergedSketch]]: finish a crashed swap's rename if its target
    * is missing, then finish the manifest's source deletions. A
    * manifest is only trusted when its END terminator survived the
    * write — a truncated "batch=12" read as "batch=1" must never
    * delete the wrong directory.
    *
    * `stagingGraceMs` makes recovery safe on READ paths that may race
    * a LIVE compaction ([[mergedSketch]],
    * [[graft.stream.EventStreams.monitorCounts]]): a staging dir
    * younger than the grace is left untouched — it is either an
    * in-flight write (deleting it would nuke the compactor's output
    * out from under it) or a crash so fresh the next recovery pass
    * will heal it. Compaction's own call passes 0 — its contract
    * already forbids a concurrent writer on the same directory. The
    * manifest-driven source deletions below carry no such risk (a
    * manifest is written only after the staged data is complete) and
    * always run. */
  private def recoverSketchDir(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      stagingGraceMs: Long = 0L): Unit = {
    import org.apache.hadoop.fs.Path
    def readManifest(dir: Path): Option[Seq[String]] = {
      val mf = new Path(dir, sketchManifestName)
      if (!fs.exists(mf)) None
      else {
        val in = fs.open(mf)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().toList.filter(_.nonEmpty)
          finally in.close()
        if (lines.lastOption.contains("END")) Some(lines.init) else None
      }
    }
    IndexLifecycle.stagingDirs(fs, root)
      .filter(st =>
        System.currentTimeMillis() - st.getModificationTime >= stagingGraceMs)
      .foreach { st =>
        val targetName = st.getPath.getName.stripPrefix(sketchStagingPrefix)
        val target = new Path(root, targetName)
        if (!fs.exists(target)) {
          // the target is only ever deleted AFTER the manifest write
          // completed, so a missing target implies a trusted manifest
          if (readManifest(st.getPath).isEmpty) throw new IllegalStateException(
            s"compactSketch: staging for $targetName has no valid manifest " +
              "but its target is gone — refusing to guess")
          if (!fs.rename(st.getPath, target)) throw new IllegalStateException(
            s"compactSketch: recovery rename to $target failed")
        } else fs.delete(st.getPath, true) // write never finished; sources intact
      }
    fs.listStatus(root).filter(_.getPath.getName.startsWith("batch="))
      .foreach { d =>
        readManifest(d.getPath).foreach { merged =>
          merged.filterNot(_ == d.getPath.getName)
            .foreach(n => fs.delete(new Path(root, n), true))
          fs.delete(new Path(d.getPath, sketchManifestName), false)
        }
      }
  }

  /** Compact a [[sketchStream]] register directory: merge the
    * batch-keyed dirs for batches ≤ `upToBatch` into the lowest one,
    * ADDING counts (every non-`count` column is a key). This is NOT
    * [[compactIndex]]: register rows are additive state, so the
    * row-set heal (`distinct()`) that makes the band index crash-
    * tolerant would corrupt counts here — instead the staging dir
    * carries a `_merged_dirs.txt` manifest of its source dirs, and
    * recovery ROLLS FORWARD by completing the rename and then
    * deleting exactly the listed sources, so merged counts are never
    * double-represented. (Files starting with `_` are hidden from
    * Spark's parquet reader, so the manifest rides inside the data
    * dir safely.) Like every compaction here: a maintenance-window
    * op — run with the stream stopped or ≥ 1 batch ahead; concurrent
    * readers mid-swap can observe a partial merge.
    *
    * No windowed form is needed here (unlike [[compactIndex]]'s
    * in-loop window): registers are FIXED-STATE sketches — each dir
    * is ≤ groups·buckets rows regardless of corpus size, so even a
    * full merge is bounded by batches·groups·buckets, never by data
    * volume.
    *
    * `retain = Some((keyCol, n))` is the RETENTION form for registers
    * whose key advances with wall-clock (the
    * [[graft.stream.EventStreams.rateMonitor]] period registers —
    * bounded per unit time but monotonically growing forever without
    * it): after merging, only rows with `keyCol >= max(keyCol) − n + 1`
    * (max over the MERGED dirs) survive, so compacted state is
    * bounded by the analysis window, not by uptime — the TableStore
    * vacuum discipline applied to monitor registers. With retention a
    * single eligible dir is still rewritten (the trim is the point);
    * dropped periods are gone from the compacted dir, so pick `n` at
    * or above the widest analysis window any view will ask for.
    *
    * Returns the number of directories merged (0 = nothing to do).
    */
  def compactSketch(spark: org.apache.spark.sql.SparkSession,
      sketchDir: String, upToBatch: Long,
      retain: Option[(String, Long)] = None,
      recoveryGraceMs: Long = 0L): Int = {
    import org.apache.hadoop.fs.Path
    val root = new Path(sketchDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val manifestName = sketchManifestName
    recoverSketchDir(fs, root, recoveryGraceMs)
    val ks = IndexLifecycle.listBatchKeys(fs, root, Long.MinValue, upToBatch)
    if (ks.length < (if (retain.isDefined) 1 else 2)) return 0
    val sources = ks.map(IndexLifecycle.batchPath(root, _))
    val targetName = s"batch=${ks.head}"
    val staging = new Path(root, s"$sketchStagingPrefix$targetName")
    fs.delete(staging, true)
    val df = spark.read.parquet(sources.map(_.toString).toSeq: _*)
    val keys = df.columns.filterNot(_ == "count").toSeq
    val merged = df.groupBy(keys.map(col): _*)
      .agg(sum(col("count")).as("count"))
    val retained = retain match {
      case Some((keyCol, n)) =>
        require(n > 0, "retain window must be positive")
        // cutoff from the merged data itself (no wall clock in the
        // loop — deterministic, replay-stable): keep the last n key
        // values of what these dirs carry. The 1-row agg collect is
        // bounded control-plane, not a global window over the rows.
        val row = merged.agg((max(col(keyCol)) - lit(n - 1)).as("c"))
          .collect().head
        if (row.isNullAt(0)) merged
        else merged.filter(col(keyCol) >= lit(row.get(0)))
      case None => merged
    }
    retained
      .coalesce(1)
      .write.mode("overwrite").parquet(staging.toString)
    val out = fs.create(new Path(staging, manifestName), true)
    try out.write((ks.map(k => s"batch=$k") :+ "END")
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // target first (staging then holds the only copy → roll forward),
    // rename, then the manifest-driven deletion of the other sources
    // (additive contract: sources go AFTER the rename, via the
    // manifest, never inside the swap)
    IndexLifecycle.swapIn(fs, root, staging, targetName, "compactSketch")
    ks.tail.foreach(k => fs.delete(IndexLifecycle.batchPath(root, k), true))
    fs.delete(new Path(root, targetName + "/" + manifestName), false)
    ks.length
  }

  /** Compact the [[nearDupIngest]] band index: merge the batch-keyed
    * directories `batch=K` for `fromBatch` ≤ K ≤ `upToBatch` into the
    * LOWEST such directory (the default `fromBatch = 0` folds
    * everything committed — the offline maintenance form; the in-loop
    * caller passes a trailing window so compaction cost stays ∝ the
    * window, not the index) — without this the index accumulates one small
    * directory per micro-batch forever (the same small-file decay the
    * persisted IVF index's append lifecycle compacts away). Probe
    * correctness is preserved because [[nearDupIngest]]'s replay
    * filter only excludes the CURRENT batch id: once K is
    * checkpoint-committed it can never replay, so its rows may live
    * under any other committed batch id. Callers must therefore pass
    * an `upToBatch` strictly below the oldest batch that could still
    * replay (i.e. only checkpoint-committed batches, with the stream
    * stopped or at least one batch ahead).
    *
    * Crash safety is roll-forward: rows are staged to
    * `.compact_staging_<target>`, then the target dir is deleted
    * FIRST, the other source dirs after, and the staging renamed in
    * last — so at every crash point either the sources are intact
    * (staging discarded on recovery) or the staging holds every row
    * (recovery completes the rename; stale source dirs merely
    * duplicate rows, which is admission-invariant — duplicate band
    * rows make duplicate candidate edges, and connected components
    * are unchanged by edge duplication — and the next compaction's
    * `distinct()` heals the layout). Recovery runs automatically at
    * the start of every call.
    *
    * Returns the number of directories merged (0 = nothing to do).
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, upToBatch: Long,
      targetFileBytes: Long = 128L << 20,
      fromBatch: Long = 0L,
      sortCol: Option[String] = None): Int = {
    import org.apache.hadoop.fs.Path
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val root = new Path(indexDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    // roll-forward recovery from a previous crash (row-set contract)
    IndexLifecycle.recoverRowSetDir(fs, root, "compactIndex")
    val ks = IndexLifecycle.listBatchKeys(fs, root, fromBatch, upToBatch)
    if (ks.length < 2) return 0
    val sources = ks.map(IndexLifecycle.batchPath(root, _))
    val targetName = s"batch=${ks.head}"
    val staging = new Path(root,
      s"${IndexLifecycle.stagingPrefix}$targetName")
    fs.delete(staging, true)
    val bytes = sources.map(fs.getContentSummary(_).getLength).sum
    val nFiles = math.max(1L,
      (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    // distinct() both merges and HEALS duplicates a past crash left
    val healed = spark.read.parquet(sources.map(_.toString).toSeq: _*)
      .distinct()
    // sortCol (the winnow index's h): preserve the range-clustered
    // sorted layout through compaction so row-group stats stay tight
    // — random repartition would scatter every file across the full
    // hash domain and undo the pruned-probe story
    val arranged = sortCol match {
      case Some(c) => healed.repartitionByRange(nFiles, col(c))
        .sortWithinPartitions(col(c))
      case None => healed.repartition(nFiles)
    }
    arranged.write.mode("overwrite").parquet(staging.toString)
    // target deleted FIRST inside swapIn: once anything is deleted,
    // the staging (which holds every row) is the recovery source of
    // truth; the other sources follow pre-rename (row-set contract)
    IndexLifecycle.swapIn(fs, root, staging, targetName, "compactIndex",
      alsoDelete = sources.tail)
    ks.length
  }

  /** Per-batch distribution drift gate: each micro-batch's `bucket`
    * distribution (language, source, length band, …) is compared to a
    * frozen reference histogram by total-variation distance
    * ([[graft.ops.Profiling.driftTvdCounts]] — integer ppm, so the
    * gate value is deterministic under replay), and a metrics row
    * `(batch, n_docs, tvd_ppm)` is appended per batch. In `strict`
    * mode a batch over `maxTvdPpm` throws
    * [[graft.ddl.KillSwitchException]] AFTER its metrics row lands —
    * the violation is recorded, then the stream dies (the fail-fast
    * discipline of the CDC engine's strict mode, applied to corpus
    * composition: a crawler bug that flips the language mix should
    * stop ingest, not poison the corpus).
    *
    * Metrics go to batch-keyed directories with overwrite, so a
    * replayed batch rewrites its own row idempotently (rows carry
    * their batch id — row-set semantics, so [[compactIndex]] applies
    * unchanged if the one-dir-per-batch listing ever matters; the
    * additive-state [[compactSketch]] is NOT needed here). Empty batches
    * are recorded with a NULL tvd (no distribution to compare) and
    * never trip the gate. `reference` must be a non-empty
    * `(bucket, n_ref)` histogram — freeze it from a trusted corpus
    * version with a count-by-bucket aggregate.
    *
    * Scale shape: the per-batch cost is one map-side count-by-bucket
    * over the batch plus a |buckets|-row join against the broadcast
    * reference; nothing scales with corpus size.
    */
  def driftGate(docs: DataFrame, bucket: org.apache.spark.sql.Column,
      reference: DataFrame, metricsDir: String, checkpointDir: String,
      maxTvdPpm: Long, strict: Boolean = false,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : StreamingQuery = {
    require(reference.columns.toSeq == Seq("bucket", "n_ref"),
      s"reference must have columns (bucket, n_ref), got " +
        reference.columns.mkString(", "))
    val refCounts = reference.withColumnRenamed("n_ref", "n_a")
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val batchCounts = batch.select(bucket.as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n_b"))
          .localCheckpoint(eager = false) // feeds the total AND the TVD
        // bounded control-plane collect: |buckets| rows, never docs
        val nDocs = batchCounts.agg(coalesce(sum(col("n_b")), lit(0L)))
          .head().getLong(0)
        val tvd: Option[Long] =
          if (nDocs == 0L) None
          else Some(graft.ops.Profiling
            .driftTvdCounts(refCounts, batchCounts)
            .select(col("tvd_ppm")).head().getLong(0))
        Seq((batchId, nDocs, tvd))
          .toDF("batch", "n_docs", "tvd_ppm")
          .write.mode("overwrite").parquet(s"$metricsDir/batch=$batchId")
        if (strict && tvd.exists(_ > maxTvdPpm))
          throw new graft.ddl.KillSwitchException(
            s"drift gate: batch $batchId tvd_ppm=${tvd.get} > $maxTvdPpm")
        ()
      }
      .start()
  }

  /** Streaming cross-batch near-dup ingest: every micro-batch is
    * [[admitBatch]]ed against the persisted band index, survivors land
    * in `outDir`, and their index rows are appended — corpus growth
    * with near-dup admission at O(batch + collisions) per batch.
    *
    * Both writes go to batch-keyed subdirectories with overwrite, so
    * a replayed batch (crash between write and checkpoint commit)
    * rewrites its own directories idempotently — the [[TableStore]]
    * versioning discipline applied to the index/output pair.
    */
  def nearDupIngest(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, outDir: String, checkpointDir: String,
      numHashes: Int = 32, bands: Int = 16, threshold: Double = 0.8,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      compactEvery: Option[Int] = None)
      : StreamingQuery = {
    compactEvery.foreach(n => require(n >= 2,
      s"compactEvery=$n: compacting every batch just rewrites the index"))
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // hadoop FS, not java.io.File: indexDir may be hdfs://, s3a://…
        // — a local-only probe would silently skip the index forever
        val idxPath = new org.apache.hadoop.fs.Path(indexDir)
        val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // a compaction crash leaves index rows visible ONLY in the
        // (reader-hidden) staging dir — roll forward BEFORE probing,
        // or a replayed batch would admit near-dups of every doc whose
        // rows were mid-swap. compactIndex with an empty range is
        // exactly the recovery pass (merges nothing). Unconditional,
        // not gated on compactEvery: an OFFLINE compactIndex
        // maintenance run can crash too, and a stream restarted
        // without compactEvery must still heal it — the pass is one
        // directory listing when no staging dir exists.
        if (fs.exists(idxPath))
          compactIndex(spark, indexDir, upToBatch = -1L)
        val haveIndex = fs.exists(idxPath) &&
          fs.listStatus(idxPath).exists(_.getPath.getName.startsWith("batch="))
        val index =
          if (haveIndex)
            // a replayed batch must not probe rows it wrote itself
            Some(spark.read.parquet(indexDir)
              .filter(col("batch") =!= batchId))
          else None
        val (survivors, idxRows) = admitBatch(
          batch, index, idCol, textCol, numHashes, bands, threshold)
        survivors.write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
        idxRows.write.mode("overwrite")
          .parquet(s"$indexDir/batch=$batchId")
        // in-loop maintenance: every N batches, fold the trailing
        // WINDOW of committed dirs (strictly before this batch — this
        // batch can still replay, and its probe filter must keep
        // excluding its own rows by dir) into the window's lowest id.
        // Windowed, not from-zero: a full merge would rewrite the
        // whole index every N batches (O(index) each time — quadratic
        // over the stream's life); the window keeps compaction cost
        // ∝ N batches of rows (amortized O(1) per row) and bounds dir
        // count at ≈ batches/N. Run the unwindowed compactIndex as an
        // offline maintenance pass when dirs should fold further.
        // Idempotent under replay (re-merging a merged window is a
        // no-op); a crash mid-compaction rolls forward on the next
        // call.
        compactEvery.foreach { n =>
          if (batchId > 0 && batchId % n == 0)
            compactIndex(spark, indexDir, upToBatch = batchId - 1,
              fromBatch = batchId - n)
        }
        ()
      }
      .start()
  }

  /** [[nearDupIngest]]'s winnowing sibling: every micro-batch is
    * [[admitBatchWinnow]]ed against the persisted fingerprint index,
    * survivors land in `outDir`, and their index rows are appended —
    * corpus growth with SPAN-MATCH admission at O(batch + collisions)
    * per batch, completing [[graft.ops.Winnowing.winnowIndex]]'s
    * production lifecycle (build → append → probe → compact).
    *
    * Same crash discipline as [[nearDupIngest]]: batch-keyed
    * subdirectories with overwrite (replay-idempotent), unconditional
    * torn-compaction roll-forward BEFORE probing, and a replay filter
    * excluding the current batch's own rows. Winnowing adds two
    * refinements: index rows are written h-SORTED (each batch dir is
    * one range-clustered file, and compaction preserves the order via
    * `sortCol` — the row-group-pruning layout
    * [[graft.ops.Winnowing.writeWinnowIndex]] enforces for the
    * offline form), and the probe core dedupes matched index rows, so
    * the duplicate rows a crashed compaction can transiently leave
    * never inflate a pair's shared-fingerprint count past threshold
    * (minhash admission is edge-duplication-invariant; winnowing's
    * n_shared is not).
    */
  def winnowIngest(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, outDir: String, checkpointDir: String,
      k: Int = 4, w: Int = 4, minShared: Long = 3, maxDf: Int = 64,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
      compactEvery: Option[Int] = None)
      : StreamingQuery = {
    compactEvery.foreach(n => require(n >= 2,
      s"compactEvery=$n: compacting every batch just rewrites the index"))
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val idxPath = new org.apache.hadoop.fs.Path(indexDir)
        val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // heal a torn compaction BEFORE probing (see nearDupIngest)
        if (fs.exists(idxPath))
          compactIndex(spark, indexDir, upToBatch = -1L, sortCol = Some("h"))
        val haveIndex = fs.exists(idxPath) &&
          fs.listStatus(idxPath).exists(_.getPath.getName.startsWith("batch="))
        // params guard, once per batch at O(1): the sidecar (written
        // below after the first index append) proves the whole
        // directory's (k, w), so the probe skips the DataFrame-form
        // distinct-params scan that would otherwise touch the FULL
        // index every micro-batch. A sidecar-less dir with index rows
        // (pre-sidecar layout) falls back to the scan once — the
        // sidecar write below then upgrades it.
        val sidecar = graft.ops.Winnowing.readParamsSidecar(fs, idxPath)
        sidecar.foreach(p => require(p == s"$k:$w",
          s"winnowIngest: index at $indexDir carries params {$p} but " +
            s"this stream uses $k:$w — restarted with different " +
            "winnowing params?"))
        val index =
          if (haveIndex)
            Some(spark.read.parquet(indexDir)
              .filter(col("batch") =!= batchId))
          else None
        val (survivors, idxRows) = admitBatchWinnow(
          batch, index, idCol, textCol, k, w, minShared, maxDf,
          validateParams = sidecar.isEmpty)
        survivors.write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
        // one h-sorted file per batch dir: batch fingerprint sets are
        // small (≈ 2/(w+1) of the batch's grams), and the sorted
        // layout keeps row-group h-stats tight from the first write
        idxRows.repartitionByRange(1, col("h"))
          .sortWithinPartitions(col("h"))
          .write.mode("overwrite")
          .parquet(s"$indexDir/batch=$batchId")
        if (sidecar.isEmpty)
          graft.ops.Winnowing.writeParamsSidecar(fs, idxPath, k, w)
        // in-loop windowed compaction (see nearDupIngest for why the
        // window, not from-zero), order-preserving via sortCol
        compactEvery.foreach { n =>
          if (batchId > 0 && batchId % n == 0)
            compactIndex(spark, indexDir, upToBatch = batchId - 1,
              fromBatch = batchId - n, sortCol = Some("h"))
        }
        ()
      }
      .start()
  }
}
