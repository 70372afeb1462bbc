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
    * (None for the first batch), drop every new doc that near-dups an
    * already-admitted doc or an earlier (lower-id) doc of the same
    * batch, and return (survivors, their band-index rows to append).
    *
    * Policy, from the id_a < id_b pair orientation: a pair's larger
    * new id always loses; a new id also loses to a larger OLD id
    * (the corpus member was admitted first — arrival order wins, not
    * id order). Deterministic and transitive-free by construction:
    * admission is decided per doc against the standing corpus.
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
    val newIds = batch.select(col(idCol).as("__nid")).distinct()
    // larger new id of a pair always loses...
    val loseB = pairs.join(newIds, pairs("id_b") === newIds("__nid"), "left_semi")
      .select(col("id_b").as(idCol))
    // ...and a new id_a loses to an old id_b (old = not in this batch)
    val loseA = pairs
      .join(newIds, pairs("id_a") === newIds("__nid"), "left_semi")
      .join(newIds, pairs("id_b") === newIds("__nid"), "left_anti")
      .select(col("id_a").as(idCol))
    val survivors = batch.join(
      loseB.unionByName(loseA).distinct(), Seq(idCol), "left_anti")
    (survivors,
      Dedup.minhashBandIndex(survivors, idCol, textCol, numHashes, bands))
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
      numHashes: Int = 32, bands: Int = 16, threshold: Double = 0.8)
      : StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val haveIndex = new java.io.File(indexDir).exists() &&
          new java.io.File(indexDir).listFiles() != null &&
          new java.io.File(indexDir).listFiles()
            .exists(f => f.getName.startsWith("batch="))
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
        ()
      }
      .start()
}
