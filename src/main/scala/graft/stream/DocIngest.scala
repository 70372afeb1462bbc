package graft.stream

import graft.ops.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
