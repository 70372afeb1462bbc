package graft.queries

import graft.{GraftQuery, Tables}
import graft.ops.{BloomJoin, Dedup, Multimodal, Pipeline, Profiling, Retrieval, Sampling, Similarity, Sketches, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: binary media metadata, frame
  * sampling, feature extraction plumbing.
  *
  * Split from the original TrainingData.scala (round 11) —
  * query definitions are unchanged; TrainingData.all still
  * registers everything in the original order.
  */
object TrainingDataMedia {

  /** Multimodal metadata path (pure column exprs — oracled). */
  val td_media_meta = GraftQuery(
    "td_media_meta",
    (s, dir) => {
      Multimodal.packFromText(Tables.documents(s, dir), "doc_id", "text")
        .select(
          col("media_id"),
          octet_length(col("media")).as("n_bytes"),
          col("meta.format").as("format"),
          col("meta.width").as("width"),
          col("meta.height").as("height"))
        .orderBy(col("media_id"))
    },
    Some("""SELECT doc_id AS media_id,
      octet_length(encode(text)) AS n_bytes,
      CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        ELSE 'wav' END AS format,
      CAST(doc_id % 640 + 1 AS INTEGER) AS width,
      CAST(doc_id % 480 + 1 AS INTEGER) AS height
      FROM documents ORDER BY media_id"""))


  /** Frame-sampling plumbing over binary media: one row per sampled
    * fixed-size slice — the oracle recomputes frame counts/bytes from
    * payload lengths. */
  val td_media_frames = GraftQuery(
    "td_media_frames",
    (s, dir) => {
      Multimodal.sampleFrames(
        Multimodal.packFromText(Tables.documents(s, dir), "doc_id", "text"),
        frameBytes = 64, every = 2)
        .groupBy(col("media_id"))
        .agg(
          count(lit(1)).as("n_frames"),
          sum(octet_length(col("frame"))).as("frame_bytes"))
        .orderBy(col("media_id"))
    },
    Some("""WITH m AS (
        SELECT doc_id AS media_id, octet_length(encode(text)) AS len
        FROM documents),
      f AS (
        SELECT media_id, i, least(64, len - i*64) AS flen
        FROM m, UNNEST(range(0, CAST(greatest(len//64, 1) AS BIGINT))) u(i)
        WHERE i % 2 = 0 AND len - i*64 > 0)
      SELECT media_id, COUNT(*) AS n_frames, CAST(SUM(flen) AS BIGINT) AS frame_bytes
      FROM f GROUP BY media_id ORDER BY media_id"""))


  /** Full batched decode plumbing (stub codec). The deterministic
    * features (byte count, mean byte value) are oracled — the corpus
    * is ASCII, so DuckDB can recompute byte sums from codepoints;
    * `batch_size` (partitioning-dependent) stays out of the output and
    * is covered by OpsSpec instead.
    */
  val td_media_features = GraftQuery(
    "td_media_features",
    (s, dir) => {
      Multimodal.extractFeatures(
        Multimodal.packFromText(Tables.documents(s, dir), "doc_id", "text"))
        .select(col("media_id"), col("format"), col("n_bytes"), col("mean_byte"))
        .orderBy(col("media_id"))
    },
    Some("""SELECT doc_id AS media_id,
      CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        ELSE 'wav' END AS format,
      octet_length(encode(text)) AS n_bytes,
      CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
           ELSE CAST(list_sum(list_transform(string_split(text, ''),
                  c -> ascii(c))) AS DOUBLE) / octet_length(encode(text))
      END AS mean_byte
      FROM documents ORDER BY media_id"""))

}
