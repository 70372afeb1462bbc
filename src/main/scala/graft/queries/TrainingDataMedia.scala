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


  /** Perceptual image near-dup over binary media: 63-bit dHash-style
    * hash of the payload's hashed-4-gram histogram (md5-bucketed — the
    * td_simhash_md5 oracle discipline), 8×8-bit banded candidates,
    * hamming ≤ 7 verify. Pigeonhole makes the banding recall-complete
    * at this threshold, so the DuckDB side can enumerate ALL pairs
    * exhaustively and still match exactly. Planted fixture: every 9th
    * doc re-appears with a 2-byte-prepended payload (a header-shifted
    * copy) — measured hamming ≤ 3 at every SF, far inside the
    * threshold; unrelated payloads sit at median 21 bits. */
  val td_media_neardup = GraftQuery(
    "td_media_neardup",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val corpus = graft.fixtures.Planted.corpus(
        d.select(col("doc_id"), col("text")),
        (pmod(col("doc_id"), lit(9)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 2000000L),
          "text" -> concat(lit("ab"), col("text"))))
      Multimodal.perceptualNearDup(
          Multimodal.packFromText(corpus, "doc_id", "text"))
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH base AS (SELECT doc_id, text FROM documents),
      corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL
        SELECT doc_id + 2000000, 'ab' || text FROM base WHERE doc_id % 9 = 0),
      grams AS (
        SELECT doc_id,
          ('0x'||substr(md5(substring(text, CAST(i AS INTEGER), 4)),1,15))::BIGINT
            % 64 AS b
        FROM corpus, UNNEST(range(1, greatest(length(text) - 2, 1))) u(i)),
      counts AS (SELECT doc_id, b, COUNT(*) AS c FROM grams GROUP BY 1, 2),
      docs AS (SELECT DISTINCT doc_id FROM corpus),
      dense AS (SELECT doc_id, k FROM docs, UNNEST(range(0, 63)) u(k)),
      hash AS (
        SELECT d.doc_id,
          CAST(COALESCE(SUM(CASE WHEN COALESCE(c2.c, 0) > COALESCE(c1.c, 0)
            THEN (CAST(1 AS BIGINT) << CAST(d.k AS INTEGER)) ELSE 0 END), 0)
            AS BIGINT) AS ph
        FROM dense d
        LEFT JOIN counts c1 ON c1.doc_id = d.doc_id AND c1.b = d.k
        LEFT JOIN counts c2 ON c2.doc_id = d.doc_id AND c2.b = d.k + 1
        GROUP BY 1)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS hamming
      FROM hash a JOIN hash b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.ph, b.ph)) <= 7
      ORDER BY id_a, id_b"""))


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
