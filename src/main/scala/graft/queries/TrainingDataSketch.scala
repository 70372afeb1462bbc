package graft.queries

import graft.{GraftQuery, Tables}
import graft.ops.{BloomJoin, Dedup, Multimodal, Pipeline, Profiling, Retrieval, Sampling, Similarity, Sketches, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketches & profiling: HLL, KMV, CMS heavy hitters,
  * quantiles, drift, corpus diff.
  *
  * Split from the original TrainingData.scala (round 11) —
  * query definitions are unchanged; TrainingData.all still
  * registers everything in the original order.
  */
object TrainingDataSketch {

  /** One-pass per-column data profile ([[graft.ops.Profiling]]):
    * null/distinct/min/max per column in a single scan — the ingest
    * health check. The approx (HLL++) variant is spec-checked against
    * this exact one (OpsSpec). */
  val td_profile = GraftQuery(
    "td_profile",
    (s, dir) => {
      Profiling.profile(Tables.documents(s, dir),
        Seq("lang", "source", "n_chars"))
        .orderBy(col("col_name"))
    },
    Some("""SELECT 'lang' AS col_name, COUNT(*) - COUNT(lang) AS n_nulls,
        COUNT(DISTINCT lang) AS n_distinct,
        CAST(MIN(lang) AS VARCHAR) AS min_val,
        CAST(MAX(lang) AS VARCHAR) AS max_val FROM documents
      UNION ALL
      SELECT 'source', COUNT(*) - COUNT(source), COUNT(DISTINCT source),
        CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR) FROM documents
      UNION ALL
      SELECT 'n_chars', COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
        CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
      ORDER BY col_name"""))


  /** Grouped linear-regression sufficient statistics
    * ([[graft.ops.Profiling.sufficientStats]]): per return flag, fit
    * extendedprice on quantity in ONE map-side-combinable pass —
    * exact-decimal (n, Σx, Σy, Σx², Σxy, Σy²) plus IEEE-double
    * slope/intercept/r derived from those sums. The mergeable-sums
    * shape is what lets per-shard stats roll up at 100 TB. */
  val td_sufficient_stats = GraftQuery(
    "td_sufficient_stats",
    (s, dir) => {
      Profiling.sufficientStats(Tables.lineitem(s, dir),
        Seq("l_returnflag"), "l_quantity", "l_extendedprice")
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH s AS (
        SELECT l_returnflag,
          COUNT(*) AS n,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sum_x,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sum_y,
          CAST(CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,6)) *
              CAST(l_quantity AS DECIMAL(19,6)) AS DECIMAL(38,12)))
            AS DECIMAL(30,6)) AS VARCHAR) AS DOUBLE) AS sum_xx,
          CAST(CAST(CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,6)) *
              CAST(l_extendedprice AS DECIMAL(19,6)) AS DECIMAL(38,12)))
            AS DECIMAL(30,6)) AS VARCHAR) AS DOUBLE) AS sum_xy,
          CAST(CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,6)) *
              CAST(l_extendedprice AS DECIMAL(19,6)) AS DECIMAL(38,12)))
            AS DECIMAL(30,6)) AS VARCHAR) AS DOUBLE) AS sum_yy
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        GROUP BY l_returnflag)
      SELECT l_returnflag, n, sum_x, sum_y, sum_xx, sum_xy, sum_yy,
        (n * sum_xy - sum_x * sum_y) /
          (n * sum_xx - sum_x * sum_x) AS slope,
        (sum_y - ((n * sum_xy - sum_x * sum_y) /
          (n * sum_xx - sum_x * sum_x)) * sum_x) / n AS intercept,
        (n * sum_xy - sum_x * sum_y) /
          (sqrt(n * sum_xx - sum_x * sum_x) *
           sqrt(n * sum_yy - sum_y * sum_y)) AS r
      FROM s ORDER BY l_returnflag"""))


  /** Exact φ-heavy hitters via count-min prefilter
    * ([[graft.ops.Sketches.heavyHitters]]): tokens holding ≥ 2% of
    * all occurrences, found WITHOUT a full-vocabulary shuffle — the
    * deliberately narrow width (512) forces sketch collisions, and
    * the result is still exact because thresholded estimates are a
    * candidate superset resolved by exact counting. The oracle is the
    * plain GROUP BY / HAVING it replaces. */
  val td_heavy_hitters = GraftQuery(
    "td_heavy_hitters",
    (s, dir) => {
      val words = Tables.documents(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      Sketches.heavyHitters(words, "w", phiPct = 2, depth = 4,
        width = 512)
        .orderBy(col("w"))
    },
    Some("""WITH words AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0),
      tot AS (SELECT COUNT(*) AS n FROM words)
      SELECT w, COUNT(*) AS cnt FROM words, tot
      GROUP BY w, tot.n HAVING COUNT(*) * 100 >= tot.n * 2
      ORDER BY w"""))


  /** HyperLogLog register table ([[graft.ops.Sketches.hllRegisters]],
    * p=8) over the corpus token stream: the sketch STATE is exact and
    * hash-matched cross-engine — the estimate layered on it is the
    * only approximate part and is spec-bounded (SketchesSpec). */
  val td_hll_registers = GraftQuery(
    "td_hll_registers",
    (s, dir) => {
      val words = Tables.documents(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      Sketches.hllRegisters(words, "w", p = 8).orderBy(col("j"))
    },
    Some("""WITH words AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0),
      h AS (SELECT ('0x'||substr(md5(w),1,15))::BIGINT AS h FROM words)
      SELECT h >> 52 AS j,
        max(CASE WHEN (h & ((1::BIGINT << 52) - 1)) = 0 THEN 53
              ELSE 53 - length(ltrim(bin(h & ((1::BIGINT << 52) - 1)),
                '0')) END) AS rank
      FROM h GROUP BY j ORDER BY j"""))


  /** Per-source HLL sketches ([[graft.ops.Sketches.hllRegistersBy]],
    * p=6): one bounded register table per source — the live
    * per-partition distinct-tracking shape (≤ 2^p rows per group,
    * merge-by-max across runs) where exact per-group count(distinct)
    * would shuffle every distinct token. Registers exact and
    * hash-matched cross-engine. */
  val td_hll_by_source = GraftQuery(
    "td_hll_by_source",
    (s, dir) => {
      val words = Tables.documents(s, dir)
        .select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("w"))
      Sketches.hllRegistersBy(words, Seq("source"), "w", p = 6)
        .orderBy(col("source"), col("j"))
    },
    Some("""WITH words AS (
        SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0),
      h AS (SELECT source,
              ('0x'||substr(md5(w),1,15))::BIGINT AS h FROM words)
      SELECT source, h >> 54 AS j,
        max(CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0 THEN 55
              ELSE 55 - length(ltrim(bin(h & ((1::BIGINT << 54) - 1)),
                '0')) END) AS rank
      FROM h GROUP BY source, j ORDER BY source, j"""))


  /** Corpus-version drift gate ([[graft.ops.Profiling.driftTvd]]):
    * language-share total-variation distance between the corpus and a
    * simulated next crawl (every third English doc dropped) — integer
    * ppm end to end, so the gate value is bit-exact cross-engine. */
  val td_drift_tvd = GraftQuery(
    "td_drift_tvd",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val next = d.filter(
        !(col("lang") === "en" && pmod(col("doc_id"), lit(3)) === 0))
      Profiling.driftTvd(d, next, col("lang"))
        .orderBy(col("bucket"))
    },
    Some("""WITH a AS (
        SELECT lang AS bucket, COUNT(*) AS n_a FROM documents GROUP BY 1),
      b AS (
        SELECT lang AS bucket, COUNT(*) AS n_b FROM documents
        WHERE NOT (lang = 'en' AND doc_id % 3 = 0) GROUP BY 1),
      j AS (
        SELECT COALESCE(a.bucket, b.bucket) AS bucket,
          CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
          CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b
        FROM a FULL OUTER JOIN b ON a.bucket = b.bucket),
      sh AS (
        SELECT bucket, n_a, n_b,
          CAST((n_a * 1000000) // (SELECT SUM(n_a) FROM j) AS BIGINT)
            AS share_a_ppm,
          CAST((n_b * 1000000) // (SELECT SUM(n_b) FROM j) AS BIGINT)
            AS share_b_ppm
        FROM j)
      SELECT bucket, n_a, n_b, share_a_ppm, share_b_ppm,
        CAST(abs(share_a_ppm - share_b_ppm) AS BIGINT) AS gap_ppm,
        CAST((SELECT SUM(abs(share_a_ppm - share_b_ppm)) FROM sh) // 2
          AS BIGINT) AS tvd_ppm
      FROM sh ORDER BY bucket"""))


  /** Dataset-versioning diff ([[graft.ops.Profiling.corpusDiff]]):
    * doc-level added/removed/changed between the corpus and a
    * simulated next version (every 11th doc dropped, every 7th
    * edited, 5 new ids appended). Fingerprints join, text never
    * shuffles; `unchanged` filtered from the output so the result is
    * delta-sized. */
  val td_corpus_diff = GraftQuery(
    "td_corpus_diff",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val next = graft.fixtures.Planted.variants(d, Seq(
        (pmod(col("doc_id"), lit(11)) =!= 0) -> Seq(
          "text" -> when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" EDITED"))).otherwise(col("text"))),
        (col("doc_id") < 5) ->
          Seq("doc_id" -> (col("doc_id") + 9000000L))))
      Profiling.corpusDiff(d, next, "doc_id", "text")
        .filter(col("status") =!= "unchanged")
        .orderBy(col("doc_id"))
    },
    Some("""WITH next AS (
        SELECT doc_id, text || ' EDITED' AS text FROM documents
        WHERE doc_id % 11 <> 0 AND doc_id % 7 = 0
        UNION ALL
        SELECT doc_id, text FROM documents
        WHERE doc_id % 11 <> 0 AND doc_id % 7 <> 0
        UNION ALL
        SELECT doc_id + 9000000, text FROM documents WHERE doc_id < 5),
      d AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
          CASE WHEN a.doc_id IS NULL THEN 'added'
               WHEN b.doc_id IS NULL THEN 'removed'
               WHEN md5(a.text) = md5(b.text) THEN 'unchanged'
               ELSE 'changed' END AS status
        FROM documents a FULL OUTER JOIN next b ON a.doc_id = b.doc_id)
      SELECT doc_id, status FROM d
      WHERE status <> 'unchanged' ORDER BY doc_id"""))


  /** Discrete token-count quantiles per source (percentile-disc:
    * value at rank ceil(p*n) — integer-exact across engines, unlike
    * interpolated quantiles). */
  val td_token_quantiles = GraftQuery(
    "td_token_quantiles",
    (s, dir) => {
      Sampling.discreteQuantiles(
        Tables.documents(s, dir), "source", "doc_id",
        TextAnalysis.tokenCount(col("text")),
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
        .orderBy(col("source"))
    },
    Some("""WITH t AS (
        SELECT source, doc_id,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text),'\s+')) END AS n_tokens
        FROM documents),
      r AS (
        SELECT source, n_tokens,
          row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rn,
          COUNT(*) OVER (PARTITION BY source) AS cnt
        FROM t)
      SELECT source,
        MAX(CASE WHEN rn = CAST(ceil(cnt * 0.5) AS BIGINT) THEN n_tokens END) AS p50,
        MAX(CASE WHEN rn = CAST(ceil(cnt * 0.9) AS BIGINT) THEN n_tokens END) AS p90,
        MAX(CASE WHEN rn = CAST(ceil(cnt * 0.99) AS BIGINT) THEN n_tokens END) AS p99
      FROM r GROUP BY source ORDER BY source"""))


  /** The same per-source token-length percentiles computed the
    * 100-TB way ([[graft.ops.Sampling.discreteQuantilesByValue]]):
    * exact counts per (source, n_tokens) — map-side combinable,
    * output bounded by the distinct token counts — then a cumulative
    * walk of that small table. Same oracle SQL as
    * [[td_token_quantiles]]: identical answers, no corpus-wide sort. */
  val td_quantiles_by_value = GraftQuery(
    "td_quantiles_by_value",
    (s, dir) => {
      Sampling.discreteQuantilesByValue(
        Tables.documents(s, dir), "source",
        TextAnalysis.tokenCount(col("text")),
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
        .orderBy(col("source"))
    },
    td_token_quantiles.oracle)


  /** Per-source log-histogram quantile sketch registers
    * ([[graft.ops.Sketches.logHistogram]], subBits=4): radix-2
    * integer buckets — exact below 16, (exponent, top-4 mantissa
    * bits) above, all `bin`-length and shift arithmetic both engines
    * compute identically. The register TABLE is the oracled object
    * (the estimate's ≤ 2^-4 relative-error readout is spec-bounded),
    * exactly the CMS/HLL discipline. */
  val td_quantile_sketch = GraftQuery(
    "td_quantile_sketch",
    (s, dir) => {
      Sketches.logHistogram(Tables.documents(s, dir), Seq("source"),
        TextAnalysis.tokenCount(col("text")), subBits = 4)
        .orderBy(col("source"), col("bucket"))
    },
    Some("""WITH t AS (
        SELECT source,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text),'\s+')) END AS v
        FROM documents)
      SELECT source,
        CASE WHEN v < 16 THEN v
             ELSE (length(bin(v)) - 1 - 4) * 16
               + (v >> CAST(length(bin(v)) - 1 - 4 AS INT))
        END AS bucket,
        COUNT(*) AS count
      FROM t GROUP BY 1, 2 ORDER BY source, bucket"""))


  /** Bottom-k (KMV) sketch statistics: a deterministic 200-doc
    * uniform sample (k smallest md5(doc_id) hashes — membership is a
    * pure hash function, so the SAMPLE ITSELF is cross-engine exact)
    * and discrete quantiles of n_chars read off it. The 100 TB
    * shape: the sketch is TakeOrdered (O(k) state per task, no full
    * shuffle — OpsSpec asserts the plan), mergeable across shards
    * (OpsSpec: merge ≡ whole), and any later statistic costs k rows,
    * not a corpus rescan. */
  val td_kmv_quantiles = GraftQuery(
    "td_kmv_quantiles",
    (s, dir) => {
      val sample = Sketches.bottomK(
        Tables.documents(s, dir), "doc_id", 200, payload = Seq("n_chars"))
      Sampling.discreteQuantiles(
        sample.withColumn("scope", lit("all")), "scope", "doc_id",
        col("n_chars"),
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p90" -> 0.9))
        .orderBy(col("scope"))
    },
    Some("""WITH h AS (
        SELECT doc_id, n_chars,
          row_number() OVER (ORDER BY
            ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT,
            doc_id) AS hrn
        FROM documents),
      samp AS (SELECT doc_id, n_chars FROM h WHERE hrn <= 200),
      r AS (
        SELECT doc_id, n_chars,
          row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
          COUNT(*) OVER () AS cnt
        FROM samp)
      SELECT 'all' AS scope,
        MAX(CASE WHEN rn = CAST(ceil(cnt * 0.25) AS BIGINT)
          THEN n_chars END) AS p25,
        MAX(CASE WHEN rn = CAST(ceil(cnt * 0.5) AS BIGINT)
          THEN n_chars END) AS p50,
        MAX(CASE WHEN rn = CAST(ceil(cnt * 0.75) AS BIGINT)
          THEN n_chars END) AS p75,
        MAX(CASE WHEN rn = CAST(ceil(cnt * 0.9) AS BIGINT)
          THEN n_chars END) AS p90
      FROM r ORDER BY scope"""))


  /** Cross-source duplication profile via per-source KMV sketches
    * ([[graft.ops.Sketches.bottomKByGroup]] / [[graft.ops.Sketches.kmvPairOverlap]]):
    * for every source pair, the Jaccard of their content-fingerprint
    * sets estimated from two 16-row sketches — the dedup-PLANNING
    * primitive ("which source pairs share mass, in what order do we
    * dedup") that costs k rows per source instead of a cross-source
    * content join. All reported columns are exact integers over the
    * deterministic sketches; only their interpretation as a
    * cardinality ratio is approximate (spec-pinned vs exact Jaccard). */
  val td_kmv_overlap = GraftQuery(
    "td_kmv_overlap",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val sk = Sketches.bottomKByGroup(
        d, "source", TextAnalysis.fingerprint(col("text")), k = 16)
      Sketches.kmvPairOverlap(sk, "source", k = 16)
        .select(col("group_a").as("source_a"), col("group_b").as("source_b"),
          col("union_k"), col("inter_count"), col("jaccard_ppm"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some("""WITH keys AS (
        SELECT DISTINCT source AS g,
          md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS key
        FROM documents),
      hashed AS (
        SELECT g, key,
          ('0x'||substr(md5(key),1,15))::BIGINT AS hv
        FROM keys),
      sk AS (
        SELECT g, key, hv FROM (
          SELECT g, key, hv,
            row_number() OVER (PARTITION BY g ORDER BY hv, key) AS rn
          FROM hashed) WHERE rn <= 16),
      grps AS (SELECT DISTINCT g FROM sk),
      pairs AS (
        SELECT a.g AS ga, b.g AS gb
        FROM grps a CROSS JOIN grps b WHERE a.g < b.g),
      tagged AS (
        SELECT p.ga, p.gb, s.g, s.key, s.hv
        FROM pairs p JOIN sk s ON s.g = p.ga OR s.g = p.gb),
      merged AS (
        SELECT ga, gb, key, MIN(hv) AS hv,
          MAX(CASE WHEN g = ga THEN 1 ELSE 0 END) AS in_a,
          MAX(CASE WHEN g = gb THEN 1 ELSE 0 END) AS in_b
        FROM tagged GROUP BY 1, 2, 3),
      kept AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY ga, gb
            ORDER BY hv, key) AS rn
          FROM merged) WHERE rn <= 16)
      SELECT ga AS source_a, gb AS source_b,
        COUNT(*) AS union_k,
        CAST(SUM(CASE WHEN in_a + in_b = 2 THEN 1 ELSE 0 END)
          AS BIGINT) AS inter_count,
        (CAST(SUM(CASE WHEN in_a + in_b = 2 THEN 1 ELSE 0 END)
          AS BIGINT) * 1000000) // COUNT(*) AS jaccard_ppm
      FROM kept GROUP BY 1, 2
      ORDER BY source_a, source_b"""))


  /** Join-size estimation accuracy sweep
    * ([[graft.ops.Sketches.joinSizeEstimate]]): the
    * lineitem ⋈ orders cardinality estimated at three histogram
    * widths vs the exact join count, with the over-estimate error in
    * ppm — demonstrating the estimator's convergence as buckets grow
    * (the planner picks a width by error budget). All integer
    * arithmetic; the md5 bucket is the oracled F1 route. The error
    * numerator runs in DECIMAL(38,0): at 16 buckets `est_rows` ≈
    * |lineitem|·|orders|/16, so the Long form `(est−exact)·10⁶`
    * would wrap silently around SF10 — DECIMAL holds to 10³² rows
    * and `div` still returns the BIGINT the oracle hashes. */
  val td_join_estimate = GraftQuery(
    "td_join_estimate",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      // one md5 pass per side at width 4096; 16/256 derived exactly
      // from that histogram (divisor widths) — see joinSizeEstimateMulti
      val ests = Sketches.joinSizeEstimateMulti(
        li, col("l_orderkey"), ord, col("o_orderkey"), Seq(16, 256, 4096))
      val exact = li.join(ord,
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("exact_rows"))
      ests.crossJoin(broadcast(exact))
        .withColumn("err_ppm",
          expr("(cast(est_rows as decimal(38,0)) - exact_rows)" +
            " * 1000000 div exact_rows"))
        .orderBy(col("buckets"))
    },
    Some("""WITH
      a16 AS (
        SELECT CAST(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)),
          1, 8)) AS BIGINT) % 16 AS b, COUNT(*) AS na
        FROM lineitem GROUP BY 1),
      b16 AS (
        SELECT CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
          1, 8)) AS BIGINT) % 16 AS b, COUNT(*) AS nb
        FROM orders GROUP BY 1),
      a256 AS (
        SELECT CAST(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)),
          1, 8)) AS BIGINT) % 256 AS b, COUNT(*) AS na
        FROM lineitem GROUP BY 1),
      b256 AS (
        SELECT CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
          1, 8)) AS BIGINT) % 256 AS b, COUNT(*) AS nb
        FROM orders GROUP BY 1),
      a4096 AS (
        SELECT CAST(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)),
          1, 8)) AS BIGINT) % 4096 AS b, COUNT(*) AS na
        FROM lineitem GROUP BY 1),
      b4096 AS (
        SELECT CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)),
          1, 8)) AS BIGINT) % 4096 AS b, COUNT(*) AS nb
        FROM orders GROUP BY 1),
      u AS (
        SELECT 16 AS buckets, CAST(SUM(na * nb) AS BIGINT) AS est_rows
        FROM a16 JOIN b16 USING (b)
        UNION ALL
        SELECT 256, CAST(SUM(na * nb) AS BIGINT)
        FROM a256 JOIN b256 USING (b)
        UNION ALL
        SELECT 4096, CAST(SUM(na * nb) AS BIGINT)
        FROM a4096 JOIN b4096 USING (b)),
      ex AS (
        SELECT COUNT(*) AS exact_rows
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      SELECT buckets, est_rows, exact_rows,
        CAST((est_rows - exact_rows) * 1000000 // exact_rows AS BIGINT)
          AS err_ppm
      FROM u, ex ORDER BY buckets"""))


  /** Embedding-space drift gate ([[graft.ops.Profiling
    * .embeddingDrift]]): per-label centroid L1/L∞ shift between two
    * deterministic hash-halves of the embedding table — the semantic
    * complement of [[td_drift_tvd]]'s discrete histograms. Floats
    * cross engines only through one identical widen·2²⁰·floor
    * quantization; every aggregate after that is exact integer. */
  val td_embedding_drift = GraftQuery(
    "td_embedding_drift",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val side = graft.ops.Pipeline.hashBucket(col("vec_id"), 2)
      graft.ops.Profiling.embeddingDrift(
          e.filter(side === 0), e.filter(side === 1),
          "label", "embedding")
        .withColumnRenamed("group", "label")
        .orderBy(col("label"))
    },
    Some("""WITH sides AS (
        SELECT label, embedding,
          CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
            AS BIGINT) % 2 AS side
        FROM embeddings),
      ex AS (
        SELECT label, side, i AS dim,
          CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS q
        FROM sides, unnest(range(1, len(embedding) + 1)) AS t(i)),
      cent AS (
        SELECT label, side, dim, COUNT(*) AS cnt,
          SUM(q) // COUNT(*) AS c
        FROM ex GROUP BY 1, 2, 3),
      j AS (
        SELECT a.label, a.dim, abs(a.c - b.c) AS d,
          a.cnt AS na, b.cnt AS nb
        FROM cent a JOIN cent b ON a.label = b.label AND a.dim = b.dim
        WHERE a.side = 0 AND b.side = 1)
      SELECT label, MAX(na) AS n_a, MAX(nb) AS n_b,
        CAST(SUM(d) AS BIGINT) AS l1_drift_q20,
        CAST(MAX(d) AS BIGINT) AS linf_drift_q20
      FROM j GROUP BY label ORDER BY label"""))

}
