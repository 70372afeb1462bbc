package graft.queries

import graft.{GraftQuery, Tables}
import graft.ops.{BloomJoin, Dedup, Multimodal, Pipeline, Profiling, Retrieval, Sampling, Similarity, Sketches, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sampling & mixture building: hash/stratified/weighted
  * sampling, domain mixes, packing, splits, end-to-end pipeline.
  *
  * Split from the original TrainingData.scala (round 11) —
  * query definitions are unchanged; TrainingData.all still
  * registers everything in the original order.
  */
object TrainingDataSampling {

  /** Opt-out blocklist scrub ([[graft.ops.BloomJoin.antiJoin]]):
    * remove every document whose content fingerprint appears in a
    * blocklist (here: the fingerprints of doc_id < 40), via a
    * broadcast bloom sketch that lets non-blocked rows bypass the
    * join — only the might-contain sliver is shuffled. Bloom false
    * positives are removed by the exact residual anti-join, so the
    * result is EXACT and the oracle is a plain NOT IN. */
  val td_blocklist_scrub = GraftQuery(
    "td_blocklist_scrub",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val corpus = d.select(col("doc_id"), md5(col("text")).as("fp"))
      val blocklist = d.filter(col("doc_id") < 40)
        .select(md5(col("text")).as("fp"))
      BloomJoin.antiJoin(corpus, blocklist, "fp", "fp",
        expectedItems = 1000L, fpp = 0.05)
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, md5(text) AS fp FROM documents
      WHERE md5(text) NOT IN
        (SELECT md5(text) FROM documents WHERE doc_id < 40)
      ORDER BY doc_id"""))


  /** End-to-end corpus-prep pipeline COMPOSED from the library ops —
    * Gopher quality gate → exact dedup on the canonical fingerprint
    * (keep lowest id) → per-source cap → per-source token budget —
    * oracled as ONE SQL pipeline. The shape a real pretraining mix
    * job runs; every stage keeps its scale properties (narrow flag
    * maps, one dedup shuffle, partial+final group-limit, one keyed
    * window). */
  val td_pipeline_e2e = GraftQuery(
    "td_pipeline_e2e",
    (s, dir) => {
      val stop = Seq("a", "the", "value", "table", "row")
      val flags = TextAnalysis.gopherQualityFlags(col("text"), stop,
        minWords = 30)
      val quality = Tables.documents(s, dir)
        .filter(flags.reduce(_ && _))
      val keep = Dedup.exact(quality, "doc_id", "text",
        t => md5(TextAnalysis.canonicalize(t)))
      val deduped = quality.join(keep.select(col("doc_id")), Seq("doc_id"))
      val capped = graft.ops.Pipeline.capPerStratum(
        deduped.withColumn("neg_id", -col("doc_id")),
        "source", "neg_id", "doc_id", 40)
      graft.ops.Pipeline.tokenBudget(capped, "source", "doc_id",
        "text", budget = 2000L)
        .orderBy(col("source"), col("doc_id"))
    },
    Some("""WITH f AS (
        SELECT doc_id, source, text,
          CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(t) END AS n,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE CAST(list_sum(list_transform(t, x -> length(x)))
                         AS BIGINT) END AS sum_len,
          len(regexp_extract_all(text, '#|\.\.\.')) AS nsym,
          len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
            AS nalpha,
          len(list_filter(t,
            x -> list_contains(['a','the','value','table','row'], x)))
            AS stop_hits
        FROM (SELECT doc_id, source, text,
                string_split_regex(trim(text), '\s+') AS t
              FROM documents)),
      q AS (
        SELECT doc_id, source, text FROM f
        WHERE n >= 30 AND n <= 100000
          AND n > 0 AND sum_len >= n * 3 AND sum_len <= n * 10
          AND nsym * 10 <= n
          AND nalpha * 5 >= n * 4
          AND stop_hits >= 2),
      keep AS (
        SELECT min(doc_id) AS doc_id
        FROM q
        GROUP BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))),
      dedup AS (SELECT q.* FROM q JOIN keep USING (doc_id)),
      capped AS (
        SELECT * FROM (
          SELECT doc_id, source, text,
            row_number() OVER (PARTITION BY source ORDER BY doc_id)
              AS rn
          FROM dedup)
        WHERE rn <= 40),
      counted AS (
        SELECT source, doc_id,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END
            AS n_tokens
        FROM capped),
      budget AS (
        SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
          CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM counted)
      SELECT source, doc_id, n_tokens, cum_tokens FROM budget
      WHERE cum_tokens <= 2000
      ORDER BY source, doc_id"""))


  /** Per-source document cap ([[graft.ops.Pipeline.capPerStratum]]):
    * top-10 docs per source by length — plans as partial+final
    * WindowGroupLimit, so map tasks pre-prune before the shuffle. */
  val td_source_cap = GraftQuery(
    "td_source_cap",
    (s, dir) => {
      graft.ops.Pipeline.capPerStratum(
        Tables.documents(s, dir).select("doc_id", "source", "n_chars"),
        "source", "n_chars", "doc_id", n = 10)
        .orderBy(col("source"), col("rank"))
    },
    Some("""SELECT doc_id, source, n_chars, CAST(rank AS INTEGER) AS rank
      FROM (
        SELECT doc_id, source, n_chars,
          row_number() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id) AS rank
        FROM documents)
      WHERE rank <= 10 ORDER BY source, rank"""))


  /** The shared integer quality score of the pruning pair: type-token
    * ratio in exact ppm (distinct tokens per million tokens; 0 for
    * empty docs) — the repetition-quality signal, `div` arithmetic
    * both sides, so the score, the cutoffs, and the kept sets are
    * bit-exact. */
  private def ttrScored(d: DataFrame): DataFrame = d
    .withColumn("__n", TextAnalysis.tokenCount(col("text")).cast("long"))
    .withColumn("__nd",
      size(array_distinct(TextAnalysis.tokens(col("text")))).cast("long"))
    .withColumn("score_ppm",
      when(col("__n") === 0L, lit(0L))
        .otherwise(expr("__nd * 1000000 div __n")))
    .select("doc_id", "source", "score_ppm")


  private val ttrScoredSql =
    """t AS (
        SELECT doc_id, source,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text),'\s+')) END AS n,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(list_distinct(string_split_regex(trim(text),'\s+')))
            END AS nd
        FROM documents),
      s AS (
        SELECT doc_id, source,
          CAST(CASE WHEN n = 0 THEN 0 ELSE (nd * 1000000) // n END AS BIGINT)
            AS score_ppm
        FROM t)"""


  /** Per-domain quality pruning, exact-rank form
    * ([[graft.ops.Sampling.qualityPruneExact]]): keep each source's
    * best 30% by type-token-ratio score — the FineWeb-style prune that
    * never collapses a small domain. */
  val td_quality_prune = GraftQuery(
    "td_quality_prune",
    (s, dir) => {
      Sampling.qualityPruneExact(
        ttrScored(Tables.documents(s, dir)),
        "source", col("score_ppm"), "doc_id", keepPct = 30)
        .select(col("doc_id"), col("source"), col("score_ppm"), col("rank"))
        .orderBy(col("source"), col("rank"))
    },
    Some(s"""WITH $ttrScoredSql,
      r AS (
        SELECT doc_id, source, score_ppm,
          row_number() OVER (PARTITION BY source
            ORDER BY score_ppm DESC, doc_id) AS rank,
          COUNT(*) OVER (PARTITION BY source) AS cnt
        FROM s)
      SELECT doc_id, source, score_ppm, CAST(rank AS INTEGER) AS rank
      FROM r WHERE rank <= GREATEST(1, (cnt * 30) // 100)
      ORDER BY source, rank"""))


  /** The same prune the 100-TB way
    * ([[graft.ops.Sampling.qualityPruneByValue]]): per-source cutoff
    * from count-by-value aggregation (no row sort anywhere), rows
    * tied at the cutoff all kept — its own oracle mirrors the
    * ≥-cutoff semantics exactly. */
  val td_quality_prune_cutoff = GraftQuery(
    "td_quality_prune_cutoff",
    (s, dir) => {
      Sampling.qualityPruneByValue(
        ttrScored(Tables.documents(s, dir)),
        "source", col("score_ppm"), "doc_id", keepPct = 30)
        .select(col("doc_id"), col("source"), col("score_ppm"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $ttrScoredSql,
      c AS (
        SELECT source, score_ppm, COUNT(*) AS c FROM s GROUP BY 1, 2),
      w AS (
        SELECT source, score_ppm, c,
          SUM(c) OVER (PARTITION BY source ORDER BY score_ppm DESC) AS cum,
          SUM(c) OVER (PARTITION BY source) AS tot
        FROM c),
      cut AS (
        SELECT source, score_ppm AS cutoff FROM w
        WHERE GREATEST(1, (tot * 30) // 100) > cum - c
          AND GREATEST(1, (tot * 30) // 100) <= cum)
      SELECT s.doc_id, s.source, s.score_ppm
      FROM s JOIN cut USING (source) WHERE s.score_ppm >= cut.cutoff
      ORDER BY s.doc_id"""))


  /** Sequence-length power-of-two bucketing with padding-waste ppm
    * ([[graft.ops.Pipeline.lengthBuckets]]) — the padded-batch
    * counterpart of [[td_pack_sequences]]; integer bit-length bucket
    * arithmetic, no float log2. */
  val td_length_buckets = GraftQuery(
    "td_length_buckets",
    (s, dir) => {
      graft.ops.Pipeline.lengthBuckets(
        Tables.documents(s, dir).select("doc_id", "text"), "text",
        minBucket = 16)
        .orderBy(col("bucket"))
    },
    Some("""WITH t AS (
        SELECT doc_id,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text),'\s+')) END AS n
        FROM documents),
      bkt AS (
        SELECT doc_id, n,
          GREATEST(16, CASE WHEN n <= 1 THEN 2
            ELSE CAST(1 AS BIGINT) << length(bin(CAST(n - 1 AS BIGINT)))
            END) AS bucket
        FROM t),
      g AS (
        SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_docs,
          SUM(n) AS n_tokens
        FROM bkt GROUP BY 1)
      SELECT bucket, CAST(n_docs AS BIGINT) AS n_docs,
        CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(n_docs * bucket AS BIGINT) AS n_padded,
        CAST(((n_docs * bucket - n_tokens) * 1000000) // (n_docs * bucket)
          AS BIGINT) AS waste_ppm
      FROM g ORDER BY bucket"""))


  /** Deterministic Bernoulli sample (md5-hash membership, no shuffle,
    * reproducible across engines/runs/partitionings — `rand()` is
    * none of those). The cutoff literal is shared with the oracle. */
  val td_sample_hash = GraftQuery(
    "td_sample_hash",
    (s, dir) => {
      Sampling.hashSample(Tables.documents(s, dir), "doc_id", 0.1)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some(s"""SELECT doc_id, source FROM documents
      WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
            < ${Sampling.cutoff(0.1)}
      ORDER BY doc_id"""))


  /** Target-proportion domain mix ([[graft.ops.Sampling.domainMix]]):
    * keep rates DERIVED from the live domain counts so the surviving
    * corpus approaches 50/30/20 shares of src0/src1/src2 at the
    * largest feasible total — the knob every pretraining mix turns.
    * The oracle recomputes T, k_d, and keep_ppm with the identical
    * 64-bit integer arithmetic and the same md5 membership. */
  val td_domain_mix = GraftQuery(
    "td_domain_mix",
    (s, dir) => {
      Sampling.domainMix(Tables.documents(s, dir), "doc_id", "source",
        Map("src0" -> 500000L, "src1" -> 300000L, "src2" -> 200000L))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tgt(source, f) AS (
        VALUES ('src0', 500000), ('src1', 300000), ('src2', 200000)),
      j AS (
        SELECT d.source, COUNT(*) AS n, MAX(t.f) AS f
        FROM documents d JOIN tgt t ON d.source = t.source
        GROUP BY d.source),
      tot AS (SELECT MIN(n * 1000000 // f) AS t FROM j),
      rates AS (
        SELECT source,
          LEAST(1000000,
            ((tot.t // 1000000) * f + ((tot.t % 1000000) * f) // 1000000)
              * 1000000 // n) AS keep_ppm
        FROM j, tot)
      SELECT d.doc_id, d.source
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE ('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT
              % 1000000 < r.keep_ppm
      ORDER BY d.doc_id"""))


  /** Temperature-smoothed domain mixing at τ = 1/2
    * ([[graft.ops.Sampling.temperatureRates]]/[[graft.ops.Sampling.temperatureMix]]):
    * mixing shares DERIVED from live per-language counts (p ∝ √n —
    * the mT5/XLM-R rule damping big languages, boosting small ones),
    * then the same feasible-total + hash-membership sampling as
    * [[td_domain_mix]]. Report per language: live count, derived
    * share, keep rate, and the docs actually kept — every column an
    * exact integer, the whole derivation value-checked. */
  val td_temperature_mix = GraftQuery(
    "td_temperature_mix",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val kept = Sampling.temperatureMix(d, "doc_id", "lang")
        .groupBy(col("lang").as("domain"))
        .agg(count(lit(1)).as("n_kept"))
      Sampling.temperatureRates(d, "lang")
        .join(kept, Seq("domain"), "left")
        .select(col("domain").as("lang"), col("n_docs"),
          col("share_ppm"), col("keep_ppm"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy(col("lang"))
    },
    Some("""WITH c AS (
        SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
      w AS (
        SELECT lang, n,
          CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS w
        FROM c),
      s AS (
        SELECT lang, n,
          CAST(GREATEST((w * 1000000) // (SELECT CAST(SUM(w) AS BIGINT) FROM w),
            1) AS BIGINT) AS share_ppm
        FROM w),
      t AS (
        SELECT CAST(MIN((n * 1000000) // share_ppm) AS BIGINT) AS t FROM s),
      r AS (
        SELECT lang, n, share_ppm,
          CAST(LEAST(1000000,
            (((t.t // 1000000) * share_ppm
              + ((t.t % 1000000) * share_ppm) // 1000000) * 1000000) // n)
            AS BIGINT) AS keep_ppm
        FROM s, t),
      k AS (
        SELECT d.lang, COUNT(*) AS n_kept
        FROM documents d JOIN r USING (lang)
        WHERE ('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT
                % 1000000 < r.keep_ppm
        GROUP BY d.lang)
      SELECT r.lang, CAST(r.n AS BIGINT) AS n_docs, r.share_ppm,
        r.keep_ppm, CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
      FROM r LEFT JOIN k USING (lang)
      ORDER BY lang"""))


  /** Stratified fixed-size sample: 10 docs per source, chosen by
    * lowest id-hash within the stratum. */
  val td_sample_stratified = GraftQuery(
    "td_sample_stratified",
    (s, dir) => {
      Sampling.stratifiedSample(Tables.documents(s, dir), "source", "doc_id", 10)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, source FROM (
      SELECT doc_id, source,
        row_number() OVER (PARTITION BY source
          ORDER BY ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT,
                   doc_id) AS rn
      FROM documents)
      WHERE rn <= 10 ORDER BY doc_id"""))


  /** Domain-mixing weighted sample: per-source keep fractions (the
    * curated/up-weighted vs crawl/down-weighted split every training
    * mix needs), same md5-membership determinism as td_sample_hash. */
  val td_sample_weighted = GraftQuery(
    "td_sample_weighted",
    (s, dir) => {
      Sampling.weightedSample(Tables.documents(s, dir), "doc_id", "source",
        Map("src0" -> 0.5, "src1" -> 0.2), default = 0.05)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some(s"""SELECT doc_id, source FROM documents
      WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT
            < CASE WHEN source = 'src1' THEN ${Sampling.cutoff(0.2)}
                   WHEN source = 'src0' THEN ${Sampling.cutoff(0.5)}
                   ELSE ${Sampling.cutoff(0.05)} END
      ORDER BY doc_id"""))


  /** DSIR-style importance resampling
    * ([[graft.ops.Sampling.importanceSelect]], Xie et al. 2023):
    * sources src0/src1 act as the high-quality TARGET, the other 18
    * sources as the RAW pool; every raw doc is scored by its hashed
    * unigram+bigram profile's smoothed target/raw bucket ratios
    * (scaled-integer, so the whole ranking is cross-engine exact) and
    * the top 50 are kept. The oracle recomputes features, ratios and
    * the rank in SQL with the same md5 buckets. */
  val td_dsir_select = GraftQuery(
    "td_dsir_select",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val raw = docs.filter(!col("source").isin("src0", "src1"))
      val target = docs.filter(col("source").isin("src0", "src1"))
      Sampling.importanceSelect(raw, target, "doc_id", "text",
        k = 50, dim = 64)
        .withColumnRenamed("id", "doc_id")
    },
    Some("""WITH rawd AS (
        SELECT doc_id, text FROM documents WHERE source NOT IN ('src0','src1')),
      tgtd AS (
        SELECT doc_id, text FROM documents WHERE source IN ('src0','src1')),
      rtok AS (
        SELECT doc_id, string_split_regex(trim(text),'\s+') AS t
        FROM rawd WHERE length(trim(text)) > 0),
      ttok AS (
        SELECT doc_id, string_split_regex(trim(text),'\s+') AS t
        FROM tgtd WHERE length(trim(text)) > 0),
      rg AS (
        SELECT doc_id, unnest(t) AS g FROM rtok
        UNION ALL
        SELECT doc_id, unnest(list_transform(range(1, len(t)),
          i -> t[i] || ' ' || t[i+1])) FROM rtok WHERE len(t) >= 2),
      tg AS (
        SELECT doc_id, unnest(t) AS g FROM ttok
        UNION ALL
        SELECT doc_id, unnest(list_transform(range(1, len(t)),
          i -> t[i] || ' ' || t[i+1])) FROM ttok WHERE len(t) >= 2),
      rf AS (
        SELECT doc_id,
          CAST(('0x' || substr(md5(g), 1, 15))::BIGINT % 64 AS INT) AS pos,
          COUNT(*) AS tf
        FROM rg GROUP BY 1, 2),
      rtot AS (SELECT pos, SUM(tf) AS raw_tf FROM rf GROUP BY pos),
      ttot AS (
        SELECT CAST(('0x' || substr(md5(g), 1, 15))::BIGINT % 64 AS INT) AS pos,
          COUNT(*) AS tgt_tf
        FROM tg GROUP BY 1),
      w AS (
        SELECT CAST(b.pos AS INT) AS pos,
          (COALESCE(ttot.tgt_tf, 0) + 1) * 1000000 // (COALESCE(rtot.raw_tf, 0) + 1)
            AS ratio
        FROM (SELECT unnest(range(0, 64)) AS pos) b
        LEFT JOIN ttot ON b.pos = ttot.pos
        LEFT JOIN rtot ON b.pos = rtot.pos),
      scored AS (
        SELECT rf.doc_id, SUM(rf.tf * w.ratio) AS score
        FROM rf JOIN w ON rf.pos = w.pos GROUP BY 1)
      SELECT rawd.doc_id, CAST(COALESCE(scored.score, 0) AS BIGINT) AS score
      FROM rawd LEFT JOIN scored ON rawd.doc_id = scored.doc_id
      ORDER BY score DESC, rawd.doc_id LIMIT 50"""))


  /** Sequence packing: docs → fixed-token-budget training sequences
    * by per-source offset binning (window cumsum, integer-exact). */
  val td_pack_sequences = GraftQuery(
    "td_pack_sequences",
    (s, dir) => {
      graft.ops.Pipeline.packSequences(
        Tables.documents(s, dir), "source", "doc_id", "text", window = 200)
        .withColumnRenamed("bin", "seq_id")
        .orderBy(col("source"), col("seq_id"))
    },
    Some("""WITH t AS (
        SELECT source, doc_id,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text),'\s+')) END AS tok
        FROM documents),
      c AS (
        SELECT source, doc_id, tok,
          SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - tok AS strt
        FROM t)
      SELECT source, CAST(floor(strt / 200.0) AS BIGINT) AS seq_id,
        COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS n_tokens
      FROM c GROUP BY source, seq_id ORDER BY source, seq_id"""))


  /** Per-source token budget: keep docs in id order while the running
    * token total stays under budget (corpus-assembly cutoff). */
  val td_token_budget = GraftQuery(
    "td_token_budget",
    (s, dir) => {
      graft.ops.Pipeline.tokenBudget(
        Tables.documents(s, dir), "source", "doc_id", "text", budget = 1500L)
        .orderBy(col("source"), col("doc_id"))
    },
    Some("""WITH t AS (
        SELECT source, doc_id,
          CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text),'\s+')) END
               AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT source, doc_id, n_tokens,
          CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
            AS cum_tokens
        FROM t)
      SELECT source, doc_id, n_tokens, cum_tokens FROM c
      WHERE cum_tokens <= 1500 ORDER BY source, doc_id"""))


  /** Weighted round-robin interleave of sources into one training
    * stream (first 50 positions). The merge key is one IEEE division
    * of small integers — exact on any engine. */
  val td_interleave = GraftQuery(
    "td_interleave",
    (s, dir) => {
      graft.ops.Pipeline.interleave(
        Tables.documents(s, dir), "source", "doc_id",
        Map("src0" -> 4, "src1" -> 2), limit = 50)
        .orderBy(col("pos"))
    },
    Some("""WITH r AS (
        SELECT source, doc_id,
          row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents),
      k AS (
        SELECT source, doc_id, rn,
          (CAST(rn AS DOUBLE) - 0.5) /
            CASE WHEN source = 'src0' THEN 4.0
                 WHEN source = 'src1' THEN 2.0 ELSE 1.0 END AS ikey
        FROM r WHERE rn <= 50),
      g AS (
        SELECT source, doc_id, rn,
          row_number() OVER (ORDER BY ikey, source, doc_id) AS pos
        FROM k)
      SELECT CAST(pos AS INTEGER) AS pos, source, doc_id,
        CAST(rn AS INTEGER) AS rn
      FROM g WHERE pos <= 50 ORDER BY pos"""))


  /** Deterministic train/val/test split (90/5/5 by id-hash bucket):
    * a doc never migrates between splits on corpus rebuilds. */
  val td_train_split = GraftQuery(
    "td_train_split",
    (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("split", graft.ops.Pipeline.assignSplit(col("doc_id"), 90, 5))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"), col("split"))
    },
    Some("""WITH b AS (
        SELECT source,
          ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT % 100 AS bkt
        FROM documents)
      SELECT source,
        CASE WHEN bkt IS NULL THEN NULL
             WHEN bkt < 90 THEN 'train'
             WHEN bkt < 95 THEN 'val' ELSE 'test' END AS split,
        COUNT(*) AS n_docs
      FROM b GROUP BY 1, 2 ORDER BY source, split"""))


  /** Leakage-safe split ([[graft.ops.Pipeline.leakageSafeSplit]])
    * over the planted near-dup corpus of [[td_dedup_components]]:
    * every doc is split by its dedup cluster's min-id label, so a
    * near-duplicate can never land in test while its copy sits in
    * train; unclustered docs hash their own id, identical to
    * [[td_train_split]]'s plain split. The oracle recomputes the
    * clusters with brute-force Jaccard + a recursive reachability
    * CTE, then applies the same md5 split arithmetic to
    * COALESCE(component, doc_id). */
  val td_split_leakage_safe = GraftQuery(
    "td_split_leakage_safe",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 150)
      val corpus = graft.fixtures.Planted.corpus(d,
        (pmod(col("doc_id"), lit(5)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 1000000L),
          "text" -> concat(col("text"), lit(" xtra wrds"))))
      val pairs = Dedup.minhashNearDuplicates(corpus, "doc_id", "text",
        numHashes = 32, bands = 16, threshold = 0.8)
      Pipeline.leakageSafeSplit(corpus, "doc_id", pairs, 80, 10)
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 150),
      corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL
        SELECT doc_id + 1000000, text || ' xtra wrds' FROM base WHERE doc_id % 5 = 0),
      tok AS (
        SELECT doc_id, string_split_regex(trim(text),'\s+') AS t FROM corpus),
      sh AS (
        SELECT doc_id,
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t)-1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
        FROM tok),
      pairs AS (
        SELECT id_a, id_b FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
              / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        WHERE jaccard >= 0.8),
      edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
      comps AS (
        SELECT u AS doc_id, MIN(v) AS comp FROM reach GROUP BY u),
      keyed AS (
        SELECT c.doc_id, COALESCE(m.comp, c.doc_id) AS k
        FROM corpus c LEFT JOIN comps m ON c.doc_id = m.doc_id),
      b AS (
        SELECT doc_id,
          ('0x'||substr(md5(CAST(k AS VARCHAR)),1,8))::BIGINT % 100 AS bkt
        FROM keyed)
      SELECT doc_id,
        CASE WHEN bkt < 80 THEN 'train'
             WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split
      FROM b ORDER BY doc_id"""))


  /** Deterministic epoch shuffle: hash-sharded, per-shard-ordered
    * training export layout ([[graft.ops.Pipeline.epochShuffle]]). */
  val td_epoch_shuffle = GraftQuery(
    "td_epoch_shuffle",
    (s, dir) => {
      graft.ops.Pipeline.epochShuffle(
        Tables.documents(s, dir).select(col("doc_id")),
        "doc_id", epoch = 7, nShards = 8)
        .select(col("shard"), col("pos"), col("doc_id"))
        .orderBy(col("shard"), col("pos"))
    },
    Some("""WITH h AS (
        SELECT doc_id,
          ('0x'||substr(md5('epoch7:' || CAST(doc_id AS VARCHAR)),1,15))::BIGINT
            AS hv
        FROM documents)
      SELECT CAST(hv % 8 AS INTEGER) AS shard,
        CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id)
          AS INTEGER) AS pos,
        doc_id
      FROM h ORDER BY shard, pos"""))

}
