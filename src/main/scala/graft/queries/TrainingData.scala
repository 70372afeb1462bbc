package graft.queries

import graft.{GraftQuery, Tables}
import graft.ops.{BloomJoin, Dedup, Multimodal, Pipeline, Profiling, Retrieval, Sampling, Similarity, Sketches, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline query surface: dedup, similarity search,
  * text analysis, multimodal plumbing — over the `documents` /
  * `embeddings` fixtures. Oracle-checked wherever the algorithm is
  * SQL-expressible; hash-based ops (minhash LSH) get an oracle on
  * their *verified output* (true-Jaccard-filtered planted pairs).
  */
object TrainingData {

  private val stopwords = Seq("the", "a")
  private val langSets = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("table", "row", "column"),
    "es" -> Seq("data", "value", "query"),
    "fr" -> Seq("join", "merge", "group"))

  val td_text_stats = GraftQuery(
    "td_text_stats",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      d.select(
        (col("doc_id") +:
          TextAnalysis.qualityFeatures(col("text"), stopwords) :+
          TextAnalysis.bpeishTokenCount(col("text")).as("n_subtokens") :+
          TextAnalysis.qualityScore(col("text"), stopwords).as("quality")): _*)
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      length(text) AS n_chars,
      len(string_split_regex(trim(text),'\s+')) AS n_tokens,
      CAST(len(list_distinct(string_split_regex(trim(text),'\s+'))) AS DOUBLE)
        / len(string_split_regex(trim(text),'\s+')) AS type_token_ratio,
      CAST(len(list_filter(string_split_regex(trim(text),'\s+'),
          t -> list_contains(['the','a'], t))) AS DOUBLE)
        / len(string_split_regex(trim(text),'\s+')) AS stopword_ratio,
      CAST(length(regexp_replace(text,'\s','','g')) AS DOUBLE)
        / len(string_split_regex(trim(text),'\s+')) AS mean_token_len,
      len(regexp_extract_all(text,'\w+|[^\w\s]')) AS n_subtokens,
      least(len(string_split_regex(trim(text),'\s+')) / 100.0, 1.0)
        * (CAST(len(list_distinct(string_split_regex(trim(text),'\s+'))) AS DOUBLE)
           / len(string_split_regex(trim(text),'\s+')))
        * (1.0 - CAST(len(list_filter(string_split_regex(trim(text),'\s+'),
             t -> list_contains(['the','a'], t))) AS DOUBLE)
           / len(string_split_regex(trim(text),'\s+'))) AS quality
      FROM documents ORDER BY doc_id"""))

  val td_lang_id = GraftQuery(
    "td_lang_id",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      d.withColumn("lang_pred", TextAnalysis.languageId(col("text"), langSets))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred"))
    },
    Some("""WITH scored AS (
      SELECT
        len(list_filter(string_split_regex(trim(text),'\s+'), t -> list_contains(['the','a','of'], t))) AS s_en,
        len(list_filter(string_split_regex(trim(text),'\s+'), t -> list_contains(['table','row','column'], t))) AS s_de,
        len(list_filter(string_split_regex(trim(text),'\s+'), t -> list_contains(['data','value','query'], t))) AS s_es,
        len(list_filter(string_split_regex(trim(text),'\s+'), t -> list_contains(['join','merge','group'], t))) AS s_fr
      FROM documents)
      SELECT lang_pred, COUNT(*) AS n FROM (
        SELECT CASE
          WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
          WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
          WHEN s_es >= s_en AND s_es >= s_de AND s_es >= s_fr THEN 'es'
          WHEN s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es THEN 'fr'
          ELSE 'en' END AS lang_pred
        FROM scored)
      GROUP BY lang_pred ORDER BY lang_pred"""))

  /** Text-hygiene report ([[graft.ops.TextAnalysis.hygieneReport]])
    * over a corpus with planted encoding damage (every 9th doc gets a
    * U+FFFD + ZWSP + BEL tail, every 13th a decomposed e+combining-
    * acute): replacement/control/zero-width counts and the NFC-change
    * flag — the native [[graft.plans.NfcNormalizeExpression]] vs
    * DuckDB's `nfc_normalize`, value-checked doc by doc. */
  val td_text_hygiene = GraftQuery(
    "td_text_hygiene",
    (s, dir) => {
      val aug = Tables.documents(s, dir).withColumn("text",
        concat(col("text"),
          when(pmod(col("doc_id"), lit(9)) === 0,
            lit(" x\uFFFD\u200B\u0007")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(13)) === 0,
            lit(" e\u0301")).otherwise(lit(""))))
      aug.select(col("doc_id") +:
          TextAnalysis.hygieneReport(col("text")): _*)
        .orderBy(col("doc_id"))
    },
    Some("""WITH aug AS (
        SELECT doc_id, text ||
          CASE WHEN doc_id % 9 = 0
               THEN ' x' || chr(65533) || chr(8203) || chr(7)
               ELSE '' END ||
          CASE WHEN doc_id % 13 = 0 THEN ' e' || chr(769) ELSE '' END
            AS text
        FROM documents)
      SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
        CAST(len(regexp_extract_all(text, '\x{FFFD}')) AS BIGINT)
          AS n_replacement,
        CAST(len(regexp_extract_all(text,
          '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}\x{7F}-\x{9F}]'))
          AS BIGINT) AS n_control,
        CAST(len(regexp_extract_all(text,
          '[\x{200B}\x{200C}\x{200D}\x{FEFF}]')) AS BIGINT)
          AS n_zero_width,
        nfc_normalize(text) <> text AS nfc_changed
      FROM aug ORDER BY doc_id"""))

  /** Span-level language purity ([[graft.ops.TextAnalysis
    * .langPuritySpans]]): code-switch detection over 20-token spans,
    * same stopword-argmax discipline (and tie-break priority) as
    * [[td_lang_id]], integer-ppm purity. */
  val td_lang_purity = GraftQuery(
    "td_lang_purity",
    (s, dir) => {
      TextAnalysis.langPuritySpans(
        Tables.documents(s, dir), "doc_id", "text", langSets,
        spanTokens = 20)
        .orderBy(col("doc_id"))
    },
    Some("""WITH base AS (
        SELECT doc_id, string_split_regex(trim(text),'\s+') AS t,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text),'\s+')) END AS n
        FROM documents),
      tokpos AS (
        SELECT doc_id, (pos - 1) // 20 AS span, t[pos] AS tok
        FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS pos
              FROM base WHERE n > 0)),
      ss AS (
        SELECT doc_id, span,
          SUM(CASE WHEN list_contains(['the','a','of'], tok)
              THEN 1 ELSE 0 END) AS s_en,
          SUM(CASE WHEN list_contains(['table','row','column'], tok)
              THEN 1 ELSE 0 END) AS s_de,
          SUM(CASE WHEN list_contains(['data','value','query'], tok)
              THEN 1 ELSE 0 END) AS s_es,
          SUM(CASE WHEN list_contains(['join','merge','group'], tok)
              THEN 1 ELSE 0 END) AS s_fr
        FROM tokpos GROUP BY 1, 2),
      sl AS (
        SELECT doc_id, span, CASE
          WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
          WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
          WHEN s_es >= s_en AND s_es >= s_de AND s_es >= s_fr THEN 'es'
          WHEN s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es THEN 'fr'
          ELSE 'en' END AS span_lang
        FROM ss),
      agg AS (
        SELECT doc_id, COUNT(*) AS n_spans,
          SUM(CASE WHEN span_lang = 'en' THEN 1 ELSE 0 END) AS c_en,
          SUM(CASE WHEN span_lang = 'de' THEN 1 ELSE 0 END) AS c_de,
          SUM(CASE WHEN span_lang = 'es' THEN 1 ELSE 0 END) AS c_es,
          SUM(CASE WHEN span_lang = 'fr' THEN 1 ELSE 0 END) AS c_fr
        FROM sl GROUP BY 1),
      m AS (
        SELECT doc_id, n_spans,
          CASE
            WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
            WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
            WHEN c_es >= c_en AND c_es >= c_de AND c_es >= c_fr THEN 'es'
            WHEN c_fr >= c_en AND c_fr >= c_de AND c_fr >= c_es THEN 'fr'
            ELSE 'en' END AS lang_major,
          GREATEST(c_en, c_de, c_es, c_fr) AS cmax
        FROM agg)
      SELECT b.doc_id, CAST(COALESCE(m.n_spans, 0) AS BIGINT) AS n_spans,
        COALESCE(m.lang_major, 'en') AS lang_major,
        CAST(CASE WHEN m.n_spans IS NULL THEN 0
             ELSE (m.cmax * 1000000) // m.n_spans END AS BIGINT)
          AS purity_ppm
      FROM base b LEFT JOIN m USING (doc_id)
      ORDER BY b.doc_id"""))

  val td_fingerprint = GraftQuery(
    "td_fingerprint",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      FROM documents ORDER BY doc_id"""))

  /** Duplication profile ([[graft.ops.Dedup.dupProfile]]) over a
    * corpus with planted copy clusters: every 7th doc duplicated
    * once (pairs), every 31st twice more (quads after the 7-overlap)
    * — the cluster-size histogram + removable-mass ppm a dedup pass
    * is budgeted from. */
  val td_dup_profile = GraftQuery(
    "td_dup_profile",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val corpus = d
        .unionByName(d.filter(pmod(col("doc_id"), lit(7)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
        .unionByName(d.filter(pmod(col("doc_id"), lit(31)) === 0)
          .withColumn("doc_id", col("doc_id") + 2000000L))
        .unionByName(d.filter(pmod(col("doc_id"), lit(31)) === 0)
          .withColumn("doc_id", col("doc_id") + 3000000L))
      Dedup.dupProfile(corpus, "text").orderBy(col("bucket"))
    },
    Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 31 = 0
        UNION ALL
        SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 31 = 0),
      cl AS (
        SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
          COUNT(*) AS sz
        FROM corpus GROUP BY 1),
      b AS (
        SELECT CASE WHEN sz <= 1 THEN 1
          ELSE CAST(1 AS BIGINT) << length(bin(CAST(sz - 1 AS BIGINT)))
          END AS bucket, sz
        FROM cl),
      g AS (
        SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_clusters,
          SUM(sz) AS n_docs
        FROM b GROUP BY 1)
      SELECT bucket, CAST(n_clusters AS BIGINT) AS n_clusters,
        CAST(n_docs AS BIGINT) AS n_docs,
        CAST(n_docs - n_clusters AS BIGINT) AS extra_docs,
        CAST((SELECT SUM(n_docs - n_clusters) FROM g) * 1000000
          // (SELECT SUM(n_docs) FROM g) AS BIGINT) AS dup_ppm
      FROM g ORDER BY bucket"""))

  /** Exact dedup over a corpus with planted full copies. */
  val td_dedup_exact = GraftQuery(
    "td_dedup_exact",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val corpus = d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000L))
      Dedup.exact(corpus, "doc_id", "text")
        .select(col("doc_id"), col("n_copies"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
      FROM (SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 1000000, text FROM documents)
      GROUP BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
      ORDER BY doc_id"""))

  /** Character-set Jaccard over within-source pairs (E2-style set
    * algebra on the data plane). min/max are order-free, so exact
    * doubles compare across engines; no float sums.
    */
  val td_char_jaccard = GraftQuery(
    "td_char_jaccard",
    (s, dir) => {
      // prefix-filtered candidate generation + exact bit-parallel
      // residual (Dedup.charJaccardSimilar) — reports the SIMILAR
      // pairs per source, never materializing the all-pairs join the
      // round-3 form used (the one registered plan that died at 100×)
      Dedup.charJaccardSimilar(
        Tables.documents(s, dir), "source", "doc_id", "text", 0.9)
        .groupBy(col("part").as("source"))
        .agg(
          count(lit(1)).as("n_similar"),
          min(col("jac")).as("min_jac"),
          max(col("jac")).as("max_jac"))
        .orderBy(col("source"))
    },
    Some("""WITH pairs AS (
      SELECT a.source, a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_filter(list_distinct(string_split(a.text,'')),
              x -> list_contains(list_distinct(string_split(b.text,'')), x))) AS DOUBLE)
        / len(list_distinct(list_concat(
              list_distinct(string_split(a.text,'')),
              list_distinct(string_split(b.text,''))))) AS jac
      FROM documents a JOIN documents b
        ON a.source = b.source AND a.doc_id < b.doc_id)
      SELECT source, COUNT(*) AS n_similar,
             MIN(jac) AS min_jac, MAX(jac) AS max_jac
      FROM pairs WHERE jac >= 0.9 GROUP BY source ORDER BY source"""))

  /** Brute-force cosine top-5; oracle checks neighbor identity and
    * rank (cosine values agree to ~1e-15 across engines — enough to
    * order distinct neighbors, not enough to hash-compare doubles).
    */
  val td_cosine_topk = GraftQuery(
    "td_cosine_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 20), e, "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        row_number() OVER (PARTITION BY q.vec_id
          ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                   c.vec_id) AS rank
      FROM embeddings q, embeddings c
      WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id)
      WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** MinHash+LSH near-dup detection over a corpus with planted
    * near-copies (2 extra tokens) — plus whatever organic near-dups
    * the corpus contains. The oracle brute-forces true 3-gram Jaccard
    * over ALL pairs of a bounded corpus subset (doc_id < 150, so the
    * O(n²) oracle stays cheap at every sf); LSH (16 bands × 2 rows)
    * recalls j ≥ 0.8 pairs with P(miss) < 1e-7 per pair.
    */
  val td_minhash_neardup = GraftQuery(
    "td_minhash_neardup",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 150)
      val corpus = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(5)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", concat(col("text"), lit(" xtra wrds"))))
      Dedup.minhashNearDuplicates(corpus, "doc_id", "text",
        numHashes = 32, bands = 16, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH base AS (
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
      FROM tok)
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
    WHERE jaccard >= 0.8
    ORDER BY id_a, id_b"""))

  /** Incremental near-dup ([[graft.ops.Dedup.incrementalNearDuplicates]]):
    * the planted copies arrive as a NEW batch probed against a
    * [[graft.ops.Dedup.minhashBandIndex]] of the base corpus —
    * signatures of the base are computed once, never per batch. Same
    * corpus split as [[td_minhash_neardup]], so the oracle is the
    * same brute-force Jaccard restricted to pairs with a new-side
    * member. */
  val td_incremental_neardup = GraftQuery(
    "td_incremental_neardup",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 150)
      val newBatch = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("text", concat(col("text"), lit(" xtra wrds")))
      val index = Dedup.minhashBandIndex(d, "doc_id", "text",
        numHashes = 32, bands = 16)
      Dedup.incrementalNearDuplicates(newBatch, index, "doc_id", "text",
        numHashes = 32, bands = 16, threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH base AS (
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
      FROM tok)
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
    WHERE jaccard >= 0.8 AND id_b >= 1000000
    ORDER BY id_a, id_b"""))

  /** Collection-level near-dup ([[graft.ops.Dedup.groupNearDuplicates]]):
    * a planted wholesale near-copy of src0 (every doc re-appended
    * with two extra words under source "srcX") is found by
    * source-level shingle-set Jaccard; organic cross-source pairs top
    * out ≈0.08, far under the 0.8 threshold. The oracle recomputes
    * per-source distinct shingle sets and exact pairwise Jaccard
    * brute-force. */
  val td_source_neardup = GraftQuery(
    "td_source_neardup",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("source"), col("text"))
      val corpus = d.unionByName(
        d.filter(col("source") === "src0")
          .withColumn("source", lit("srcX"))
          .withColumn("text", concat(col("text"), lit(" xtra wrds"))))
      Dedup.groupNearDuplicates(corpus, "source", "text",
        numHashes = 32, bands = 16, threshold = 0.8)
        .orderBy(col("grp_a"), col("grp_b"))
    },
    Some("""WITH corpus AS (
        SELECT source, text FROM documents
        UNION ALL
        SELECT 'srcX', text || ' xtra wrds' FROM documents WHERE source = 'src0'),
      tok AS (
        SELECT source, string_split_regex(trim(text),'\s+') AS t FROM corpus),
      sh AS (
        SELECT source,
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t)-1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
        FROM tok),
      shdist AS (SELECT DISTINCT source, unnest(s) AS sg FROM sh),
      sizes AS (SELECT source, COUNT(*) AS n FROM shdist GROUP BY source),
      inter AS (
        SELECT a.source AS grp_a, b.source AS grp_b, COUNT(*) AS c
        FROM shdist a JOIN shdist b ON a.sg = b.sg AND a.source < b.source
        GROUP BY 1, 2)
      SELECT grp_a, grp_b,
        CAST(c AS DOUBLE) / (x.n + y.n - c) AS jaccard
      FROM inter
      JOIN sizes x ON grp_a = x.source
      JOIN sizes y ON grp_b = y.source
      WHERE CAST(c AS DOUBLE) / (x.n + y.n - c) >= 0.8
      ORDER BY grp_a, grp_b"""))

  /** Near-dup pairs → dedup clusters: connected components over the
    * minhash near-duplicate graph of the bounded corpus (same corpus
    * and pair semantics as [[td_minhash_neardup]]). The oracle
    * recomputes true-Jaccard pairs and closes them transitively with
    * a recursive CTE — exactly what min-label propagation converges
    * to. */
  val td_dedup_components = GraftQuery(
    "td_dedup_components",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 150)
      val corpus = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(5)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", concat(col("text"), lit(" xtra wrds"))))
      val pairs = Dedup.minhashNearDuplicates(corpus, "doc_id", "text",
        numHashes = 32, bands = 16, threshold = 0.8)
      Dedup.connectedComponents(pairs)
        .select(col("id").as("doc_id"), col("comp").as("component"))
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
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
      SELECT u AS doc_id, MIN(v) AS component
      FROM reach GROUP BY u ORDER BY doc_id"""))

  /** [[td_dedup_components]] recomputed with the alternating
    * large-star/small-star algorithm
    * ([[graft.ops.Dedup.connectedComponentsStar]], Kiveris et al.
    * 2014) instead of min-label propagation — O(log n) rounds
    * independent of graph diameter, the shape that survives
    * chain-shaped dup graphs at corpus scale. Same pair graph, same
    * oracle: both algorithms must converge to the identical
    * min-id-per-component labeling.
    *
    * Oracle assumption (shared with [[td_dedup_components]]): the
    * DuckDB side enumerates ALL pairs with jaccard ≥ 0.8 exhaustively,
    * while the Spark side goes through LSH banding (32 hashes /
    * 16 bands), which can probabilistically miss a true ≥0.8 pair
    * (P[no band collides] = (1−s²)¹⁶ ≈ 2% at s = 0.8). The planted
    * near-dup corpus collides in every band today; if a fixture change
    * ever breaks this hash match with correct code, check banding
    * false-negatives before suspecting the component algorithms. */
  val td_cc_largestar = GraftQuery(
    "td_cc_largestar",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 150)
      val corpus = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(5)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", concat(col("text"), lit(" xtra wrds"))))
      val pairs = Dedup.minhashNearDuplicates(corpus, "doc_id", "text",
        numHashes = 32, bands = 16, threshold = 0.8)
      Dedup.connectedComponentsStar(pairs)
        .select(col("id").as("doc_id"), col("comp").as("component"))
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
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
      SELECT u AS doc_id, MIN(v) AS component
      FROM reach GROUP BY u ORDER BY doc_id"""))

  /** End-to-end dedup ([[graft.ops.Dedup.dedupCorpus]]): the full
    * remove-near-duplicates pipeline over the same planted corpus as
    * [[td_dedup_components]] — LSH pairs → components → keep the
    * lowest-id member per cluster → surviving corpus. The oracle
    * recomputes the pipeline with brute-force Jaccard + a recursive
    * reachability CTE and anti-joins the removed set. */
  val td_dedup_survivors = GraftQuery(
    "td_dedup_survivors",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 150)
      val corpus = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(5)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", concat(col("text"), lit(" xtra wrds"))))
      Dedup.dedupCorpus(corpus, "doc_id", "text",
        numHashes = 32, bands = 16, threshold = 0.8)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE base AS (
        SELECT doc_id, text, source FROM documents WHERE doc_id < 150),
      corpus AS (
        SELECT doc_id, text, source FROM base
        UNION ALL
        SELECT doc_id + 1000000, text || ' xtra wrds', source
        FROM base WHERE doc_id % 5 = 0),
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
      removed AS (
        SELECT u AS doc_id FROM reach GROUP BY u HAVING u > MIN(v))
      SELECT c.doc_id, c.source FROM corpus c
      WHERE c.doc_id NOT IN (SELECT doc_id FROM removed)
      ORDER BY c.doc_id"""))

  /** Sliding-window chunking for embedding prep
    * ([[graft.ops.Pipeline.chunkForEmbedding]]): 16-token windows
    * every 8 tokens (overlapping halves). Empty docs are excluded —
    * the two engines disagree on tokenizing "" ([] vs ['']), and a
    * 0-token doc has nothing to embed. */
  val td_chunk_embed = GraftQuery(
    "td_chunk_embed",
    (s, dir) => {
      graft.ops.Pipeline.chunkForEmbedding(
        Tables.documents(s, dir)
          .filter(col("doc_id") < 100 && length(trim(col("text"))) > 0),
        "doc_id", "text", windowTokens = 16, strideTokens = 8)
        .select(col("id").as("doc_id"), col("chunk_idx"),
          col("chunk"), col("n_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some("""WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents WHERE doc_id < 100 AND length(trim(text)) > 0),
      w AS (
        SELECT doc_id, t,
          CASE WHEN len(t) <= 16 THEN 1
               ELSE CAST(ceil((len(t) - 16) / 8.0) AS INT) + 1 END AS nw
        FROM tok),
      c AS (
        SELECT doc_id, CAST(i AS INT) AS chunk_idx,
               t[CAST(i*8+1 AS INT) : CAST(i*8+16 AS INT)] AS ch
        FROM w, unnest(range(0, nw)) AS u(i))
      SELECT doc_id, chunk_idx, array_to_string(ch, ' ') AS chunk,
             CAST(len(ch) AS INT) AS n_tokens
      FROM c ORDER BY doc_id, chunk_idx"""))

  /** Mean-pooling per group ([[graft.ops.Similarity.meanPoolVectors]])
    * over deterministic integer-valued vectors (exact sums at any
    * aggregation order, so the double means hash-match cross-engine —
    * real float embeddings would diverge in the sum). The library op
    * returns the pooled ARRAY per group; the registered query
    * posexplodes it back to (label, pos, value) SCALARS so the
    * driver's oracle comparator (which cannot hash array cells) gets
    * a verifiable row shape — same information, exploded. */
  val td_mean_pool = GraftQuery(
    "td_mean_pool",
    (s, dir) => {
      val corpus = Tables.embeddings(s, dir).select(
        col("label"),
        transform(sequence(lit(0), lit(7)),
          i => pmod(col("vec_id") * (i + 1), lit(97)).cast("double"))
          .as("v"))
      Similarity.meanPoolVectors(corpus, "label", "v")
        .select(col("label"), posexplode(col("pooled")).as(Seq("pos", "m")))
        .orderBy(col("label"), col("pos"))
    },
    Some("""WITH v AS (
        SELECT label,
          list_transform(range(0, 8),
            i -> CAST((vec_id * (i + 1)) % 97 AS DOUBLE)) AS v
        FROM embeddings),
      e AS (
        SELECT label, CAST(i AS INT) AS pos, v[CAST(i AS INT) + 1] AS x
        FROM v, unnest(range(0, 8)) AS t(i))
      SELECT label, pos, AVG(x) AS m FROM e GROUP BY 1, 2
      ORDER BY label, pos"""))

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

  /** Quality-aware dedup ([[graft.ops.Dedup.dedupCorpusBy]]): same
    * planted corpus as [[td_dedup_survivors]], but the cluster
    * winner is the LONGEST member (score = text length), so the
    * planted "+ xtra wrds" copies beat their originals — the output
    * provably differs from lowest-id selection. */
  val td_dedup_best = GraftQuery(
    "td_dedup_best",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 150)
      val corpus = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(5)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", concat(col("text"), lit(" xtra wrds"))))
        .withColumn("score", length(col("text")))
      Dedup.dedupCorpusBy(corpus, "doc_id", "text", "score",
        numHashes = 32, bands = 16, threshold = 0.8)
        .select(col("doc_id"), col("score"))
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
      comp AS (SELECT u AS doc_id, MIN(v) AS comp FROM reach GROUP BY u),
      scored AS (
        SELECT c.doc_id, comp.comp, length(c.text) AS score
        FROM corpus c JOIN comp ON c.doc_id = comp.doc_id),
      removed AS (
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (
            PARTITION BY comp ORDER BY score DESC, doc_id) AS rk
          FROM scored) WHERE rk > 1)
      SELECT c.doc_id, CAST(length(c.text) AS INTEGER) AS score FROM corpus c
      WHERE c.doc_id NOT IN (SELECT doc_id FROM removed)
      ORDER BY c.doc_id"""))

  /** Canonicalized exact dedup ([[graft.ops.TextAnalysis.canonicalize]]):
    * planted case/punctuation variants collapse onto their originals
    * while plain [[td_dedup_exact]]-style byte-identity would keep
    * them apart. English docs only so case-folding is pure ASCII on
    * both engines. */
  val td_dedup_canonical = GraftQuery(
    "td_dedup_canonical",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .filter(col("lang") === "en" && col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(4)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", concat(upper(col("text")), lit("!!"))))
      Dedup.exact(corpus, "doc_id", "text",
        key = t => md5(TextAnalysis.canonicalize(t)))
        .select(col("doc_id"), col("n_copies"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH base AS (
        SELECT doc_id, text FROM documents WHERE lang = 'en' AND doc_id < 200),
      corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL
        SELECT doc_id + 1000000, upper(text) || '!!' FROM base WHERE doc_id % 4 = 0),
      keyed AS (
        SELECT doc_id, md5(trim(regexp_replace(
          regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
          '\s+', ' ', 'g'))) AS ck
        FROM corpus)
      SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
      FROM keyed GROUP BY ck ORDER BY doc_id"""))

  /** SimHash with md5-derived 60-bit token hashes — same explode +
    * grouped-bit-count plan as the xxhash64 production path
    * ([[graft.ops.Dedup.simhashDf]]), but md5 exists in both engines so
    * the full hash value is oracle-checkable. The production xxhash64
    * form is intentionally NOT registered as a driver query: its bit
    * values are engine-defined (no DuckDB xxhash64), so a value oracle
    * is impossible by construction; it stays covered by OpsSpec
    * ("simhashDf agrees with the column-expression simhash") and
    * AnnQualitySpec, and this query hash-checks the identical plan
    * shape end-to-end.
    */
  val td_simhash_md5 = GraftQuery(
    "td_simhash_md5",
    (s, dir) => {
      Dedup.simhashMd5Df(Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH words AS (
        SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0),
      h AS (
        SELECT doc_id, ('0x'||substr(md5(w),1,15))::BIGINT AS h FROM words),
      cnt AS (SELECT doc_id, COUNT(*) AS n FROM h GROUP BY doc_id),
      bits AS (
        SELECT doc_id, i, SUM((h >> CAST(i AS INTEGER)) & 1) AS ones
        FROM h, UNNEST(range(0, 60)) u(i)
        GROUP BY doc_id, i),
      sim AS (
        SELECT b.doc_id,
          CAST(SUM(CASE WHEN 2*b.ones > c.n
                        THEN (CAST(1 AS BIGINT) << CAST(b.i AS INTEGER))
                        ELSE 0 END) AS BIGINT) AS simhash
        FROM bits b JOIN cnt c USING (doc_id)
        GROUP BY b.doc_id)
      SELECT d.doc_id,
        CASE WHEN d.text IS NULL THEN NULL
             ELSE COALESCE(s.simhash, CAST(0 AS BIGINT)) END AS simhash
      FROM documents d LEFT JOIN sim s USING (doc_id)
      ORDER BY doc_id"""))

  /** Embedding-cosine near-dup pairs over a bounded subset, exact
    * baseline — oracle recomputes with list_cosine_similarity. The
    * 0.8 threshold sits far from the cross-engine double divergence
    * (~1e-15). */
  val td_embedding_neardup = GraftQuery(
    "td_embedding_neardup",
    (s, dir) => {
      // planted exact copies give the threshold something to find:
      // the fixture's organic pairs top out ~0.51 cosine, so without
      // planting this query proved only "nothing ≥ 0.8" (a 0-row
      // match). Copies sit at ≈1.0 — far from the threshold on both
      // sides, immune to cross-engine float divergence.
      val e = Tables.embeddings(s, dir).filter(col("vec_id") < 150)
        .select(col("vec_id"), col("embedding"))
      val corpus = e.unionByName(
        e.filter(pmod(col("vec_id"), lit(3)) === 0)
          .withColumn("vec_id", col("vec_id") + 1000000L))
      Similarity.cosineNearDuplicates(corpus, "vec_id", "embedding", 0.8)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id < 150
        UNION ALL
        SELECT vec_id + 1000000, embedding FROM embeddings
        WHERE vec_id < 150 AND vec_id % 3 = 0)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.8
      ORDER BY id_a, id_b"""))

  /** IVF ANN. The coarse quantizer is deterministic (cell c's centroid
    * = the lowest-id vector with id%nCells = c), so the whole
    * inverted-file search is SQL-expressible: the oracle recomputes
    * centroid choice, cell assignment, nProbe probing, and final
    * ranking. Ranks order on cosine values whose cross-engine
    * divergence (~1e-7, DuckDB sums float lists in float) sits far
    * below the gaps between distinct random vectors.
    */
  val td_ann_ivf = GraftQuery(
    "td_ann_ivf",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.ivfTopK(e.filter(col("vec_id") < 20), e,
        "vec_id", "embedding", 5, nCells = 16, nProbe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH cent AS (
        SELECT CAST(vec_id % 16 AS INTEGER) AS cell,
               arg_min(embedding, vec_id) AS centroid
        FROM embeddings GROUP BY 1),
      ca AS (
        SELECT neighbor_id, cvec, cell FROM (
          SELECT e.vec_id AS neighbor_id, e.embedding AS cvec, c.cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC, c.cell) AS rn
          FROM embeddings e CROSS JOIN cent c)
        WHERE rn = 1),
      qa AS (
        SELECT query_id, qvec, cell FROM (
          SELECT e.vec_id AS query_id, e.embedding AS qvec, c.cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC, c.cell) AS rn
          FROM embeddings e CROSS JOIN cent c
          WHERE e.vec_id < 20)
        WHERE rn <= 4),
      cand AS (
        SELECT DISTINCT query_id, qvec, neighbor_id, cvec
        FROM qa JOIN ca USING (cell)
        WHERE query_id <> neighbor_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id FROM (
        SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY list_cosine_similarity(qvec, cvec) DESC, neighbor_id) AS rank
        FROM cand)
      WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Hard-negative mining ([[graft.ops.Similarity.hardNegatives]]):
    * per anchor, the 5 most-similar embeddings with a DIFFERENT label
    * — contrastive-training data prep over the same IVF candidate
    * shape as [[td_ann_ivf]] (probed cells, never all-pairs), with
    * the label-mismatch filter ahead of the exact cosine. Oracled:
    * the SQL adds the label join + filter to td_ann_ivf's verified
    * IVF chain, so cell assignment, probing, filtering, and ranking
    * all hash-match. */
  val td_hard_negatives = GraftQuery(
    "td_hard_negatives",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.hardNegatives(e.filter(col("vec_id") < 20), e,
        "vec_id", "embedding", "label", k = 5, nCells = 16, nProbe = 4)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH cent AS (
        SELECT CAST(vec_id % 16 AS INTEGER) AS cell,
               arg_min(embedding, vec_id) AS centroid
        FROM embeddings GROUP BY 1),
      ca AS (
        SELECT neighbor_id, cvec, neg_label, cell FROM (
          SELECT e.vec_id AS neighbor_id, e.embedding AS cvec,
            e.label AS neg_label, c.cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC, c.cell) AS rn
          FROM embeddings e CROSS JOIN cent c)
        WHERE rn = 1),
      qa AS (
        SELECT query_id, qvec, anchor_label, cell FROM (
          SELECT e.vec_id AS query_id, e.embedding AS qvec,
            e.label AS anchor_label, c.cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC, c.cell) AS rn
          FROM embeddings e CROSS JOIN cent c
          WHERE e.vec_id < 20)
        WHERE rn <= 4),
      cand AS (
        SELECT DISTINCT query_id, qvec, neighbor_id, cvec
        FROM qa JOIN ca USING (cell)
        WHERE query_id <> neighbor_id AND anchor_label <> neg_label)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id FROM (
        SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY list_cosine_similarity(qvec, cvec) DESC, neighbor_id) AS rank
        FROM cand)
      WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Content-defined chunk dedup ([[graft.ops.TextAnalysis.cdcChunks]]):
    * rolling-hash boundaries anchor chunks to CONTENT, so a planted
    * copy with prepended boilerplate still shares every chunk after
    * the first boundary with its original — the shift-robustness that
    * fixed windows ([[td_chunk_dedup]]) structurally lack. Per doc:
    * chunk count and how many of its chunk instances appear in ≥ 2
    * distinct docs. Edges, chunks, and fingerprints are all
    * md5-derived integers/strings, so the whole segmentation is
    * value-checked cross-engine. Corpus bounded to doc_id < 1000
    * (the td_minhash_neardup discipline): the op hashes every char
    * position — linear, but the densest per-char pipeline registered,
    * so the query form caps its input to keep the bench/oracle cost
    * proportionate at every sf.
    *
    * `chunks` feeds BOTH the shared-count aggregate and the join back,
    * so it is localCheckpointed once (the `cdc_apply_lineitem`
    * discipline for multi-fed subtrees) — without it the plan runs the
    * per-char segmentation twice, which the round-9 audit measured as
    * the suite's heaviest warm query. */
  val td_content_chunks = GraftQuery(
    "td_content_chunks",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      val planted = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("PREFIX-2026 "), col("text")).as("text"))
      val corpus = d.select(col("doc_id"), col("text")).unionByName(planted)
      val chunks = corpus
        .select(col("doc_id"),
          explode(TextAnalysis.cdcChunks(col("text"))).as("c"))
        .select(col("doc_id"), md5(col("c.chunk")).as("fp"))
        .localCheckpoint(eager = false)
      val shared = chunks.groupBy(col("fp"))
        .agg(countDistinct(col("doc_id")).as("nd"))
      chunks.join(shared, Seq("fp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 1000
        UNION ALL
        SELECT doc_id + 1000000, 'PREFIX-2026 ' || text
        FROM documents WHERE doc_id % 5 = 0 AND doc_id < 1000),
      d AS (SELECT doc_id, text, length(text) AS n FROM corpus),
      b AS (
        SELECT doc_id, unnest(bs) AS i FROM (
          SELECT doc_id,
            list_filter(range(8, n + 1), i ->
              ('0x'||substr(md5(substr(text, CAST(i AS INT) - 7, 8)),1,15))::BIGINT
                % 64 = 0) AS bs
          FROM d) t),
      edges AS (
        SELECT d.doc_id,
          list_sort(list_distinct(list_append(
            list_prepend(CAST(0 AS BIGINT), coalesce(lb.l, [])),
            CAST(d.n AS BIGINT)))) AS e
        FROM d LEFT JOIN (
          SELECT doc_id, list(CAST(i AS BIGINT)) AS l FROM b GROUP BY doc_id
        ) lb USING (doc_id)),
      chunks AS (
        SELECT doc_id, unnest(fps) AS fp FROM (
          SELECT e.doc_id,
            list_transform(range(1, len(e.e)), j ->
              md5(substr(d.text, CAST(e.e[j] AS INT) + 1,
                CAST(e.e[j+1] - e.e[j] AS INT)))) AS fps
          FROM edges e JOIN d USING (doc_id)) t),
      sh AS (SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY fp)
      SELECT c.doc_id, COUNT(*) AS n_chunks,
        CAST(SUM(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
      FROM chunks c JOIN sh s USING (fp)
      GROUP BY 1 ORDER BY doc_id"""))

  /** DuckDB boundary predicate of the PRODUCTION rolling hash
    * ([[graft.ops.TextAnalysis.cdcChunksFast]]): the window hash at
    * position `i` is Σⱼ cp(i−7+j)·B^(7−j) mod 2³¹−1 — eight exact
    * integer multiply-adds (each term < 2⁵², sum < 2⁵⁵, no BIGINT
    * overflow), with the B^k constants interpolated from the SAME
    * [[graft.plans.VectorOps.cdcPow]] the compiled loop uses, so the
    * two sides can never desynchronize. */
  private val cdcFastBoundary: String = {
    val terms = (7 to 0 by -1).map { off =>
      val pos = if (off == 0) "CAST(i AS INT)" else s"CAST(i AS INT) - $off"
      s"CAST(ord(substr(text, $pos, 1)) AS BIGINT) * ${graft.plans.VectorOps.cdcPow(off)}"
    }
    s"(${terms.mkString(" + ")}) % ${graft.plans.VectorOps.CdcHashP} % 64 = 0"
  }

  /** Production-speed twin of [[td_content_chunks]]: same corpus, same
    * planted shifted copies, same chunk-sharing report — but boundaries
    * from the Rabin–Karp rolling hash (O(1) per position) instead of an
    * md5 per position. Unlike the simhash/LSH xxhash64 twins, this fast
    * path IS fully oracled: the window hash is plain 64-bit integer
    * arithmetic, so DuckDB recomputes it term-by-term and the whole
    * segmentation hash-matches cross-engine. Proves the production path
    * keeps the shift-robustness property (planted PREFIX copies still
    * share every post-boundary chunk). */
  val td_content_chunks_fast = GraftQuery(
    "td_content_chunks_fast",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 1000)
      val planted = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("PREFIX-2026 "), col("text")).as("text"))
      val corpus = d.select(col("doc_id"), col("text")).unionByName(planted)
      val chunks = corpus
        .select(col("doc_id"),
          explode(TextAnalysis.cdcChunksFast(col("text"))).as("c"))
        .select(col("doc_id"), md5(col("c.chunk")).as("fp"))
        .localCheckpoint(eager = false)
      val shared = chunks.groupBy(col("fp"))
        .agg(countDistinct(col("doc_id")).as("nd"))
      chunks.join(shared, Seq("fp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 1000
        UNION ALL
        SELECT doc_id + 1000000, 'PREFIX-2026 ' || text
        FROM documents WHERE doc_id % 5 = 0 AND doc_id < 1000),
      d AS (SELECT doc_id, text, length(text) AS n FROM corpus),
      b AS (
        SELECT doc_id, unnest(bs) AS i FROM (
          SELECT doc_id,
            list_filter(range(8, n + 1), i -> $cdcFastBoundary) AS bs
          FROM d) t),
      edges AS (
        SELECT d.doc_id,
          list_sort(list_distinct(list_append(
            list_prepend(CAST(0 AS BIGINT), coalesce(lb.l, [])),
            CAST(d.n AS BIGINT)))) AS e
        FROM d LEFT JOIN (
          SELECT doc_id, list(CAST(i AS BIGINT)) AS l FROM b GROUP BY doc_id
        ) lb USING (doc_id)),
      chunks AS (
        SELECT doc_id, unnest(fps) AS fp FROM (
          SELECT e.doc_id,
            list_transform(range(1, len(e.e)), j ->
              md5(substr(d.text, CAST(e.e[j] AS INT) + 1,
                CAST(e.e[j+1] - e.e[j] AS INT)))) AS fps
          FROM edges e JOIN d USING (doc_id)) t),
      sh AS (SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM chunks GROUP BY fp)
      SELECT c.doc_id, COUNT(*) AS n_chunks,
        CAST(SUM(CASE WHEN s.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
      FROM chunks c JOIN sh s USING (fp)
      GROUP BY 1 ORDER BY doc_id"""))

  /** Cross-document boilerplate removal
    * ([[graft.ops.Dedup.removeBoilerplateLines]]): every doc gets a
    * planted nav header + footer; lines in ≥ 3 distinct docs are
    * boilerplate and drop out (the planted lines everywhere, plus
    * organic lines shared by the fixture's duplicate groups), unique
    * content survives byte-for-byte. n_removed ≥ 2 on every doc and
    * the cleaned-text fingerprints are value-checked cross-engine. */
  val td_boilerplate_removal = GraftQuery(
    "td_boilerplate_removal",
    (s, dir) => {
      val corpus = Tables.documents(s, dir).select(col("doc_id"),
        concat(lit("NAV-HEADER\n"), col("text"), lit("\nFOOTER-2026"))
          .as("text"))
      Dedup.removeBoilerplateLines(corpus, "doc_id", "text", minDocs = 3)
        .select(col("id").as("doc_id"), col("n_lines"), col("n_removed"),
          md5(col("cleaned")).as("cleaned_fp"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH corpus AS (
        SELECT doc_id,
          'NAV-HEADER' || chr(10) || text || chr(10) || 'FOOTER-2026' AS text
        FROM documents),
      l AS (
        SELECT doc_id, kv.j AS pos, kv.line AS line FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(ls)+1),
            j -> {'j': j, 'line': ls[j]})) AS kv
          FROM (
            SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus) t
        ) u),
      c AS (
        SELECT md5(line) AS lfp, COUNT(DISTINCT doc_id) AS nd
        FROM l GROUP BY 1),
      j AS (
        SELECT l.doc_id, l.pos, l.line, c.nd
        FROM l JOIN c ON md5(l.line) = c.lfp)
      SELECT doc_id, COUNT(*) AS n_lines,
        CAST(SUM(CASE WHEN nd >= 3 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_removed,
        md5(COALESCE(
          string_agg(CASE WHEN nd < 3 THEN line END, chr(10) ORDER BY pos),
          '')) AS cleaned_fp
      FROM j GROUP BY 1 ORDER BY doc_id"""))

  /** In-engine ANN evaluation ([[graft.ops.Similarity.recallAtK]]):
    * per-query recall@5 of the IVF index against the exact cosine
    * ranking, as exact integers (ppm) — the tuning loop that decides
    * nCells/nProbe on a sample BEFORE a 100 TB index build. Oracled:
    * the SQL computes both rankings (brute-force window +
    * td_ann_ivf's verified chain) and the same join/count. */
  val td_ann_recall = GraftQuery(
    "td_ann_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", 5)
      val approx = Similarity.ivfTopK(q, e, "vec_id", "embedding", 5,
        nCells = 16, nProbe = 4)
      Similarity.recallAtK(exact, approx, 5)
        .orderBy(col("query_id"))
    },
    Some("""WITH exact AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                       c.vec_id) AS rank
          FROM embeddings q, embeddings c
          WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id)
        WHERE rank <= 5),
      cent AS (
        SELECT CAST(vec_id % 16 AS INTEGER) AS cell,
               arg_min(embedding, vec_id) AS centroid
        FROM embeddings GROUP BY 1),
      ca AS (
        SELECT neighbor_id, cvec, cell FROM (
          SELECT e.vec_id AS neighbor_id, e.embedding AS cvec, c.cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC, c.cell) AS rn
          FROM embeddings e CROSS JOIN cent c)
        WHERE rn = 1),
      qa AS (
        SELECT query_id, qvec, cell FROM (
          SELECT e.vec_id AS query_id, e.embedding AS qvec, c.cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC, c.cell) AS rn
          FROM embeddings e CROSS JOIN cent c
          WHERE e.vec_id < 20)
        WHERE rn <= 4),
      cand AS (
        SELECT DISTINCT query_id, qvec, neighbor_id, cvec
        FROM qa JOIN ca USING (cell)
        WHERE query_id <> neighbor_id),
      ivf AS (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY list_cosine_similarity(qvec, cvec) DESC, neighbor_id) AS rank
          FROM cand)
        WHERE rank <= 5)
      SELECT e.query_id AS query_id,
        CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS hits,
        (CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) * 1000000) // LEAST(5, COUNT(*)) AS recall_ppm
      FROM exact e LEFT JOIN ivf i
        ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
      GROUP BY 1 ORDER BY e.query_id"""))

  /** Lloyd k-means codebook training (the trained coarse quantizer an
    * IVF index needs), two iterations, k=8 — EXACT integer-arithmetic
    * centroids so the full training loop (init → assign → update →
    * assign → update → assign) is value-checked cross-engine, not just
    * a single assignment step. */
  val td_kmeans = GraftQuery(
    "td_kmeans",
    (s, dir) => {
      graft.ops.KMeans.train(Tables.embeddings(s, dir),
        "vec_id", "embedding", k = 8, iters = 2)
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))
    },
    Some("""WITH q AS (
        SELECT vec_id AS id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings),
      c0 AS (
        SELECT CAST(id % 8 AS INTEGER) AS cell, arg_min(qv, id) AS s,
          CAST(1 AS BIGINT) AS n
        FROM q GROUP BY 1),
      a1 AS (
        SELECT id, qv, cell FROM (
          SELECT q.id, q.qv, c.cell,
            row_number() OVER (PARTITION BY q.id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> q.qv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM q CROSS JOIN c0 c) WHERE rn = 1),
      s1 AS (
        SELECT cell, list(sv ORDER BY pos) AS s_new FROM (
          SELECT cell, kv.pos AS pos, CAST(SUM(kv.v) AS BIGINT) AS sv
          FROM (SELECT cell, unnest(list_transform(range(1, len(qv)+1),
                  i -> {'pos': i, 'v': qv[i]})) AS kv FROM a1) t
          GROUP BY cell, kv.pos) t2
        GROUP BY cell),
      n1 AS (SELECT cell, COUNT(*) AS n_new FROM a1 GROUP BY cell),
      c1 AS (
        SELECT c0.cell, COALESCE(s1.s_new, c0.s) AS s,
          CAST(COALESCE(n1.n_new, c0.n) AS BIGINT) AS n
        FROM c0 LEFT JOIN s1 USING (cell) LEFT JOIN n1 USING (cell)),
      a2 AS (
        SELECT id, qv, cell FROM (
          SELECT q.id, q.qv, c.cell,
            row_number() OVER (PARTITION BY q.id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> q.qv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM q CROSS JOIN c1 c) WHERE rn = 1),
      s2 AS (
        SELECT cell, list(sv ORDER BY pos) AS s_new FROM (
          SELECT cell, kv.pos AS pos, CAST(SUM(kv.v) AS BIGINT) AS sv
          FROM (SELECT cell, unnest(list_transform(range(1, len(qv)+1),
                  i -> {'pos': i, 'v': qv[i]})) AS kv FROM a2) t
          GROUP BY cell, kv.pos) t2
        GROUP BY cell),
      n2 AS (SELECT cell, COUNT(*) AS n_new FROM a2 GROUP BY cell),
      c2 AS (
        SELECT c1.cell, COALESCE(s2.s_new, c1.s) AS s,
          CAST(COALESCE(n2.n_new, c1.n) AS BIGINT) AS n
        FROM c1 LEFT JOIN s2 USING (cell) LEFT JOIN n2 USING (cell)),
      a3 AS (
        SELECT id, cell FROM (
          SELECT q.id, c.cell,
            row_number() OVER (PARTITION BY q.id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> q.qv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM q CROSS JOIN c2 c) WHERE rn = 1)
      SELECT id AS vec_id, CAST(cell AS INTEGER) AS cluster
      FROM a3 ORDER BY vec_id"""))

  /** IVF ANN over the TRAINED k-means codebook ([[td_kmeans]]'s exact
    * training loop feeding [[graft.ops.KMeans.ivfTrainedTopK]]) — the
    * full production ANN path (train → assign → probe → rank) is
    * value-checked end to end. */
  val td_ann_ivf_trained = GraftQuery(
    "td_ann_ivf_trained",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      graft.ops.KMeans.ivfTrainedTopK(e.filter(col("vec_id") < 20), e,
        "vec_id", "embedding", topK = 5, kCells = 8, iters = 2, nProbe = 3)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH q AS (
        SELECT vec_id AS id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings),
      c0 AS (
        SELECT CAST(id % 8 AS INTEGER) AS cell, arg_min(qv, id) AS s,
          CAST(1 AS BIGINT) AS n
        FROM q GROUP BY 1),
      a1 AS (
        SELECT id, qv, cell FROM (
          SELECT q.id, q.qv, c.cell,
            row_number() OVER (PARTITION BY q.id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> q.qv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM q CROSS JOIN c0 c) WHERE rn = 1),
      s1 AS (
        SELECT cell, list(sv ORDER BY pos) AS s_new FROM (
          SELECT cell, kv.pos AS pos, CAST(SUM(kv.v) AS BIGINT) AS sv
          FROM (SELECT cell, unnest(list_transform(range(1, len(qv)+1),
                  i -> {'pos': i, 'v': qv[i]})) AS kv FROM a1) t
          GROUP BY cell, kv.pos) t2
        GROUP BY cell),
      n1 AS (SELECT cell, COUNT(*) AS n_new FROM a1 GROUP BY cell),
      c1 AS (
        SELECT c0.cell, COALESCE(s1.s_new, c0.s) AS s,
          CAST(COALESCE(n1.n_new, c0.n) AS BIGINT) AS n
        FROM c0 LEFT JOIN s1 USING (cell) LEFT JOIN n1 USING (cell)),
      a2 AS (
        SELECT id, qv, cell FROM (
          SELECT q.id, q.qv, c.cell,
            row_number() OVER (PARTITION BY q.id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> q.qv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM q CROSS JOIN c1 c) WHERE rn = 1),
      s2 AS (
        SELECT cell, list(sv ORDER BY pos) AS s_new FROM (
          SELECT cell, kv.pos AS pos, CAST(SUM(kv.v) AS BIGINT) AS sv
          FROM (SELECT cell, unnest(list_transform(range(1, len(qv)+1),
                  i -> {'pos': i, 'v': qv[i]})) AS kv FROM a2) t
          GROUP BY cell, kv.pos) t2
        GROUP BY cell),
      n2 AS (SELECT cell, COUNT(*) AS n_new FROM a2 GROUP BY cell),
      c2 AS (
        SELECT c1.cell, COALESCE(s2.s_new, c1.s) AS s,
          CAST(COALESCE(n2.n_new, c1.n) AS BIGINT) AS n
        FROM c1 LEFT JOIN s2 USING (cell) LEFT JOIN n2 USING (cell)),
      a3 AS (
        SELECT id, cell FROM (
          SELECT q.id, c.cell,
            row_number() OVER (PARTITION BY q.id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> q.qv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM q CROSS JOIN c2 c) WHERE rn = 1),
      qs AS (
        SELECT vec_id AS query_id, embedding AS qvec,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qqv
        FROM embeddings WHERE vec_id < 20),
      probes AS (
        SELECT query_id, qvec, cell FROM (
          SELECT qs.query_id, qs.qvec, c.cell,
            row_number() OVER (PARTITION BY qs.query_id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> qs.qqv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM qs CROSS JOIN c2 c) WHERE rn <= 3),
      cvecs AS (
        SELECT a3.id AS neighbor_id, e.embedding AS cvec, a3.cell
        FROM a3 JOIN embeddings e ON e.vec_id = a3.id),
      cand AS (
        SELECT query_id, qvec, neighbor_id, cvec
        FROM probes JOIN cvecs USING (cell)
        WHERE query_id <> neighbor_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id FROM (
        SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY list_cosine_similarity(qvec, cvec) DESC, neighbor_id)
            AS rank
        FROM cand)
      WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** The PERSISTED-index form of [[td_ann_ivf_trained]]
    * ([[graft.ops.IvfIndex]]): train → write centroids + cell-
    * partitioned postings to parquet → probe the stored index. Same
    * params, same math, so it shares td_ann_ivf_trained's oracle —
    * which makes the round-trip itself (partition-column typing,
    * inverted-list layout, frozen-codebook probe) hash-checked. The
    * staging dir is keyed by applicationId + data dir so concurrent
    * sessions and scale factors never collide (the same staging
    * discipline as q20_partition_prune). */
  val td_ann_ivf_indexed = GraftQuery(
    "td_ann_ivf_indexed",
    (s, dir) => {
      val stage = s"${System.getProperty("java.io.tmpdir")}/graft_ivfidx_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val e = Tables.embeddings(s, dir)
      graft.ops.IvfIndex.build(e, "vec_id", "embedding", stage,
        kCells = 8, iters = 2)
      graft.ops.IvfIndex.query(e.filter(col("vec_id") < 20),
        "vec_id", "embedding", stage, topK = 5, nProbe = 3)
        .orderBy(col("query_id"), col("rank"))
    },
    td_ann_ivf_trained.oracle)

  /** Product-quantization ADC top-k ([[graft.ops.ProductQuant]]):
    * encode 64-dim vectors as M=4 one-byte codes, score candidates via
    * the asymmetric-distance lookup table — all integer arithmetic, so
    * the full encode → score → rank pipeline is value-checked. */
  val td_pq_adc = GraftQuery(
    "td_pq_adc",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cb = graft.ops.ProductQuant.standInCodebook(
        e, "vec_id", "embedding", dim = 64, m = 4, k = 8)
      val codes = graft.ops.ProductQuant.encode(
        e, cb, "vec_id", "embedding", dim = 64, m = 4)
      graft.ops.ProductQuant.adcTopK(
        e.filter(col("vec_id") < 20), codes, cb,
        "vec_id", "embedding", dim = 64, m = 4, topK = 5)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH q AS (
        SELECT vec_id AS id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings),
      subs AS (
        SELECT id, s.sub AS sub, s.v AS xvec FROM (
          SELECT id, unnest(list_transform(range(0, 4),
            i -> {'sub': i, 'v': list_slice(qv, i*16 + 1, i*16 + 16)})) AS s
          FROM q) t),
      cb AS (
        SELECT sub, code, cvec FROM (
          SELECT sub, CAST(id % 8 AS INTEGER) AS code, xvec AS cvec,
            row_number() OVER (PARTITION BY sub, id % 8 ORDER BY id) AS rn
          FROM subs) WHERE rn = 1),
      enc AS (
        SELECT id, sub, code FROM (
          SELECT s.id, s.sub, c.code,
            row_number() OVER (PARTITION BY s.id, s.sub ORDER BY
              list_sum(list_transform(range(1, len(c.cvec)+1),
                i -> c.cvec[i] * c.cvec[i]))
              - 2 * list_sum(list_transform(range(1, len(c.cvec)+1),
                i -> s.xvec[i] * c.cvec[i])),
              c.code) AS rn
          FROM subs s JOIN cb c USING (sub)) WHERE rn = 1),
      partial AS (
        SELECT qs.id AS query_id, qs.sub, c.code,
          list_sum(list_transform(range(1, len(c.cvec)+1),
            i -> qs.xvec[i] * c.cvec[i])) AS p
        FROM (SELECT * FROM subs WHERE id < 20) qs
        JOIN cb c USING (sub)),
      scored AS (
        SELECT p.query_id, e.id AS neighbor_id,
          CAST(SUM(p.p) AS BIGINT) AS adc_score
        FROM enc e JOIN partial p ON p.sub = e.sub AND p.code = e.code
        WHERE p.query_id <> e.id
        GROUP BY 1, 2)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
        adc_score FROM (
        SELECT query_id, neighbor_id, adc_score,
          row_number() OVER (PARTITION BY query_id
            ORDER BY adc_score DESC, neighbor_id) AS rank
        FROM scored) WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** IVF+PQ composed index ([[graft.ops.ProductQuant.ivfAdcTopK]]) —
    * oracled END TO END: the SQL chains td_ann_ivf_trained's exact
    * 2-iteration k-means (coarse quantizer + probes) into td_pq_adc's
    * codebook/encode/ADC scoring, all in the same exact integer
    * arithmetic, so the full production composition (train → assign →
    * probe → code → ADC-rank) is value-checked, not just its parts.
    * AnnQualitySpec additionally pins a recall floor. */
  val td_ann_ivfpq = GraftQuery(
    "td_ann_ivfpq",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      graft.ops.ProductQuant.ivfAdcTopK(e.filter(col("vec_id") < 20), e,
        "vec_id", "embedding", dim = 64, m = 4, k = 8, topK = 5,
        kCells = 8, iters = 2, nProbe = 3)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH q AS (
        SELECT vec_id AS id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings),
      c0 AS (
        SELECT CAST(id % 8 AS INTEGER) AS cell, arg_min(qv, id) AS s,
          CAST(1 AS BIGINT) AS n
        FROM q GROUP BY 1),
      a1 AS (
        SELECT id, qv, cell FROM (
          SELECT q.id, q.qv, c.cell,
            row_number() OVER (PARTITION BY q.id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> q.qv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM q CROSS JOIN c0 c) WHERE rn = 1),
      s1 AS (
        SELECT cell, list(sv ORDER BY pos) AS s_new FROM (
          SELECT cell, kv.pos AS pos, CAST(SUM(kv.v) AS BIGINT) AS sv
          FROM (SELECT cell, unnest(list_transform(range(1, len(qv)+1),
                  i -> {'pos': i, 'v': qv[i]})) AS kv FROM a1) t
          GROUP BY cell, kv.pos) t2
        GROUP BY cell),
      n1 AS (SELECT cell, COUNT(*) AS n_new FROM a1 GROUP BY cell),
      c1 AS (
        SELECT c0.cell, COALESCE(s1.s_new, c0.s) AS s,
          CAST(COALESCE(n1.n_new, c0.n) AS BIGINT) AS n
        FROM c0 LEFT JOIN s1 USING (cell) LEFT JOIN n1 USING (cell)),
      a2 AS (
        SELECT id, qv, cell FROM (
          SELECT q.id, q.qv, c.cell,
            row_number() OVER (PARTITION BY q.id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> q.qv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM q CROSS JOIN c1 c) WHERE rn = 1),
      s2 AS (
        SELECT cell, list(sv ORDER BY pos) AS s_new FROM (
          SELECT cell, kv.pos AS pos, CAST(SUM(kv.v) AS BIGINT) AS sv
          FROM (SELECT cell, unnest(list_transform(range(1, len(qv)+1),
                  i -> {'pos': i, 'v': qv[i]})) AS kv FROM a2) t
          GROUP BY cell, kv.pos) t2
        GROUP BY cell),
      n2 AS (SELECT cell, COUNT(*) AS n_new FROM a2 GROUP BY cell),
      c2 AS (
        SELECT c1.cell, COALESCE(s2.s_new, c1.s) AS s,
          CAST(COALESCE(n2.n_new, c1.n) AS BIGINT) AS n
        FROM c1 LEFT JOIN s2 USING (cell) LEFT JOIN n2 USING (cell)),
      a3 AS (
        SELECT id, cell FROM (
          SELECT q.id, c.cell,
            row_number() OVER (PARTITION BY q.id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> q.qv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM q CROSS JOIN c2 c) WHERE rn = 1),
      subs AS (
        SELECT id, s.sub AS sub, s.v AS xvec FROM (
          SELECT id, unnest(list_transform(range(0, 4),
            i -> {'sub': i, 'v': list_slice(qv, i*16 + 1, i*16 + 16)})) AS s
          FROM q) t),
      cb AS (
        SELECT sub, code, cvec FROM (
          SELECT sub, CAST(id % 8 AS INTEGER) AS code, xvec AS cvec,
            row_number() OVER (PARTITION BY sub, id % 8 ORDER BY id) AS rn
          FROM subs) WHERE rn = 1),
      enc AS (
        SELECT id, sub, code FROM (
          SELECT s.id, s.sub, c.code,
            row_number() OVER (PARTITION BY s.id, s.sub ORDER BY
              list_sum(list_transform(range(1, len(c.cvec)+1),
                i -> c.cvec[i] * c.cvec[i]))
              - 2 * list_sum(list_transform(range(1, len(c.cvec)+1),
                i -> s.xvec[i] * c.cvec[i])),
              c.code) AS rn
          FROM subs s JOIN cb c USING (sub)) WHERE rn = 1),
      codes AS (
        SELECT e.id, e.sub, e.code, a3.cell
        FROM enc e JOIN a3 ON a3.id = e.id),
      qs AS (
        SELECT vec_id AS query_id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qqv
        FROM embeddings WHERE vec_id < 20),
      probes AS (
        SELECT query_id, qqv, cell FROM (
          SELECT qs.query_id, qs.qqv, c.cell,
            row_number() OVER (PARTITION BY qs.query_id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> qs.qqv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM qs CROSS JOIN c2 c) WHERE rn <= 3),
      qsubs AS (
        SELECT query_id, cell, s.sub AS sub, s.v AS xvec FROM (
          SELECT query_id, cell, unnest(list_transform(range(0, 4),
            i -> {'sub': i, 'v': list_slice(qqv, i*16 + 1, i*16 + 16)})) AS s
          FROM probes) t),
      partial AS (
        SELECT p.query_id, p.cell, p.sub, c.code,
          list_sum(list_transform(range(1, len(c.cvec)+1),
            i -> p.xvec[i] * c.cvec[i])) AS p
        FROM qsubs p JOIN cb c USING (sub)),
      scored AS (
        SELECT p.query_id, k.id AS neighbor_id,
          CAST(SUM(p.p) AS BIGINT) AS adc_score
        FROM codes k JOIN partial p
          ON p.cell = k.cell AND p.sub = k.sub AND p.code = k.code
        WHERE p.query_id <> k.id
        GROUP BY 1, 2)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
        adc_score FROM (
        SELECT query_id, neighbor_id, adc_score,
          row_number() OVER (PARTITION BY query_id
            ORDER BY adc_score DESC, neighbor_id) AS rank
        FROM scored) WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** Multi-table sign-LSH with md5-derived integer planes
    * ([[graft.ops.Similarity.lshTopKMd5]]): the oracled form of LSH
    * ANN — the DuckDB side recomputes the identical plane matrix from
    * its own md5 and the sign dots are exact integer arithmetic, so
    * buckets, collisions, and ranks all hash-match. The production
    * path ([[graft.ops.Similarity.lshTopK]], xxhash64-seeded Gaussian
    * planes) is intentionally NOT registered as a driver query: its
    * buckets are engine-defined, so a value oracle is impossible by
    * construction; it stays covered by OpsSpec ("lshTopK cosines agree
    * with the exhaustive ranking") and AnnQualitySpec's recall floor
    * (0.33 at the same table/probe budget as this query's 0.36), and
    * this query hash-checks the same bucket/collision/rank pipeline. */
  val td_ann_lsh_md5 = GraftQuery(
    "td_ann_lsh_md5",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.lshTopKMd5(e.filter(col("vec_id") < 20), e,
        "vec_id", "embedding", k = 5, dim = 64,
        numPlanes = 8, numTables = 8)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH q AS (
        SELECT vec_id AS id, embedding AS v,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings),
      planes AS (
        SELECT t, p, j,
          ('0x' || substr(md5(CAST(t AS VARCHAR) || ',' ||
              CAST(p AS VARCHAR) || ',' || CAST(j AS VARCHAR)), 1, 15))::BIGINT
            % 1000001 - 500000 AS c
        FROM range(8) tt(t), range(8) pp(p), range(64) jj(j)),
      dots AS (
        SELECT q.id, pl.t, pl.p,
          SUM(q.qv[CAST(pl.j AS INT) + 1] * pl.c) AS d
        FROM q CROSS JOIN planes pl
        GROUP BY 1, 2, 3),
      buckets AS (
        SELECT id, t,
          SUM(CASE WHEN d > 0 THEN (1::BIGINT << CAST(p AS INT))
              ELSE 0 END) AS bucket
        FROM dots GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT qb.id AS query_id, cb.id AS neighbor_id
        FROM buckets qb JOIN buckets cb
          ON qb.t = cb.t AND cb.bucket IN
            (qb.bucket, xor(qb.bucket, 1), xor(qb.bucket, 2))
        WHERE qb.id < 20 AND qb.id <> cb.id),
      scored AS (
        SELECT c.query_id, c.neighbor_id,
          list_cosine_similarity(a.v, b.v) AS cos
        FROM cand c
        JOIN q a ON a.id = c.query_id
        JOIN q b ON b.id = c.neighbor_id)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id FROM (
        SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored) WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** EXACT n-gram Jaccard near-dup pairs via prefix-filtered
    * candidates ([[Dedup.ngramJaccardSimilar]]) — the deterministic
    * sibling of [[td_minhash_neardup]]: same corpus, same brute-force
    * oracle, but the engine side is exact (prefix filtering is
    * lossless), so the oracle match proves the candidate generation
    * misses NOTHING — not just the planted pairs. */
  val td_ngram_jaccard = GraftQuery(
    "td_ngram_jaccard",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 150)
      val corpus = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(5)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", concat(col("text"), lit(" xtra wrds"))))
      Dedup.ngramJaccardSimilar(corpus, "doc_id", "text", n = 3,
        threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH base AS (
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
      FROM tok)
    SELECT id_a, id_b, jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
    WHERE jaccard >= 0.8
    ORDER BY id_a, id_b"""))

  /** Duplicated-n-gram span coverage (word-level substring-dedup
    * signal, Lee et al. 2022) over a corpus with planted full copies
    * (doc_id % 7 → +1e6 twin) and a shared 8-token tail (corpus
    * doc_id % 10). Coverage merges overlapping spans so each word
    * counts once; dup_ppm is exact integer arithmetic.
    */
  val td_dup_spans = GraftQuery(
    "td_dup_spans",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(7)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      val aug = corpus.withColumn("text",
        when(pmod(col("doc_id"), lit(10)) === 0,
          concat(col("text"), lit(" zz yy xx ww vv uu tt ss")))
          .otherwise(col("text")))
      Dedup.duplicatedSpans(aug, "doc_id", "text", n = 5)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0),
      aug AS (
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 0
               THEN text || ' zz yy xx ww vv uu tt ss' ELSE text END AS text
        FROM corpus),
      base AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        FROM aug),
      grams AS (
        SELECT doc_id, pos,
          t[pos]||' '||t[pos+1]||' '||t[pos+2]||' '||t[pos+3]||' '||t[pos+4] AS gram
        FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS pos
              FROM base WHERE n_tokens >= 5)),
      dup AS (
        SELECT gram FROM grams GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2),
      spans AS (
        SELECT doc_id, pos, pos + 4 AS e FROM grams JOIN dup USING (gram)),
      isl AS (
        SELECT doc_id, pos, e,
          MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        FROM spans),
      isl2 AS (
        SELECT doc_id, pos, e,
          SUM(CASE WHEN pme IS NULL OR pos > pme THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM isl),
      cov AS (
        SELECT doc_id, island, MAX(e) - MIN(pos) + 1 AS cov
        FROM isl2 GROUP BY 1, 2),
      dc AS (SELECT doc_id, SUM(cov) AS dup_tokens FROM cov GROUP BY 1)
      SELECT b.doc_id, CAST(b.n_tokens AS INTEGER) AS n_tokens,
        CAST(COALESCE(dc.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        CASE WHEN b.n_tokens = 0 THEN 0
             ELSE CAST(COALESCE(dc.dup_tokens, 0) AS BIGINT) * 1000000
                    // b.n_tokens END AS dup_ppm
      FROM base b LEFT JOIN dc USING (doc_id)
      ORDER BY doc_id"""))

  /** The transform counterpart of [[td_dup_spans]]: documents
    * rewritten with duplicated spans removed, full values pinned by
    * md5; full copies collapse to empty text. */
  val td_dup_span_removal = GraftQuery(
    "td_dup_span_removal",
    (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(7)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      val aug = corpus.withColumn("text",
        when(pmod(col("doc_id"), lit(10)) === 0,
          concat(col("text"), lit(" zz yy xx ww vv uu tt ss")))
          .otherwise(col("text")))
      Dedup.removeDuplicatedSpans(aug, "doc_id", "text", n = 5)
        .select(col("id").as("doc_id"),
          md5(col("clean_text")).as("clean_md5"),
          col("n_tokens"), col("n_kept"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0),
      aug AS (
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 0
               THEN text || ' zz yy xx ww vv uu tt ss' ELSE text END AS text
        FROM corpus),
      base AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        FROM aug),
      grams AS (
        SELECT doc_id, pos,
          t[pos]||' '||t[pos+1]||' '||t[pos+2]||' '||t[pos+3]||' '||t[pos+4] AS gram
        FROM (SELECT doc_id, t, unnest(range(1, len(t) - 3)) AS pos
              FROM base WHERE n_tokens >= 5)),
      dup AS (
        SELECT gram FROM grams GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2),
      spans AS (
        SELECT doc_id, pos, pos + 4 AS e FROM grams JOIN dup USING (gram)),
      isl AS (
        SELECT doc_id, pos, e,
          MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        FROM spans),
      isl2 AS (
        SELECT doc_id, pos, e,
          SUM(CASE WHEN pme IS NULL OR pos > pme THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM isl),
      ivl AS (
        SELECT doc_id, island, MIN(pos) AS s, MAX(e) AS e
        FROM isl2 GROUP BY 1, 2),
      toks AS (
        SELECT doc_id, pos, t[pos] AS tok
        FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS pos
              FROM base WHERE n_tokens > 0)),
      kept AS (
        SELECT tk.doc_id, tk.pos, tk.tok FROM toks tk
        WHERE NOT EXISTS (SELECT 1 FROM ivl v
          WHERE v.doc_id = tk.doc_id AND tk.pos >= v.s AND tk.pos <= v.e)),
      rebuilt AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
          COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id)
      SELECT b.doc_id, md5(COALESCE(r.clean_text, '')) AS clean_md5,
        CAST(b.n_tokens AS INTEGER) AS n_tokens,
        CAST(COALESCE(r.n_kept, 0) AS INTEGER) AS n_kept
      FROM base b LEFT JOIN rebuilt r USING (doc_id)
      ORDER BY b.doc_id"""))

  /** Edit-distance near-dup ([[graft.ops.Dedup
    * .editDistanceNearDuplicates]]): shingle-Jaccard blocking
    * (recall-complete for the edit bound, see the op's scaladoc) +
    * exact levenshtein residual, over planted 5-char-suffix twins on
    * a bounded subset. */
  val td_edit_neardup = GraftQuery(
    "td_edit_neardup",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(5)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", concat(col("text"), lit(" ver2"))))
      Dedup.editDistanceNearDuplicates(corpus, "doc_id", "text",
        maxDist = 10, shingleN = 3, jaccardFloor = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 150),
      corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL
        SELECT doc_id + 1000000, text || ' ver2' FROM base
        WHERE doc_id % 5 = 0),
      sh AS (
        SELECT doc_id, text,
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t)-1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
        FROM (SELECT doc_id, text,
                string_split_regex(trim(text), '\s+') AS t
              FROM corpus)),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          a.text AS ta, b.text AS tb,
          CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b,
        CAST(levenshtein(ta, tb) AS INTEGER) AS edit_dist
      FROM pairs
      WHERE jaccard >= 0.5 AND levenshtein(ta, tb) <= 10
      ORDER BY id_a, id_b"""))

  /** Fuzzy decontamination ([[graft.ops.Dedup.fuzzyContaminatedDocs]]):
    * the benchmark is every doc_id<25 text with a 1-token suffix, so
    * the contaminated docs match fuzzily (jaccard < 1) — exactly the
    * paraphrase case exact shingle-counting understates. Blocking is
    * lossless, so the brute-force oracle matches exactly. */
  val td_fuzzy_decontam = GraftQuery(
    "td_fuzzy_decontam",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val bench = d.filter(col("doc_id") < 25)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          concat(col("text"), lit(" bm")).as("text"))
      Dedup.fuzzyContaminatedDocs(d, bench, "doc_id", "text",
        n = 3, threshold = 0.7)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH bench AS (
        SELECT doc_id + 5000000 AS bench_id, text || ' bm' AS text
        FROM documents WHERE doc_id < 25),
      csh AS (
        SELECT doc_id,
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t)-1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents)),
      bsh AS (
        SELECT bench_id,
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t)-1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
        FROM (SELECT bench_id, string_split_regex(trim(text), '\s+') AS t
              FROM bench)),
      pairs AS (
        SELECT c.doc_id, b.bench_id,
          CAST(len(list_filter(c.s, x -> list_contains(b.s, x))) AS DOUBLE)
            / len(list_distinct(list_concat(c.s, b.s))) AS jaccard
        FROM csh c CROSS JOIN bsh b)
      SELECT doc_id, bench_id, jaccard FROM (
        SELECT doc_id, bench_id, jaccard,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY jaccard DESC, bench_id) AS rn
        FROM pairs WHERE jaccard >= 0.7)
      WHERE rn = 1 ORDER BY doc_id"""))

  /** Semantic decontamination
    * ([[graft.ops.Similarity.semanticContamination]]): the embedding
    * sibling of td_decontam/td_fuzzy_decontam — catches the leakage
    * class n-grams structurally miss (paraphrase, translation, format
    * shuffle). Benchmark = 15 verbatim vector copies re-id'd above
    * 5000, so every contaminated doc scores cosine ≈ 1.0 against its
    * copy while the fixture's organic pairs top out ~0.51 — both far
    * from the 0.8 threshold, immune to cross-engine float divergence
    * (the td_embedding_neardup disposition; `cos` itself is excluded
    * from the output). Each flagged doc has exactly one match, so the
    * best-match tie-break never rides on float ordering. */
  val td_semantic_decontam = GraftQuery(
    "td_semantic_decontam",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"))
      val corpus = e.filter(col("vec_id") < 400)
      val bench = e.filter(col("vec_id") < 100 &&
          pmod(col("vec_id"), lit(7)) === 0)
        .select((col("vec_id") + 5000L).as("bench_id"),
          col("embedding").as("bvec"))
      Similarity.semanticContamination(corpus, "vec_id", "embedding",
          bench, "bench_id", "bvec", threshold = 0.8)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH bench AS (
        SELECT vec_id + 5000 AS bench_id, embedding FROM embeddings
        WHERE vec_id < 100 AND vec_id % 7 = 0),
      m AS (
        SELECT c.vec_id AS doc_id, b.bench_id,
          list_cosine_similarity(c.embedding, b.embedding) AS cos
        FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 400) c
        CROSS JOIN bench b)
      SELECT doc_id, bench_id, n_matches FROM (
        SELECT doc_id, bench_id,
          CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_matches,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY cos DESC, bench_id) AS rn
        FROM m WHERE cos >= 0.8)
      WHERE rn = 1 ORDER BY doc_id"""))

  /** Gopher line-level repetition
    * ([[graft.ops.TextAnalysis.lineRepetitionSignals]]): documents
    * get newline structure planted from substrings — the third line
    * repeats the first — so duplicate-line counts are nonzero.
    * Integer outputs only (fractions are numerator/denominator),
    * exact cross-engine. */
  val td_line_repetition = GraftQuery(
    "td_line_repetition",
    (s, dir) => {
      val planted = concat(
        substring(col("text"), 1, 40), lit("\n"),
        substring(col("text"), 41, 40), lit("\n"),
        substring(col("text"), 1, 40), lit("\n"),
        substring(col("text"), 81, 40))
      Tables.documents(s, dir)
        .select((col("doc_id") +:
          TextAnalysis.lineRepetitionSignals(planted)): _*)
        .orderBy(col("doc_id"))
    },
    Some("""WITH base AS (
        SELECT doc_id,
          substr(text,1,40) || chr(10) || substr(text,41,40) || chr(10) ||
          substr(text,1,40) || chr(10) || substr(text,81,40) AS text
        FROM documents),
      l AS (
        SELECT doc_id,
          list_transform(list_filter(string_split(text, chr(10)),
            x -> length(trim(x)) > 0), x -> trim(x)) AS lines
        FROM base)
      SELECT doc_id,
        CAST(len(lines) AS BIGINT) AS n_lines,
        CAST(len(lines) - len(list_distinct(lines)) AS BIGINT) AS dup_lines,
        CAST(coalesce(list_sum(list_transform(
          list_filter(lines, x -> len(list_filter(lines, m -> m = x)) >= 2),
          x -> length(x))), 0) AS BIGINT) AS dup_line_chars,
        CAST(coalesce(list_sum(list_transform(lines, x -> length(x))), 0)
          AS BIGINT) AS line_chars
      FROM l ORDER BY doc_id"""))

  /** C4 document cleaning ([[graft.ops.TextAnalysis.c4Clean]]):
    * planted pages mix keepable lines (substring + terminal
    * punctuation), a JavaScript line, an unterminated line, an exact
    * repeat, and — on doc_id strides — a curly-brace template line
    * and a "lorem ipsum" line, exercising every C4 rule. The cleaned
    * and line-deduped rewrites are pinned by md5. */
  val td_c4_clean = GraftQuery(
    "td_c4_clean",
    (s, dir) => {
      val l1 = concat(substring(col("text"), 1, 40), lit("."))
      val planted = concat_ws("\n", l1,
        lit("This page requires JavaScript to render correctly."),
        substring(col("text"), 41, 40), l1,
        concat(substring(col("text"), 81, 40), lit(" ok!")),
        when(col("doc_id") % 7 === 0, lit("template { display none }"))
          .otherwise(lit("A short tail line here yes.")),
        when(col("doc_id") % 11 === 0,
          lit("Lorem ipsum dolor sit amet consectetur.")).otherwise(lit("")))
      TextAnalysis.c4Clean(
        Tables.documents(s, dir).select(col("doc_id"), planted.as("text")),
        "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH base AS (
        SELECT doc_id,
          concat_ws(chr(10),
            substr(text,1,40) || '.',
            'This page requires JavaScript to render correctly.',
            substr(text,41,40),
            substr(text,1,40) || '.',
            substr(text,81,40) || ' ok!',
            CASE WHEN doc_id % 7 = 0 THEN 'template { display none }'
                 ELSE 'A short tail line here yes.' END,
            CASE WHEN doc_id % 11 = 0
                 THEN 'Lorem ipsum dolor sit amet consectetur.' ELSE '' END
          ) AS text
        FROM documents),
      l AS (
        SELECT doc_id, text,
          list_transform(list_filter(string_split(text, chr(10)),
            x -> length(trim(x)) > 0), x -> trim(x)) AS lines
        FROM base),
      k AS (
        SELECT doc_id, text, lines,
          list_filter(lines, x -> regexp_matches(x, '[.!?"'']$')
            AND len(string_split_regex(x, '\s+')) >= 5
            AND NOT contains(lower(x), 'javascript')) AS kept
        FROM l),
      d AS (
        SELECT doc_id, text, lines, kept,
          list_filter(kept, (x, i) -> list_position(kept, x) = i) AS dedup
        FROM k)
      SELECT doc_id,
        CAST(len(lines) AS BIGINT) AS n_lines,
        CAST(len(kept) AS BIGINT) AS n_kept,
        (len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
          AND NOT contains(text, '{')) AS keep_doc,
        md5(array_to_string(kept, chr(10))) AS clean_md5,
        md5(array_to_string(dedup, chr(10))) AS dedup_md5
      FROM d ORDER BY doc_id"""))

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

  /** Feature hashing ([[TextAnalysis.hashedTf]]): fixed 32-bucket
    * hashed term frequencies per document — the vocabulary-free
    * text→vector bridge (HashingVectorizer). md5 bucketing makes the
    * whole relation cross-engine exact; the dense array form
    * ([[TextAnalysis.hashedTfVectors]]) feeds the ANN ops and is
    * spec-pinned consistent with this sparse relation. */
  val td_hashed_tf = GraftQuery(
    "td_hashed_tf",
    (s, dir) => {
      TextAnalysis.hashedTf(
        Tables.documents(s, dir).filter(col("doc_id") < 200),
        "doc_id", "text", dim = 32)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("pos"))
    },
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        FROM documents WHERE doc_id < 200 AND length(trim(text)) > 0)
      SELECT doc_id,
        CAST(('0x' || substr(md5(t), 1, 15))::BIGINT % 32 AS INT) AS pos,
        COUNT(*) AS tf
      FROM tok GROUP BY 1, 2 ORDER BY doc_id, pos"""))

  /** Per-doc top-3 TF-IDF terms with integer-scaled idf
    * ([[TextAnalysis.tfIdfTopTerms]]): `log`-free so every value is
    * exact cross-engine — tf, df, and score are integers; ranking
    * ties break on the term. */
  val td_tfidf = GraftQuery(
    "td_tfidf",
    (s, dir) => {
      TextAnalysis.tfIdfTopTerms(Tables.documents(s, dir), "doc_id", "text", 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""WITH d AS (
        SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0),
      words AS (
        SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS term
        FROM d),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
      df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY 1),
      nd AS (SELECT COUNT(*) AS n_docs FROM d)
      SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf, df, score FROM (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
          tf.tf * (1000000 * nd.n_docs // df.df) AS score,
          row_number() OVER (PARTITION BY tf.doc_id
            ORDER BY tf.tf * (1000000 * nd.n_docs // df.df) DESC, tf.term) AS rank
        FROM tf JOIN df USING (term) CROSS JOIN nd)
      WHERE rank <= 3 ORDER BY doc_id, rank"""))

  /** BM25 top-k retrieval ([[Retrieval.bm25TopK]]): posting-list
    * equi-join on query terms (candidates ≪ corpus), log-free
    * rational idf so every score is an exact integer ppm — fully
    * cross-engine oracled including the scores, not just the ranks. */
  val td_bm25 = GraftQuery(
    "td_bm25",
    (s, dir) => {
      import s.implicits._
      val queries = Seq(
        (1L, "hash join merge"), (2L, "stream window agg"),
        (3L, "customer order query table")).toDF("query_id", "qtext")
      Retrieval.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
        queries, "query_id", "qtext", k = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH d AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      idx AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM d),
      p AS (SELECT term, doc_id, dl, COUNT(*) AS tf
            FROM idx GROUP BY 1, 2, 3),
      dfreq AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1),
      nd AS (SELECT COUNT(*) AS n_docs,
               CAST(SUM(len(t)) AS BIGINT) AS t_tokens FROM d),
      q AS (SELECT * FROM (VALUES (1, 'hash join merge'),
              (2, 'stream window agg'),
              (3, 'customer order query table')) AS v(query_id, qtext)),
      qt AS (SELECT DISTINCT query_id, term FROM (
              SELECT query_id,
                unnest(string_split_regex(trim(qtext), '\s+')) AS term
              FROM q)),
      sc AS (
        SELECT qt.query_id, p.doc_id,
          CAST(SUM(CAST(FLOOR(1000000.0 *
            ((2.0 * nd.n_docs - 2.0 * dfreq.df + 1.0) /
             (2.0 * dfreq.df + 1.0)) *
            ((44.0 * nd.t_tokens * p.tf) /
             (20.0 * nd.t_tokens * p.tf + 6.0 * nd.t_tokens +
              18.0 * p.dl * nd.n_docs))) AS BIGINT)) AS BIGINT)
            AS score_ppm
        FROM qt JOIN p USING (term) JOIN dfreq USING (term)
        CROSS JOIN nd GROUP BY 1, 2)
      SELECT CAST(query_id AS BIGINT) AS query_id,
        CAST(rank AS INTEGER) AS rank, doc_id, score_ppm FROM (
        SELECT query_id, doc_id, score_ppm,
          row_number() OVER (PARTITION BY query_id
            ORDER BY score_ppm DESC, doc_id) AS rank
        FROM sc)
      WHERE rank <= 10 ORDER BY query_id, rank"""))

  /** Hybrid retrieval: BM25 (sparse, doc-as-query "more like this")
    * and brute-force cosine (dense) rankings merged by reciprocal-
    * rank fusion ([[Retrieval.reciprocalRankFusion]]) — integer-
    * division RRF scores, so the fused ranking is exact cross-engine
    * even though the dense side's cosine is float (only its RANKS
    * enter the fusion, the td_cosine_topk discipline). */
  val td_hybrid_rrf = GraftQuery(
    "td_hybrid_rrf",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val qdocs = docs.filter(col("doc_id").isin(10L, 20L, 30L))
        .select(col("doc_id").as("query_id"), col("text").as("qtext"))
      val sparse = Retrieval.bm25TopK(docs, "doc_id", "text",
        qdocs, "query_id", "qtext", k = 10, excludeSelf = true)
      val e = Tables.embeddings(s, dir)
      val dense = Similarity.bruteForceTopK(
        e.filter(col("vec_id").isin(10L, 20L, 30L)), e,
        "vec_id", "embedding", 10)
        .withColumnRenamed("neighbor_id", "id")
      Retrieval.reciprocalRankFusion(Seq(
        sparse.select("query_id", "id", "rank"),
        dense.select("query_id", "id", "rank")), k = 5)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH d AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0),
      idx AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM d),
      p AS (SELECT term, doc_id, dl, COUNT(*) AS tf
            FROM idx GROUP BY 1, 2, 3),
      dfreq AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1),
      nd AS (SELECT COUNT(*) AS n_docs,
               CAST(SUM(len(t)) AS BIGINT) AS t_tokens FROM d),
      q AS (SELECT doc_id AS query_id, text AS qtext FROM documents
            WHERE doc_id IN (10, 20, 30) AND length(trim(text)) > 0),
      qt AS (SELECT DISTINCT query_id, term FROM (
              SELECT query_id,
                unnest(string_split_regex(trim(qtext), '\s+')) AS term
              FROM q)),
      sc AS (
        SELECT qt.query_id, p.doc_id,
          CAST(SUM(CAST(FLOOR(1000000.0 *
            ((2.0 * nd.n_docs - 2.0 * dfreq.df + 1.0) /
             (2.0 * dfreq.df + 1.0)) *
            ((44.0 * nd.t_tokens * p.tf) /
             (20.0 * nd.t_tokens * p.tf + 6.0 * nd.t_tokens +
              18.0 * p.dl * nd.n_docs))) AS BIGINT)) AS BIGINT)
            AS score_ppm
        FROM qt JOIN p USING (term) JOIN dfreq USING (term)
        CROSS JOIN nd
        WHERE p.doc_id <> qt.query_id GROUP BY 1, 2),
      sparse AS (SELECT query_id, doc_id, rank FROM (
        SELECT query_id, doc_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY score_ppm DESC, doc_id) AS rank
        FROM sc) WHERE rank <= 10),
      dense AS (SELECT query_id, doc_id, rank FROM (
        SELECT qe.vec_id AS query_id, c.vec_id AS doc_id,
          row_number() OVER (PARTITION BY qe.vec_id
            ORDER BY list_cosine_similarity(qe.embedding, c.embedding)
              DESC, c.vec_id) AS rank
        FROM embeddings qe, embeddings c
        WHERE qe.vec_id IN (10, 20, 30) AND c.vec_id <> qe.vec_id)
        WHERE rank <= 10),
      fused AS (
        SELECT query_id, doc_id,
          CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_score
        FROM (SELECT * FROM sparse UNION ALL SELECT * FROM dense)
        GROUP BY 1, 2)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id, rrf_score
      FROM (
        SELECT query_id, doc_id, rrf_score,
          row_number() OVER (PARTITION BY query_id
            ORDER BY rrf_score DESC, doc_id) AS rank
        FROM fused)
      WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Bigram-LM fluency scoring (CCNet-style perplexity filter, exact):
    * the corpus is the LM, each bigram contributes its scaled-integer
    * MLE conditional probability. */
  val td_lm_bigram = GraftQuery(
    "td_lm_bigram",
    (s, dir) => {
      TextAnalysis.bigramLmScore(Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH base AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents),
      bi AS (
        SELECT doc_id, t[pos] AS w1, t[pos] || ' ' || t[pos+1] AS bg
        FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS pos
              FROM base WHERE len(t) >= 2)),
      bc AS (SELECT bg, COUNT(*) AS cbg FROM bi GROUP BY 1),
      wc AS (SELECT w1, COUNT(*) AS cw1 FROM bi GROUP BY 1),
      sc AS (
        SELECT doc_id, COUNT(*) AS n_bigrams,
          SUM(cbg * 1000000 // cw1) // COUNT(*) AS mean_cond_ppm,
          SUM(CASE WHEN cbg = 1 THEN 1000000 ELSE 0 END) // COUNT(*)
            AS singleton_ppm
        FROM bi JOIN bc USING (bg) JOIN wc USING (w1) GROUP BY 1)
      SELECT b.doc_id,
        CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
        CAST(COALESCE(mean_cond_ppm, 0) AS BIGINT) AS mean_cond_ppm,
        CAST(COALESCE(singleton_ppm, 0) AS BIGINT) AS singleton_ppm
      FROM base b LEFT JOIN sc USING (doc_id)
      ORDER BY doc_id"""))

  /** Gopher heuristic quality-rule flags (word-count bounds, mean word
    * length, symbol ratio, alpha-word ratio, stopword floor) — exact
    * integer comparisons, narrow map, no shuffle. */
  val td_gopher_quality = GraftQuery(
    "td_gopher_quality",
    (s, dir) => {
      val stop = Seq("a", "the", "value", "table", "row")
      val flags = TextAnalysis.gopherQualityFlags(col("text"), stop,
        minWords = 30)
      Tables.documents(s, dir)
        .select((col("doc_id") +: flags) :+
          flags.reduce(_ && _).as("pass"): _*)
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        ok_word_count, ok_mean_word_len, ok_symbol_ratio, ok_alpha_words,
        ok_stopwords,
        (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
          AND ok_alpha_words AND ok_stopwords) AS pass
      FROM (
        SELECT doc_id,
          n >= 30 AND n <= 100000 AS ok_word_count,
          n > 0 AND sum_len >= n * 3 AND sum_len <= n * 10
            AS ok_mean_word_len,
          nsym * 10 <= n AS ok_symbol_ratio,
          n > 0 AND nalpha * 5 >= n * 4 AS ok_alpha_words,
          stop_hits >= 2 AS ok_stopwords
        FROM (
          SELECT doc_id,
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
          FROM (SELECT doc_id, text,
                  string_split_regex(trim(text), '\s+') AS t
                FROM documents)))
      ORDER BY doc_id"""))

  /** Accent folding round-trip ([[graft.ops.TextAnalysis.foldAccents]]):
    * plant accents on every vowel, fold them back, and hash — checked
    * against DuckDB's ICU strip_accents. Full doc values pinned by
    * md5 (same device as td_pii_scrub). */
  val td_fold_accents = GraftQuery(
    "td_fold_accents",
    (s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        md5(graft.ops.TextAnalysis.foldAccents(
          translate(col("text"), "aeiou", "áéíóú"))).as("folded_md5"),
        md5(col("text")).as("orig_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        md5(strip_accents(
          replace(replace(replace(replace(replace(
            text, 'a', 'á'), 'e', 'é'), 'i', 'í'), 'o', 'ó'), 'u', 'ú')))
          AS folded_md5,
        md5(text) AS orig_md5
      FROM documents ORDER BY doc_id"""))

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
      val next = d
        .filter(pmod(col("doc_id"), lit(11)) =!= 0)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" EDITED"))).otherwise(col("text")))
        .unionByName(
          d.filter(col("doc_id") < 5)
            .withColumn("doc_id", col("doc_id") + 9000000L))
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

  /** Corpus-frequency rare-word counts (LM-surprisal core, integer-
    * valued so fully oracle-checkable). */
  val td_rare_words = GraftQuery(
    "td_rare_words",
    (s, dir) => {
      TextAnalysis.rareWordCounts(Tables.documents(s, dir), "doc_id", "text",
        rareThreshold = 500L)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH words AS (
        SELECT doc_id, unnest(string_split_regex(trim(text),'\s+')) AS w
        FROM documents),
      freq AS (SELECT w, COUNT(*) AS freq FROM words GROUP BY w)
      SELECT doc_id, COUNT(*) AS n_tokens,
        CAST(SUM(CASE WHEN freq < 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
      FROM words JOIN freq USING (w)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Chunk-level (paragraph-analog) dedup retention per doc. */
  val td_chunk_dedup = GraftQuery(
    "td_chunk_dedup",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val corpus = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(7)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L))
      Dedup.chunkDedup(corpus, "doc_id", "text", chunkTokens = 20)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },
    Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0),
      tok AS (
        SELECT doc_id, string_split_regex(trim(text),'\s+') AS t FROM corpus),
      chunks AS (
        SELECT doc_id, i - 1 AS chunk_idx,
          array_to_string(t[(i-1)*20+1 : i*20], ' ') AS chunk
        FROM tok, UNNEST(range(1, CAST(greatest((len(t)+19)//20, 1) AS BIGINT) + 1)) u(i)),
      ranked AS (
        SELECT doc_id, chunk,
          row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks WHERE length(chunk) > 0),
      g AS (
        SELECT doc_id, COUNT(*) AS n_chunks,
          CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM ranked GROUP BY doc_id)
      SELECT c.doc_id, COALESCE(g.n_chunks, 0) AS n_chunks,
        COALESCE(g.n_kept, 0) AS n_kept
      FROM corpus c LEFT JOIN g USING (doc_id) ORDER BY doc_id"""))

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

  /** Merge list shared by the BPE queries: common English
    * char-bigram merges, applied in rank order. Fixed literals so the
    * DuckDB oracle can replay the identical replace chain. */
  private val bpeFixedMerges = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
    "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e")

  /** BPE ENCODING cross-engine ([[graft.ops.Bpe.encode]] semantics):
    * token counts under a fixed merge list. The oracle replays the
    * exact same boundary-safe wrapped-symbol replace chain with
    * DuckDB string functions — a hash match proves the greedy
    * left-to-right merge semantics agree engine-for-engine. */
  val td_bpe_encode = GraftQuery(
    "td_bpe_encode",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.ops.Bpe.tokenCount(col("text"), bpeFixedMerges).as("n_bpe"))
        .orderBy(col("doc_id"))
    },
    Some {
      val S = "chr(1)"
      val symbolized =
        s"$S || array_to_string(string_split_regex(w, ''), $S||$S) || $S"
      val chain = bpeFixedMerges.foldLeft(symbolized) { case (acc, (l, r)) =>
        s"replace($acc, $S||'$l'||$S||$S||'$r'||$S, $S||'$l$r'||$S)"
      }
      s"""WITH words AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0),
      enc AS (SELECT doc_id, $chain AS s2 FROM words),
      cnt AS (
        SELECT doc_id,
          (length(s2) - length(replace(s2, $S||$S, ''))) // 2 + 1 AS n
        FROM enc),
      agg AS (SELECT doc_id, SUM(n) AS n_bpe FROM cnt GROUP BY doc_id)
      SELECT d.doc_id, CAST(COALESCE(a.n_bpe, 0) AS INTEGER) AS n_bpe
      FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      ORDER BY d.doc_id"""
    })

  /** BPE TRAINING in-engine ([[graft.ops.Bpe.trainMerges]]): the 12
    * highest-frequency merges learned from the corpus' word-count
    * table (rows-only — the greedy loop has no single-query SQL
    * equivalent; BpeSpec proves the trainer ≡ an independent
    * reference implementation, and td_bpe_encode oracles the merge
    * semantics the trainer is built on). */
  /** SQL for one unrolled BPE training round over vocab CTE v{i-1}:
    * weighted adjacent-pair count → single best pair by (count desc,
    * left, right) → merge applied via DuckDB's literal `replace` (the
    * same boundary-safe SEP-wrapped form the engine uses,
    * [[graft.ops.Bpe]]). The `n >= 2` gate reproduces the engine's
    * minCount early-stop EXACTLY: if the best pair's count falls
    * under 2, no merge applies, the vocab stops changing, and every
    * later round recomputes the same sub-threshold best — so the gate
    * is false for all subsequent rounds too, and the final UNION
    * keeps precisely the merges the engine's loop appended. */
  private def bpeRoundSql(i: Int): String = {
    val sep = "chr(1)"
    val syms = s"string_split(substr(s, 2, length(s) - 2), $sep||$sep)"
    s"""
      p$i AS (
        SELECT pp.l AS l, pp.r AS r, SUM(cnt) AS n FROM (
          SELECT unnest(list_transform(range(1, len($syms)),
              k -> {'l': $syms[CAST(k AS INT)],
                    'r': $syms[CAST(k AS INT) + 1]})) AS pp, cnt
          FROM v${i - 1}) t
        GROUP BY 1, 2),
      b$i AS (SELECT l, r, n FROM p$i ORDER BY n DESC, l, r LIMIT 1),
      v$i AS (
        SELECT CASE WHEN b.n >= 2
            THEN replace(v.s, $sep||b.l||$sep||$sep||b.r||$sep,
                         $sep||b.l||b.r||$sep)
            ELSE v.s END AS s, v.cnt
        FROM v${i - 1} v LEFT JOIN b$i b ON TRUE)"""
  }

  private def bpeTrainOracleSql(rounds: Int): String = {
    val roundCtes = (1 to rounds).map(bpeRoundSql).mkString(",")
    val out = (1 to rounds).map(i =>
      s"SELECT CAST($i AS INTEGER) AS rank, l AS left_sym, " +
        s"r AS right_sym FROM b$i WHERE n >= 2")
      .mkString("\n      UNION ALL ")
    s"""WITH w AS (
        SELECT word, COUNT(*) AS cnt FROM (
          SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
          FROM documents WHERE length(trim(text)) > 0) t
        GROUP BY word),
      v0 AS (
        SELECT chr(1) || array_to_string(
            list_transform(range(1, length(word) + 1),
              i -> substr(word, CAST(i AS INT), 1)), chr(1)||chr(1))
          || chr(1) AS s, cnt
        FROM w),$roundCtes
      SELECT rank, left_sym, right_sym FROM (
      $out) ORDER BY rank"""
  }

  /** BPE merge training ([[graft.ops.Bpe.trainMerges]]) — oracled by
    * a fully UNROLLED 12-round SQL training loop (the k-means-oracle
    * technique applied to the merge loop): each round recomputes the
    * weighted pair counts, picks the same (count desc, left, right)
    * best pair, and applies the same literal boundary-safe replace,
    * so the learned merge table hash-matches engine-for-engine. */
  val td_bpe_train = GraftQuery(
    "td_bpe_train",
    (s, dir) => {
      val merges = graft.ops.Bpe.trainMerges(
        Tables.documents(s, dir), "text", numMerges = 12)
      import s.implicits._
      merges.zipWithIndex
        .map { case ((l, r), i) => (i + 1, l, r) }
        .toDF("rank", "left_sym", "right_sym")
        .orderBy(col("rank"))
    },
    Some(bpeTrainOracleSql(12)))

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
      val corpus = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(5)) === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
          .withColumn("text", concat(col("text"), lit(" xtra wrds"))))
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

  /** Benchmark decontamination: corpus docs sharing any word 3-gram
    * with the "benchmark" subset (doc_id % 97 = 0), with the count of
    * distinct shared shingles. */
  val td_decontam = GraftQuery(
    "td_decontam",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.ops.Dedup.contaminatedDocs(
        docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(97)) === 0),
        "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    Some("""WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text),'\s+') AS t
        FROM documents),
      sh AS (
        SELECT doc_id,
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t)-1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
        FROM tok),
      bsh AS (
        SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 97 = 0),
      csh AS (
        SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 97 <> 0)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM csh JOIN bsh USING (shingle)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** PII scrub: synthetic emails/URLs injected at every 'slow' token
    * (variable positions per doc), then redacted; output is the
    * per-doc redaction count and the md5 of the scrubbed text, so the
    * oracle pins the entire scrubbed value. */
  val td_pii_scrub = GraftQuery(
    "td_pii_scrub",
    (s, dir) => {
      val injected = regexp_replace(col("text"), lit(" slow "),
        concat(lit(" u"), col("doc_id"), lit("@mail.com http://x.io/"),
          col("doc_id"), lit(" ")))
      val rules = Seq(
        "u[0-9]+@mail\\.com" -> "<EMAIL>",
        "http://[a-z0-9./]+" -> "<URL>")
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          TextAnalysis.piiCount(injected, rules.map(_._1)).cast("long").as("n_pii"),
          md5(TextAnalysis.scrubPii(injected, rules)).as("clean_hash"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH inj AS (
        SELECT doc_id,
          regexp_replace(text, ' slow ',
            ' u' || CAST(doc_id AS VARCHAR) || '@mail.com http://x.io/'
              || CAST(doc_id AS VARCHAR) || ' ', 'g') AS t
        FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(t, 'u[0-9]+@mail\.com'))
           + len(regexp_extract_all(t, 'http://[a-z0-9./]+')) AS BIGINT) AS n_pii,
        md5(regexp_replace(regexp_replace(t, 'u[0-9]+@mail\.com', '<EMAIL>', 'g'),
            'http://[a-z0-9./]+', '<URL>', 'g')) AS clean_hash
      FROM inj ORDER BY doc_id"""))

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

  /** Gopher-style repetition filters: most-frequent-bigram mass and
    * duplicate-trigram fraction per document, with a flag at the
    * classic thresholds. One native codegen pass per doc
    * ([[graft.plans.RepetitionStatsExpression]]) — a narrow map with
    * zero shuffle, vs the oracle's explode+group form. */
  val td_quality_repetition = GraftQuery(
    "td_quality_repetition",
    (s, dir) => {
      val st = graft.plans.NativeCols.repetitionStats(col("text"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          st.getField("top_bigram_frac").as("top_bigram_frac"),
          st.getField("dup_trigram_frac").as("dup_trigram_frac"))
        .withColumn("flagged",
          col("top_bigram_frac") > 0.2 || col("dup_trigram_frac") > 0.3)
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (
        SELECT doc_id,
          CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
               ELSE string_split_regex(trim(text), '\s+') END AS t
        FROM documents),
      g AS (
        SELECT doc_id,
          list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg,
          list_transform(range(1, len(t) - 1),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS tg
        FROM toks),
      bc AS (
        SELECT doc_id, b, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(bg) AS b FROM g) GROUP BY doc_id, b),
      tops AS (SELECT doc_id, max(c) AS topc, sum(c) AS nb FROM bc GROUP BY doc_id)
      SELECT g.doc_id,
        CAST(tops.topc AS DOUBLE) / tops.nb AS top_bigram_frac,
        CASE WHEN len(g.tg) = 0 THEN NULL
             ELSE 1.0 - CAST(len(list_distinct(g.tg)) AS DOUBLE) / len(g.tg)
        END AS dup_trigram_frac,
        (CAST(tops.topc AS DOUBLE) / tops.nb > 0.2
         OR CASE WHEN len(g.tg) = 0 THEN NULL
              ELSE 1.0 - CAST(len(list_distinct(g.tg)) AS DOUBLE) / len(g.tg)
            END > 0.3) AS flagged
      FROM g LEFT JOIN tops ON g.doc_id = tops.doc_id
      ORDER BY g.doc_id"""))

  /** SemDeDup: semantic near-dup pairs via coarse-quantizer cells +
    * within-cell exact cosine. The codebook is the same deterministic
    * one as [[td_ann_ivf]], so the oracle recomputes the WHOLE
    * pipeline — cell assignment included. `cos` itself is excluded
    * from the output (float-sum divergence ~1e-7 cross-engine; same
    * disposition as td_embedding_neardup). */
  val td_semdedup = GraftQuery(
    "td_semdedup",
    (s, dir) => {
      // plant exact duplicate vectors (cos ≈ 1.0, organic pairs max
      // ~0.51 in the fixture): every reported pair sits far from the
      // 0.8 threshold on BOTH sides, so the float-sum divergence
      // between engines can't flip membership. Planted ids never win
      // arg_min, so the codebook is unchanged by the planting.
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val corpus = e.unionByName(
        e.withColumn("vec_id", col("vec_id") + 1000000L))
      // `cell` stays OUT of the output: a vector whose top-2 centroid
      // similarities differ by less than the engines' ~1e-7 float-sum
      // divergence can be celled differently per engine. The planted
      // PAIR is immune (identical vectors always share a cell), so
      // pair membership is stable — the cell label is not.
      Similarity.semanticNearDuplicates(
        corpus, "vec_id", "embedding", 0.8, nCells = 16)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL SELECT vec_id + 1000000, embedding FROM embeddings),
      cent AS (
        SELECT CAST(vec_id % 16 AS INTEGER) AS cell,
               arg_min(embedding, vec_id) AS centroid
        FROM corpus GROUP BY 1),
      asg AS (
        SELECT vec_id, embedding, cell FROM (
          SELECT e.vec_id, e.embedding, c.cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY list_cosine_similarity(e.embedding, c.centroid) DESC,
                       c.cell) AS rn
          FROM corpus e CROSS JOIN cent c)
        WHERE rn = 1)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.8
      ORDER BY id_a, id_b"""))

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

  /** Seed-trained hashed linear classifier, end to end in one plan:
    * half the corpus (deterministic md5 split) becomes labeled seeds
    * (label = the lang metadata column), a bounded 4096-bucket weight
    * table is trained from their tokens
    * ([[graft.ops.TextAnalysis.trainHashedClassifier]] — one
    * map-side-combinable aggregation), and EVERY document is scored
    * through a broadcast join. The fastText-style distill-a-label
    * workflow (train on the labeled slice, apply corpus-wide), exact
    * in scaled-integer arithmetic so the whole thing oracles. */
  val td_lang_classifier = GraftQuery(
    "td_lang_classifier",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val seed = docs
        .filter(graft.ops.Pipeline.hashBucket(col("doc_id"), 100) < 50)
        .withColumn("is_en", col("lang") === "en")
      val w = TextAnalysis.trainHashedClassifier(seed, "text", "is_en",
        buckets = 4096)
      TextAnalysis.scoreHashedClassifier(docs, "doc_id", "text", w,
        buckets = 4096)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("score"),
          (col("score") > 0).as("pred_en"),
          (col("lang") === "en").as("is_en"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH b AS (
        SELECT doc_id, lang = 'en' AS is_en,
          ('0x'||substr(md5(tok),1,8))::BIGINT % 4096 AS bucket
        FROM (SELECT doc_id, lang,
                unnest(string_split_regex(trim(text), '\s+')) AS tok
              FROM documents WHERE length(trim(text)) > 0)),
      counts AS (
        SELECT bucket,
          SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS pos_cnt,
          SUM(CASE WHEN NOT is_en THEN 1 ELSE 0 END) AS neg_cnt
        FROM b
        WHERE ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::BIGINT
              % 100 < 50
        GROUP BY bucket),
      tot AS (
        SELECT SUM(pos_cnt) AS pos_tot, SUM(neg_cnt) AS neg_tot
        FROM counts),
      w AS (
        SELECT bucket, CAST(
            (pos_cnt + 1) * 1000000 // (pos_tot + 4096)
          - (neg_cnt + 1) * 1000000 // (neg_tot + 4096) AS BIGINT)
          AS weight
        FROM counts, tot),
      scores AS (
        SELECT b.doc_id, CAST(SUM(w.weight) AS BIGINT) AS score
        FROM b JOIN w USING (bucket) GROUP BY b.doc_id)
      SELECT d.doc_id, COALESCE(s.score, 0) AS score,
        COALESCE(s.score, 0) > 0 AS pred_en, d.lang = 'en' AS is_en
      FROM documents d LEFT JOIN scores s USING (doc_id)
      ORDER BY doc_id"""))

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

  /** SQ8 scalar-quantized ANN ([[graft.ops.ScalarQuant]]): per-
    * dimension int8 affine codes (4× compression at 64 dims), scored
    * asymmetrically — the query keeps its full quantized vector, the
    * corpus contributes one byte per dimension. Stats, codes, and
    * scores are exact integer arithmetic, so the full stats → encode
    * → score → rank pipeline hash-matches the SQL oracle. */
  val td_ann_sq8 = GraftQuery(
    "td_ann_sq8",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val stats = graft.ops.ScalarQuant.dimStats(e, "embedding")
      val codes = graft.ops.ScalarQuant.encode(e, stats, "vec_id", "embedding")
      graft.ops.ScalarQuant.adcTopK(
        e.filter(col("vec_id") < 20), codes, stats,
        "vec_id", "embedding", topK = 5)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH q AS (
        SELECT vec_id AS id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings),
      dims AS (
        SELECT i, MIN(qv[i]) AS mn, MAX(qv[i]) AS mx
        FROM q CROSS JOIN range(1, 65) t(i) GROUP BY i),
      codes AS (
        SELECT q.id, d.i,
          LEAST(255, GREATEST(0,
            ((qv[d.i] - d.mn) * 255) // GREATEST(d.mx - d.mn, 1))) AS code
        FROM q CROSS JOIN dims d),
      scored AS (
        SELECT p.id AS query_id, c.id AS neighbor_id,
          CAST(SUM(p.qv[c.i] * (d.mn * 255 + c.code * (d.mx - d.mn)))
            AS BIGINT) AS score
        FROM codes c
        JOIN dims d USING (i)
        CROSS JOIN (SELECT * FROM q WHERE id < 20) p
        WHERE p.id <> c.id
        GROUP BY 1, 2)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, score
      FROM (
        SELECT query_id, neighbor_id, score,
          row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rank
        FROM scored) WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** Persisted IVF index with SQ8-compressed postings
    * ([[graft.ops.IvfIndex.buildSq8]]/[[graft.ops.IvfIndex.querySq8]]):
    * the FAISS `IVF…,SQ8` production trade — inverted lists hold one
    * byte per dimension, probes prune to cell directories and rank by
    * the exact-integer ADC score. Oracled END TO END: the SQL chains
    * td_ann_ivf_trained's unrolled 2-iteration k-means into
    * td_ann_sq8's stats/encode/score pipeline with the candidate set
    * restricted to each query's 3 probed cells, so training,
    * assignment, compression, the parquet round-trip, pruning, and
    * ranking are all value-checked in one hash. */
  val td_ann_ivf_sq8 = GraftQuery(
    "td_ann_ivf_sq8",
    (s, dir) => {
      val stage = s"${System.getProperty("java.io.tmpdir")}/graft_ivfsq8_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val e = Tables.embeddings(s, dir)
      graft.ops.IvfIndex.buildSq8(e, "vec_id", "embedding", stage,
        kCells = 8, iters = 2)
      graft.ops.IvfIndex.querySq8(e.filter(col("vec_id") < 20),
        "vec_id", "embedding", stage, topK = 5, nProbe = 3)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH q AS (
        SELECT vec_id AS id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings),
      c0 AS (
        SELECT CAST(id % 8 AS INTEGER) AS cell, arg_min(qv, id) AS s,
          CAST(1 AS BIGINT) AS n
        FROM q GROUP BY 1),
      a1 AS (
        SELECT id, qv, cell FROM (
          SELECT q.id, q.qv, c.cell,
            row_number() OVER (PARTITION BY q.id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> q.qv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM q CROSS JOIN c0 c) WHERE rn = 1),
      s1 AS (
        SELECT cell, list(sv ORDER BY pos) AS s_new FROM (
          SELECT cell, kv.pos AS pos, CAST(SUM(kv.v) AS BIGINT) AS sv
          FROM (SELECT cell, unnest(list_transform(range(1, len(qv)+1),
                  i -> {'pos': i, 'v': qv[i]})) AS kv FROM a1) t
          GROUP BY cell, kv.pos) t2
        GROUP BY cell),
      n1 AS (SELECT cell, COUNT(*) AS n_new FROM a1 GROUP BY cell),
      c1 AS (
        SELECT c0.cell, COALESCE(s1.s_new, c0.s) AS s,
          CAST(COALESCE(n1.n_new, c0.n) AS BIGINT) AS n
        FROM c0 LEFT JOIN s1 USING (cell) LEFT JOIN n1 USING (cell)),
      a2 AS (
        SELECT id, qv, cell FROM (
          SELECT q.id, q.qv, c.cell,
            row_number() OVER (PARTITION BY q.id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> q.qv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM q CROSS JOIN c1 c) WHERE rn = 1),
      s2 AS (
        SELECT cell, list(sv ORDER BY pos) AS s_new FROM (
          SELECT cell, kv.pos AS pos, CAST(SUM(kv.v) AS BIGINT) AS sv
          FROM (SELECT cell, unnest(list_transform(range(1, len(qv)+1),
                  i -> {'pos': i, 'v': qv[i]})) AS kv FROM a2) t
          GROUP BY cell, kv.pos) t2
        GROUP BY cell),
      n2 AS (SELECT cell, COUNT(*) AS n_new FROM a2 GROUP BY cell),
      c2 AS (
        SELECT c1.cell, COALESCE(s2.s_new, c1.s) AS s,
          CAST(COALESCE(n2.n_new, c1.n) AS BIGINT) AS n
        FROM c1 LEFT JOIN s2 USING (cell) LEFT JOIN n2 USING (cell)),
      a3 AS (
        SELECT id, cell FROM (
          SELECT q.id, c.cell,
            row_number() OVER (PARTITION BY q.id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> q.qv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM q CROSS JOIN c2 c) WHERE rn = 1),
      dims AS (
        SELECT i, MIN(qv[i]) AS mn, MAX(qv[i]) AS mx
        FROM q CROSS JOIN range(1, 65) t(i) GROUP BY i),
      codes AS (
        SELECT q.id, d.i,
          LEAST(255, GREATEST(0,
            ((qv[d.i] - d.mn) * 255) // GREATEST(d.mx - d.mn, 1))) AS code,
          a3.cell
        FROM q CROSS JOIN dims d JOIN a3 ON a3.id = q.id),
      probes AS (
        SELECT query_id, qqv, cell FROM (
          SELECT qs.id AS query_id, qs.qv AS qqv, c.cell,
            row_number() OVER (PARTITION BY qs.id ORDER BY
              CAST(list_sum(list_transform(range(1, len(c.s)+1),
                     i -> c.s[i] * c.s[i]))
                - 2 * c.n * list_sum(list_transform(range(1, len(c.s)+1),
                     i -> qs.qv[i] * c.s[i])) AS DOUBLE)
                / CAST(c.n * c.n AS DOUBLE),
              c.cell) AS rn
          FROM (SELECT * FROM q WHERE id < 20) qs
          CROSS JOIN c2 c) WHERE rn <= 3),
      scored AS (
        SELECT p.query_id, k.id AS neighbor_id,
          CAST(SUM(p.qqv[k.i] * (d.mn * 255 + k.code * (d.mx - d.mn)))
            AS BIGINT) AS score
        FROM codes k
        JOIN dims d USING (i)
        JOIN probes p ON p.cell = k.cell
        WHERE p.query_id <> k.id
        GROUP BY 1, 2)
      SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, score
      FROM (
        SELECT query_id, neighbor_id, score,
          row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS rank
        FROM scored) WHERE rank <= 5
      ORDER BY query_id, rank"""))

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

  def all: Seq[GraftQuery] = Seq(
    td_lang_classifier, td_kmv_quantiles,
    td_text_stats, td_lang_id, td_lang_purity, td_text_hygiene, td_fingerprint, td_dedup_exact, td_dup_profile,
    td_char_jaccard, td_cosine_topk, td_minhash_neardup,
    td_incremental_neardup, td_source_neardup, td_ngram_jaccard,
    td_dup_spans, td_dup_span_removal, td_lm_bigram, td_gopher_quality,
    td_source_cap, td_fold_accents, td_edit_neardup, td_fuzzy_decontam,
    td_line_repetition, td_c4_clean, td_blocklist_scrub,
    td_semantic_decontam,
    td_heavy_hitters, td_hll_registers, td_hll_by_source,
    td_pipeline_e2e, td_hashed_tf, td_tfidf, td_bm25, td_hybrid_rrf,
    td_dedup_components, td_cc_largestar, td_dedup_survivors, td_dedup_best,
    td_dedup_canonical,
    td_simhash_md5, td_ann_lsh_md5, td_embedding_neardup, td_ann_ivf,
    td_kmeans, td_ann_ivf_trained, td_ann_ivf_indexed, td_pq_adc, td_ann_ivfpq,
    td_ann_sq8, td_ann_ivf_sq8, td_kmv_overlap, td_hard_negatives,
    td_ann_recall, td_content_chunks, td_content_chunks_fast,
    td_boilerplate_removal,
    td_rare_words, td_chunk_dedup,
    td_quality_prune, td_quality_prune_cutoff, td_drift_tvd, td_corpus_diff,
    td_length_buckets,
    td_sample_hash, td_sample_stratified, td_sample_weighted,
    td_dsir_select,
    td_domain_mix, td_temperature_mix, td_bpe_encode, td_bpe_train,
    td_token_quantiles, td_quantiles_by_value, td_quantile_sketch,
    td_pack_sequences, td_decontam,
    td_token_budget, td_interleave, td_train_split,
    td_split_leakage_safe, td_pii_scrub,
    td_media_meta, td_media_frames, td_media_features,
    td_quality_repetition, td_semdedup, td_epoch_shuffle, td_profile,
    td_sufficient_stats, td_chunk_embed, td_mean_pool)
}
