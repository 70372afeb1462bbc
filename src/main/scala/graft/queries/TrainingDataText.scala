package graft.queries

import graft.{GraftQuery, Tables}
import graft.ops.{BloomJoin, Dedup, Multimodal, Pipeline, Profiling, Retrieval, Sampling, Similarity, Sketches, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis & quality: language ID, hygiene, quality
  * scores, tokenization (BPE), retrieval (TF-IDF/BM25/RRF).
  *
  * Split from the original TrainingData.scala (round 11) —
  * query definitions are unchanged; TrainingData.all still
  * registers everything in the original order.
  */
object TrainingDataText {

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


  /** MRR@10 self-retrieval eval
    * ([[graft.ops.Retrieval.reciprocalRank]]): queries are the first
    * six tokens of every doc_id % 100 == 7 document, the relevant doc
    * is the source itself — the standard retrieval sanity eval (a
    * healthy index should rank a document first for its own prefix,
    * and every case where it doesn't is boilerplate worth reading).
    * Reciprocals are exact-integer ppm (1e6 div rank), so per-query
    * rows and any MRR mean over them hash-match the oracle; misses
    * report (NULL, 0) and count against the mean, the standard MRR@k
    * convention. */
  val td_mrr = GraftQuery(
    "td_mrr",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // non-empty tokenized text only — mirrors the oracle's `d` CTE
      // (its query set derives from the blank-filtered corpus): a
      // blank document at a %100==7 id must not become a query here
      // that the oracle lacks
      val qs = docs.filter(pmod(col("doc_id"), lit(100)) === 7)
        .filter(size(TextAnalysis.tokens(col("text"))) > 0)
        .select(col("doc_id").as("query_id"),
          concat_ws(" ",
            slice(TextAnalysis.tokens(col("text")), 1, 6)).as("qtext"))
      val ranked = Retrieval.bm25TopK(docs, "doc_id", "text",
        qs, "query_id", "qtext", k = 10)
      val rel = qs.select(col("query_id"), col("query_id").as("id"))
      Retrieval.reciprocalRank(ranked, rel, "query_id", "id", "rank",
        k = 10)
        .orderBy(col("query_id"))
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
      q AS (SELECT doc_id AS query_id, array_to_string(t[1:6], ' ') AS qtext
            FROM d WHERE doc_id % 100 = 7),
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
        CROSS JOIN nd GROUP BY 1, 2),
      ranked AS (
        SELECT query_id, doc_id, rank FROM (
          SELECT query_id, doc_id,
            row_number() OVER (PARTITION BY query_id
              ORDER BY score_ppm DESC, doc_id) AS rank
          FROM sc)
        WHERE rank <= 10),
      hits AS (
        SELECT query_id, MIN(rank) AS fr
        FROM ranked WHERE doc_id = query_id GROUP BY 1)
      SELECT q.query_id, CAST(hits.fr AS INTEGER) AS first_rank,
        COALESCE(CAST(1000000 // hits.fr AS BIGINT), 0) AS rr_ppm
      FROM q LEFT JOIN hits USING (query_id)
      ORDER BY query_id"""))

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


  /** Per-source vocabulary richness
    * ([[graft.ops.TextAnalysis.vocabRichness]]): type-token ratio and
    * hapax share in exact integer ppm — the cheap templated/spam
    * source detector (machine-generated text repeats a tiny
    * vocabulary). One (source, word) shuffle with map-side combine
    * then a vocabulary-bounded collapse. */
  val td_vocab_richness = GraftQuery(
    "td_vocab_richness",
    (s, dir) => {
      TextAnalysis.vocabRichness(
          Tables.documents(s, dir), "source", "text")
        .withColumnRenamed("group", "source")
        .orderBy(col("source"))
    },
    Some("""WITH words AS (
        SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents WHERE length(trim(text)) > 0),
      wc AS (SELECT source, w, COUNT(*) AS c FROM words GROUP BY 1, 2)
      SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        COUNT(*) AS n_types,
        CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        CAST(COUNT(*) * 1000000 // greatest(SUM(c), 1) AS BIGINT)
          AS ttr_ppm,
        CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
          // greatest(COUNT(*), 1) AS BIGINT) AS hapax_ppm
      FROM wc GROUP BY source ORDER BY source"""))


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


  /** Tokenizer FERTILITY per (source, lang) — BPE tokens per word and
    * per character (ppm, exact integer `div`): the mixing diagnostic
    * that tells you which domains/languages your tokenizer spends
    * budget on (a high-fertility slice costs more compute per byte of
    * signal; fertility imbalance is the standard argument for
    * retraining a tokenizer before scaling a multilingual mix). One
    * narrow codegen pass per doc (the same [[graft.ops.Bpe.tokenCount]]
    * expression td_bpe_encode oracles) then one group-by shuffle with
    * map-side partial sums — nothing per-token crosses the wire. */
  val td_token_fertility = GraftQuery(
    "td_token_fertility",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(col("source"), col("lang"),
          graft.ops.Bpe.tokenCount(col("text"), bpeFixedMerges)
            .cast("long").as("n_bpe"),
          graft.ops.TextAnalysis.tokenCount(col("text"))
            .cast("long").as("n_words"),
          length(col("text")).cast("long").as("n_chars"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bpe")).as("bpe_tokens"),
          sum(col("n_words")).as("words"),
          sum(col("n_chars")).as("chars"))
        .select(col("source"), col("lang"), col("n_docs"),
          col("bpe_tokens"), col("words"), col("chars"),
          expr("bpe_tokens * 1000000 div greatest(words, 1)")
            .as("bpe_per_word_ppm"),
          expr("bpe_tokens * 1000000 div greatest(chars, 1)")
            .as("bpe_per_char_ppm"))
        .orderBy(col("source"), col("lang"))
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
      perdoc AS (
        SELECT d.doc_id, d.source, d.lang,
          CAST(COALESCE(a.n_bpe, 0) AS BIGINT) AS n_bpe,
          CASE WHEN length(trim(d.text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(d.text), '\\s+')) END AS n_words,
          length(d.text) AS n_chars
        FROM documents d LEFT JOIN
          (SELECT doc_id, SUM(n) AS n_bpe FROM cnt GROUP BY doc_id) a
          ON d.doc_id = a.doc_id)
      SELECT source, lang, COUNT(*) AS n_docs,
        CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
        CAST(SUM(n_words) AS BIGINT) AS words,
        CAST(SUM(n_chars) AS BIGINT) AS chars,
        CAST(SUM(n_bpe) * 1000000
          // greatest(SUM(n_words), 1) AS BIGINT) AS bpe_per_word_ppm,
        CAST(SUM(n_bpe) * 1000000
          // greatest(SUM(n_chars), 1) AS BIGINT) AS bpe_per_char_ppm
      FROM perdoc GROUP BY source, lang ORDER BY source, lang"""
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

  /** Classifier calibration report (the eval artifact a
    * quality-filter rollout needs): sweep fixed score thresholds over
    * the hash-feature language classifier's scores and report the
    * confusion counts plus precision/recall in exact integer PPM —
    * `1 000 000·tp div (tp+fp)` — per threshold. The per-(doc,
    * threshold) fan-out is |thresholds|×N skinny rows collapsing
    * map-side to |thresholds| rows; precision guards the empty
    * prediction set with NULL (both engines). */
  val td_classifier_calibration = GraftQuery(
    "td_classifier_calibration",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val seed = docs
        .filter(graft.ops.Pipeline.hashBucket(col("doc_id"), 100) < 50)
        .withColumn("is_en", col("lang") === "en")
      val w = TextAnalysis.trainHashedClassifier(seed, "text", "is_en",
        buckets = 4096)
      val scored = docs.select(col("doc_id"), col("lang"))
        .join(TextAnalysis.scoreHashedClassifier(docs, "doc_id", "text", w,
          buckets = 4096), Seq("doc_id"), "left")
        .select(coalesce(col("score"), lit(0L)).as("score"),
          (col("lang") === "en").as("is_en"))
      val ts = Seq(-500000L, -200000L, -100000L, -50000L, 0L,
        50000L, 100000L, 200000L, 500000L)
      scored
        .select(col("score"), col("is_en"),
          explode(array(ts.map(lit): _*)).as("t"))
        .groupBy(col("t"))
        .agg(
          sum(when(col("score") > col("t") && col("is_en"), 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("score") > col("t") && !col("is_en"), 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("score") <= col("t") && col("is_en"), 1L)
            .otherwise(0L)).as("fn"),
          sum(when(col("score") <= col("t") && !col("is_en"), 1L)
            .otherwise(0L)).as("tn"))
        .select(col("t"), col("tp"), col("fp"), col("fn"), col("tn"),
          when(col("tp") + col("fp") > 0,
            expr("(1000000 * tp) div (tp + fp)")).as("precision_ppm"),
          expr("(1000000 * tp) div (tp + fn)").as("recall_ppm"))
        .orderBy(col("t"))
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
        FROM b JOIN w USING (bucket) GROUP BY b.doc_id),
      scored AS (
        SELECT COALESCE(s.score, 0) AS score, d.lang = 'en' AS is_en
        FROM documents d LEFT JOIN scores s USING (doc_id)),
      th(t) AS (VALUES (-500000), (-200000), (-100000), (-50000), (0),
        (50000), (100000), (200000), (500000)),
      conf AS (
        SELECT t,
          SUM(CASE WHEN score > t AND is_en THEN 1 ELSE 0 END) AS tp,
          SUM(CASE WHEN score > t AND NOT is_en THEN 1 ELSE 0 END) AS fp,
          SUM(CASE WHEN score <= t AND is_en THEN 1 ELSE 0 END) AS fn,
          SUM(CASE WHEN score <= t AND NOT is_en THEN 1 ELSE 0 END) AS tn
        FROM scored, th GROUP BY t)
      SELECT CAST(t AS BIGINT) AS t, CAST(tp AS BIGINT) AS tp,
        CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
        CAST(tn AS BIGINT) AS tn,
        CASE WHEN tp + fp > 0
          THEN CAST(1000000 * tp // (tp + fp) AS BIGINT) END
          AS precision_ppm,
        CAST(1000000 * tp // (tp + fn) AS BIGINT) AS recall_ppm
      FROM conf ORDER BY t"""))

  /** Frequent token co-occurrence (collocation / template mining):
    * pairs of tokens sharing ≥ 20% of documents, Apriori-prefiltered
    * so pair generation only sees frequent tokens (the df table
    * BROADCASTS; the self-join exchanges once on doc id). Support
    * threshold scales with the corpus (|docs|/5), so the result is a
    * property of the distribution, not the scale factor. */
  val td_cooccurrence = GraftQuery(
    "td_cooccurrence",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val nDocs = docs.count()
      TextAnalysis.cooccurrence(docs, "doc_id", "text",
          minDocs = math.max(1L, nDocs / 5), totalDocs = nDocs)
        .orderBy(col("token_a"), col("token_b"))
    },
    Some("""WITH toks AS (
        SELECT DISTINCT doc_id, tok FROM (
          SELECT doc_id,
                 unnest(string_split_regex(trim(text), '\s+')) AS tok
          FROM documents WHERE length(trim(text)) > 0)
        WHERE length(tok) > 0),
      capped AS (
        SELECT doc_id, tok FROM (
          SELECT doc_id, tok, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tok) AS rn FROM toks)
        WHERE rn <= 64),
      support AS (
        SELECT greatest(1, (SELECT COUNT(*) FROM documents) // 5) AS s),
      freq AS (
        SELECT tok, COUNT(*) AS df FROM capped GROUP BY tok
        HAVING COUNT(*) >= (SELECT s FROM support)),
      ft AS (SELECT c.doc_id, c.tok FROM capped c JOIN freq USING (tok)),
      pairs AS (
        SELECT a.tok AS token_a, b.tok AS token_b, COUNT(*) AS n_docs
        FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2 HAVING COUNT(*) >= (SELECT s FROM support))
      SELECT p.token_a, p.token_b, p.n_docs,
        CAST(1000000 * p.n_docs * (SELECT COUNT(*) FROM documents)
             // (fa.df * fb.df) AS BIGINT) AS lift_ppm
      FROM pairs p
      JOIN freq fa ON fa.tok = p.token_a
      JOIN freq fb ON fb.tok = p.token_b
      ORDER BY token_a, token_b"""))

}
