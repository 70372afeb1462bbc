package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  * All column-expression built-ins (codegen'd, no UDFs) — each scales
  * as a narrow map over the corpus, no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens (empty text → 0, not 1). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: runs of word chars or single non-space
    * punctuation — the `\w+|[^\w\s]` heuristic. `regexp_extract_all`
    * (not lookaround splits) so the pattern also runs on RE2 engines.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Quality-scoring features: length, type-token ratio, stopword
    * ratio, mean token length. Deterministic doubles (int/int
    * divisions), so oracle-checkable cross-engine.
    */
  def qualityFeatures(text: Column, stopwords: Seq[String]): Seq[Column] = {
    val toks = tokens(text)
    // nullif: empty docs yield NULL ratios instead of aborting the
    // whole job with DIVIDE_BY_ZERO under Spark 4's default ANSI mode
    val n = nullif(size(toks).cast("double"), lit(0.0))
    val stopArr = array(stopwords.map(lit): _*)
    Seq(
      length(text).as("n_chars"),
      size(toks).as("n_tokens"),
      (size(array_distinct(toks)).cast("double") / n).as("type_token_ratio"),
      (size(filter(toks, t => array_contains(stopArr, t))).cast("double") / n)
        .as("stopword_ratio"),
      (length(regexp_replace(text, "\\s", "")).cast("double") / n)
        .as("mean_token_len"))
  }

  /** Composite quality score in [0,1]-ish: favors mid-length docs
    * with diverse tokens and a sane stopword rate. Same arithmetic
    * tree as the SQL oracle → bit-identical doubles.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val n = nullif(size(toks).cast("double"), lit(0.0))
    val ttr = size(array_distinct(toks)).cast("double") / n
    val stopArr = array(stopwords.map(lit): _*)
    val sr = size(filter(toks, t => array_contains(stopArr, t))).cast("double") / n
    least(n / lit(100.0), lit(1.0)) * ttr * (lit(1.0) - sr)
  }

  /** Stopword-count language ID: score per language = occurrences of
    * that language's marker tokens; argmax with a fixed priority
    * chain as tie-break. `langSets` ordering IS the priority.
    */
  def languageId(text: Column, langSets: Seq[(String, Seq[String])]): Column = {
    val toks = tokens(text)
    val scores = langSets.map { case (lang, words) =>
      val arr = array(words.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(arr, t)))
    }
    scores.foldRight(lit(langSets.head._1)) { case ((lang, sc), alt) =>
      val isMax = scores.map(_._2).map(o => sc >= o).reduce(_ && _)
      when(isMax, lit(lang)).otherwise(alt)
    }
  }

  /** Text-hygiene report — the encoding-damage signals a crawl
    * pipeline filters on BEFORE any content op (mojibake docs poison
    * dedup, quality scoring, and tokenization alike): per document,
    * counts of U+FFFD replacement chars (decode failures), control
    * chars (C0 minus tab/LF/CR, plus DEL and C1 — the mojibake
    * residue of mis-declared charsets), zero-width chars
    * (ZWSP/ZWNJ/ZWJ/BOM — invisible dedup poison), and whether NFC
    * canonical composition changes the text (é composed vs
    * e+combining-acute fingerprint differently but read identically —
    * [[graft.plans.NativeCols.nfcNormalize]], a native codegen
    * expression since no Column-DSL form exists). All counts are
    * exact integers; one narrow map, no shuffle.
    */
  def hygieneReport(text: Column): Seq[Column] = Seq(
    length(text).as("n_chars"),
    size(regexp_extract_all(text, lit("\uFFFD"), lit(0)))
      .cast("long").as("n_replacement"),
    size(regexp_extract_all(text,
      lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]"), lit(0)))
      .cast("long").as("n_control"),
    size(regexp_extract_all(text,
      lit("[\u200B\u200C\u200D\uFEFF]"), lit(0)))
      .cast("long").as("n_zero_width"),
    (graft.plans.NativeCols.nfcNormalize(text) =!= text).as("nfc_changed"))

  /** Span-level language purity — code-switch detection, the
    * multilingual-curation signal doc-level [[languageId]] can't see:
    * a half-English half-German page IDs as one language but trains
    * badly. Tokens segment into fixed `spanTokens` spans, each span
    * language-IDs by the same stopword-count argmax (and the same
    * priority-order tie-break) as [[languageId]], and per doc the
    * result is the span count, the majority span language, and
    * `purity_ppm` = majority-span share (integer ppm, bit-exact).
    * Token-less docs report 0 spans, purity 0, the priority-head
    * language.
    *
    * Scale shape: posexplode is a narrow map; both aggregations (per
    * (doc, span) marker counts, then per-doc span-language counts)
    * are map-side-combinable sums — two keyed exchanges, each linear
    * in the corpus, state bounded by |langs| columns.
    */
  def langPuritySpans(docs: DataFrame, idCol: String, textCol: String,
      langSets: Seq[(String, Seq[String])], spanTokens: Int = 20)
      : DataFrame = {
    require(spanTokens >= 1, s"spanTokens=$spanTokens must be ≥ 1")
    require(langSets.nonEmpty, "langSets must name at least one language")
    // the shared argmax: first language (in priority order) whose
    // score is ≥ every other — identical CASE shape to the oracle
    def argmax(scores: Seq[(String, Column)]): Column =
      scores.foldRight(lit(langSets.head._1)) { case ((lang, sc), alt) =>
        val isMax = scores.map(_._2).map(o => sc >= o).reduce(_ && _)
        when(isMax, lit(lang)).otherwise(alt)
      }
    val scoreAggs = langSets.map { case (l, ws) =>
      sum(when(col("tok").isInCollection(ws), 1L).otherwise(0L)).as(s"s_$l")
    }
    val spanScores = docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("span", expr(s"pos div $spanTokens"))
      .groupBy(col(idCol), col("span"))
      .agg(scoreAggs.head, scoreAggs.tail: _*)
    val spanLang = spanScores.withColumn("span_lang",
      argmax(langSets.map { case (l, _) => l -> col(s"s_$l") }))
    val perDoc = spanLang
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        langSets.map { case (l, _) =>
          sum(when(col("span_lang") === l, 1L).otherwise(0L)).as(s"c_$l")
        }: _*)
      .withColumn("lang_major",
        argmax(langSets.map { case (l, _) => l -> col(s"c_$l") }))
      .withColumn("__cmax",
        greatest(langSets.map { case (l, _) => col(s"c_$l") }: _*))
      .withColumn("purity_ppm", expr("__cmax * 1000000 div n_spans"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("lang_major"), lit(langSets.head._1)).as("lang_major"),
        coalesce(col("purity_ppm"), lit(0L)).as("purity_ppm"))
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase
    * text — exact-dedup key, portable to any engine. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Content-defined chunk edges (rolling-hash boundaries — the
    * rsync/Borg/substring-dedup chunking family): a boundary lands
    * after position `i` whenever the hash of the trailing `window`
    * chars at `i` is ≡ 0 mod `divisor`, so boundaries are anchored to
    * CONTENT, not offsets — inserting a byte near the front shifts
    * every fixed-size chunk but leaves all content-defined chunks
    * after the edit identical. That shift-robustness is what makes
    * chunk-level dedup survive prepended boilerplate at 100 TB, where
    * [[graft.ops.Pipeline]]'s fixed windows would see every chunk as
    * new. Expected chunk length = `divisor` chars (geometric).
    *
    * Exactness: the window hash is the md5-derived [[Pipeline.hashHex]]
    * integer, so edges — and every downstream chunk fingerprint — are
    * bit-identical cross-engine. A narrow map: per row, `len` window
    * hashes and one filtered sequence; no shuffle, no UDF.
    * @return sorted edge positions `0 = e₀ < … = len(text)` as
    *         `array<long>` (a doc shorter than `window` is one chunk)
    */
  def cdcEdges(text: Column, window: Int = 8, divisor: Int = 64): Column = {
    val len = length(text).cast("long")
    val boundaries = filter(
      when(len >= window, sequence(lit(window.toLong), len))
        .otherwise(array().cast("array<long>")),
      i => pmod(Pipeline.hashHex(
        call_function("substr", text,
          (i - (window - 1)).cast("int"), lit(window)), 15),
        lit(divisor.toLong)) === 0L)
    array_distinct(array_sort(concat(array(lit(0L)), boundaries, array(len))))
  }

  /** Fold-form (column-DSL) twin of [[cdcChunks]]: (start, chunk)
    * pairs from [[cdcEdges]] — explode-ready struct array, one chunk
    * per edge gap. Retained as the spec's equivalence reference
    * (VectorExprsSpec proves native ≡ fold); the native expression is
    * the production entry point — this form pays an interpreted
    * lambda + an md5 Column tree per char position. */
  def cdcChunksFold(text: Column, window: Int = 8, divisor: Int = 64): Column = {
    val edges = cdcEdges(text, window, divisor)
    zip_with(
      slice(edges, lit(1), size(edges) - 1),
      slice(edges, lit(2), size(edges) - 1),
      (a, b) => struct(a.as("start"),
        call_function("substr", text,
          (a + 1).cast("int"), (b - a).cast("int")).as("chunk")))
  }

  /** Content-defined chunks as (start, chunk) pairs — ONE compiled
    * pass per document ([[graft.plans.CdcChunksExpression]]), md5-hex60
    * boundary hash: bit-identical to [[cdcChunksFold]] and to the
    * DuckDB oracle's `('0x'||substr(md5(window),1,15))::BIGINT % d`
    * form, without the interpreted per-char lambda. */
  def cdcChunks(text: Column, window: Int = 8, divisor: Int = 64): Column =
    graft.plans.NativeCols.cdcChunks(text, window, divisor, useMd5 = true)

  /** Production-speed content-defined chunks: Rabin–Karp rolling hash
    * over code points mod 2³¹−1 ([[graft.plans.VectorOps.CdcHashB]]
    * base) — O(1) per position instead of one md5 per position, the
    * form to run at 100 TB. Same chunk SEMANTICS (content-anchored
    * edges, expected length = divisor), different — but still fully
    * oracle-expressible — boundary set: the window hash is 8 exact
    * integer multiply-adds, so DuckDB reproduces it term-by-term
    * (td_content_chunks_fast hash-matches end to end). */
  def cdcChunksFast(text: Column, window: Int = 8, divisor: Int = 64): Column =
    graft.plans.NativeCols.cdcChunks(text, window, divisor, useMd5 = false)

  /** Canonical text for punctuation/case-insensitive exact dedup:
    * lowercase, non-alphanumerics → space, whitespace runs collapsed,
    * trimmed. A narrow codegen'd map (regex stays in the
    * RE2-compatible subset so any engine computes the same bytes);
    * `md5(canonicalize(..))` is the dedup key that catches "same doc,
    * different punctuation" — the miss class of [[fingerprint]]. */
  def canonicalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** PII redaction: apply (regex → replacement-token) rules left to
    * right. A narrow codegen'd map over the corpus — the shape that
    * matters when scrubbing 100 TB is a single pass. Patterns must
    * stay within the RE2-compatible subset (no lookaround) so the
    * same rules run on any engine. */
  def scrubPii(text: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(text) { case (t, (p, r)) => regexp_replace(t, p, r) }

  /** Total match count of the given PII patterns (audit metric for a
    * scrub pass). */
  def piiCount(text: Column, patterns: Seq[String]): Column =
    patterns.map(p => size(regexp_extract_all(text, lit(p), lit(0))))
      .reduce(_ + _)

  /** Per-document top-k TF-IDF terms, fully integer-deterministic:
    * idf is the scaled integer `1_000_000 · n_docs div df` (integer
    * division — `log` differs in the last ulp across engines' libm,
    * scaled-ratio idf is exact and rank-equivalent for df ordering),
    * score = tf · idf. Ranking ties break on the term itself.
    *
    * Scale shape: tokenize+explode is a narrow codegen map; tf is one
    * shuffle on (doc, term) with map-side combine; df is vocab-sized
    * and broadcasts into the probe join; top-k is a per-doc window.
    * Empty documents are excluded (no terms — and the SQL-engine
    * split-of-empty-string divergence lives exactly there).
    */
  def tfIdfTopTerms(docs: org.apache.spark.sql.DataFrame,
                    idCol: String, textCol: String,
                    k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nonEmpty = docs.filter(length(trim(col(textCol))) > 0)
    // words feeds tf, df AND n_docs — materialize once
    val words = nonEmpty.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("term"))
      .localCheckpoint(eager = false)
    val tf = words.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = words.select(col("id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = words.select(col("id")).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf_scaled", expr("1000000 * n_docs div df"))
      .withColumn("score", col("tf") * col("idf_scaled"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("df"),
        col("score"))
  }

  /** Corpus-frequency quality feature: per document, how many of its
    * token occurrences use words whose corpus frequency is below
    * `rareThreshold` — the integer-valued core of an LM-style
    * "surprisal" score (float log-prob sums are not portable across
    * engines; counts are). The frequency table is tiny (vocab-sized)
    * and broadcasts into the per-doc join.
    */
  def rareWordCounts(docs: org.apache.spark.sql.DataFrame,
                     idCol: String, textCol: String,
                     rareThreshold: Long): org.apache.spark.sql.DataFrame = {
    // words feeds BOTH the frequency aggregate and the probe side;
    // without materialization the corpus scan + tokenize + explode
    // runs twice (the project's two-branch recompute landmine)
    val words = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("w"))
      .localCheckpoint(eager = false)
    val freq = words.groupBy(col("w")).agg(count(lit(1)).as("freq"))
    words
      .join(broadcast(freq), Seq("w"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("freq") < rareThreshold, 1).otherwise(0)).as("n_rare"))
  }

  /** Frequent token co-occurrence mining (the market-basket /
    * collocation primitive: phrase discovery, stopword-set induction,
    * template detection): pairs of tokens appearing together in at
    * least `minDocs` documents, counted at the document level
    * (within-doc repeats collapse first).
    *
    * Scale discipline is the Apriori property: a pair can reach
    * `minDocs` support only if BOTH tokens do, so the vocab-sized
    * document-frequency table filters (as a BROADCAST) each doc's
    * token set BEFORE any pair is generated — the pair fan-out is
    * C(frequent tokens in doc, 2), not C(all tokens, 2). A
    * deterministic per-doc cap (`maxDocTokens`, lexicographic — NOT
    * hash order, so the oracle can reproduce it) bounds the worst-case
    * doc. The pair generation itself is a doc-keyed self-join: one
    * exchange on doc id, candidate volume bounded per doc, then a
    * map-side-partial count per pair. Nothing collects; the pair
    * table is ≤ C(|frequent vocab|, 2).
    *
    * Association strength is reported as integer-PPM lift —
    * `1 000 000 · n_ab · N div (df_a · df_b)` (= P(a,b)/(P(a)·P(b))
    * scaled, the exact-arithmetic stand-in for PMI's float log) —
    * > 10⁶ means the pair co-occurs more than independence predicts.
    * The numerator is computed in DECIMAL(38,0) unconditionally:
    * with support `minDocs = N/5`, any surviving pair already has
    * `n_ab·N > N²/5`, so plain Long (`10⁶·n_ab·N`) would wrap
    * silently past ~3 M docs — far below any real corpus. DECIMAL
    * holds to 10³² docs; `div` returns the same BIGINT the oracle
    * hashes.
    *
    * @param totalDocs corpus size N for the lift denominator
    * @return (token_a, token_b, n_docs, lift_ppm) with
    *         token_a < token_b and n_docs ≥ minDocs
    */
  def cooccurrence(docs: org.apache.spark.sql.DataFrame,
                   idCol: String, textCol: String,
                   minDocs: Long, totalDocs: Long,
                   maxDocTokens: Int = 64):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol).as("doc"),
        explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .filter(length(col("tok")) > 0)
    val capped = toks
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc")).orderBy(col("tok"))))
      .filter(col("rn") <= maxDocTokens)
      .drop("rn")
      // feeds the df aggregate AND both sides of the pair join
      .localCheckpoint(eager = false)
    val freq = capped.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
    val ft = capped.join(broadcast(freq.select(col("tok"))), Seq("tok"))
    ft.select(col("doc"), col("tok").as("token_a"))
      .join(ft.select(col("doc"), col("tok").as("token_b")), Seq("doc"))
      .filter(col("token_a") < col("token_b"))
      .groupBy(col("token_a"), col("token_b"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      // vocab-sized df table broadcasts in twice for the lift terms
      .join(broadcast(freq.select(col("tok").as("token_a"),
        col("df").as("__dfa"))), Seq("token_a"))
      .join(broadcast(freq.select(col("tok").as("token_b"),
        col("df").as("__dfb"))), Seq("token_b"))
      .withColumn("lift_ppm",
        expr(s"(cast(1000000 as decimal(38,0)) * n_docs * ${totalDocs}L)" +
          s" div (cast(__dfa as decimal(38,0)) * __dfb)"))
      .select(col("token_a"), col("token_b"), col("n_docs"),
        col("lift_ppm"))
  }

  /** Latin accent folding (the Unicode-normalization step of a
    * multilingual dedup/canonicalization pass): one `translate` —
    * a codegen'd per-char table lookup, no regex, no UDF. Covers the
    * Latin-1/Latin-Extended letters; characters outside the table
    * pass through unchanged. */
  private val accentGroups = Seq(
    "áàâäãåā" -> 'a', "éèêëē" -> 'e', "íìîïī" -> 'i', "óòôöõøō" -> 'o',
    "úùûüū" -> 'u', "ýÿ" -> 'y', "ñ" -> 'n', "çćč" -> 'c',
    "ÁÀÂÄÃÅĀ" -> 'A', "ÉÈÊËĒ" -> 'E', "ÍÌÎÏĪ" -> 'I', "ÓÒÔÖÕØŌ" -> 'O',
    "ÚÙÛÜŪ" -> 'U', "ÝŸ" -> 'Y', "Ñ" -> 'N', "ÇĆČ" -> 'C')
  private val accented = accentGroups.map(_._1).mkString
  private val folded =
    accentGroups.map { case (g, t) => t.toString * g.length }.mkString
  def foldAccents(text: Column): Column =
    translate(text, accented, folded)

  /** Bigram-LM document fluency score (the CCNet-style perplexity
    * filter, made exact): the corpus itself is the LM; each bigram
    * contributes its MLE conditional probability P(w₂|w₁) =
    * c(w₁w₂)/c(w₁·) as the scaled integer `c(w₁w₂)·10⁶ div c(w₁·)`
    * (every term exact — float log-prob sums differ in the last ulp
    * across engines, per-term scaled ratios never do). Per doc:
    * the mean scaled conditional probability and the fraction of
    * singleton bigrams (corpus count 1 — the OOV analog).
    *
    * Scale shape: bigram explode is a narrow codegen map; the bigram
    * and first-word count tables are vocab²-bounded aggregates with
    * map-side combine, joined back keyed by bigram/word (AQE handles
    * the build-side size choice at real scale); final agg is one
    * shuffle per doc id.
    *
    * @return (id, n_bigrams, mean_cond_ppm, singleton_ppm); docs with
    *         fewer than 2 tokens score 0 bigrams and 0 ppm.
    */
  def bigramLmScore(docs: org.apache.spark.sql.DataFrame,
                    idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val base = docs.select(col(idCol).as("id"))
    // (id, w1, bigram) with multiplicity — feeds counts AND the probe.
    // Native one-pass gram builder; w1 recovers as the prefix before
    // the gram's separating space (tokens never contain whitespace, so
    // substring_index is exact — incl. empty boundary tokens).
    val bi = docs
      .select(col(idCol).as("id"),
        explode(graft.plans.NativeCols.positionedGrams(col(textCol), 2))
          .as("bg"))
      .select(col("id"),
        substring_index(col("bg"), " ", 1).as("w1"), col("bg"))
      .localCheckpoint(eager = false)
    val bigramCounts = bi.groupBy(col("bg")).agg(count(lit(1)).as("cbg"))
    val firstCounts = bi.groupBy(col("w1")).agg(count(lit(1)).as("cw1"))
    val perDoc = bi
      .join(bigramCounts, Seq("bg"))
      .join(firstCounts, Seq("w1"))
      .withColumn("cond_ppm", expr("cbg * 1000000L div cw1"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        expr("sum(cond_ppm) div count(1)").as("mean_cond_ppm"),
        expr("sum(case when cbg = 1 then 1000000L else 0L end) div count(1)")
          .as("singleton_ppm"))
    base.select(col("id"))
      .join(perDoc, Seq("id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("mean_cond_ppm", coalesce(col("mean_cond_ppm"), lit(0L)))
      .withColumn("singleton_ppm", coalesce(col("singleton_ppm"), lit(0L)))
  }

  /** Gopher-style heuristic quality-rule flags (Rae et al. 2021,
    * "Scaling Language Models" §A1.1) — the rules the repetition
    * filters ([[graft.plans.NativeCols]] RepetitionStats) do not
    * cover. Every rule is an integer comparison (ratios are
    * cross-multiplied, never divided) so the flags are exact across
    * engines. All narrow codegen maps — no shuffle.
    *
    * Rules: word count within [minWords, maxWords]; mean word length
    * within [3, 10]; hash/ellipsis symbol count ≤ 10% of words; ≥ 80%
    * of words contain an alphabetic character; at least `minStopHits`
    * stopword occurrences.
    */
  def gopherQualityFlags(text: Column, stopwords: Seq[String],
      minWords: Int = 50, maxWords: Int = 100000,
      minStopHits: Int = 2): Seq[Column] = {
    val toks = tokens(text)
    val n = size(toks)
    val sumLen = coalesce(
      aggregate(toks, lit(0), (acc, t) => acc + length(t)), lit(0))
    val nSymbols = size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0)))
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]")))
    val stopArr = array(stopwords.map(lit): _*)
    val stopHits = size(filter(toks, t => array_contains(stopArr, t)))
    Seq(
      (n >= minWords && n <= maxWords).as("ok_word_count"),
      // 3 ≤ sumLen/n ≤ 10 without the division
      (n > 0 && sumLen >= n * 3 && sumLen <= n * 10).as("ok_mean_word_len"),
      (nSymbols * 10 <= n).as("ok_symbol_ratio"),
      (n > 0 && nAlpha * 5 >= n * 4).as("ok_alpha_words"),
      (stopHits >= minStopHits).as("ok_stopwords"))
  }

  /** Non-empty lines of a document, each trimmed. */
  def docLines(text: Column): Column =
    transform(filter(split(text, "\n"), l => length(trim(l)) > 0),
      l => trim(l))

  /** Gopher line-level repetition signals (Rae et al. 2021 §A1.1):
    * the "duplicate line fraction" / "duplicate line character
    * fraction" rules — how many non-empty lines repeat within the
    * document, and how many characters sit inside repeated lines.
    * The n-gram half of the Gopher repetition rule set is
    * [[graft.plans.NativeCols.repetitionStats]]; together they form
    * the full repetition filter. Outputs are integers only — callers
    * derive the fractions — so every value is exact cross-engine.
    * A narrow per-row map (the per-line membership scan is O(L²) in
    * the LINE count of one document, never across documents): no
    * shuffle, scales as a linear pass over the corpus.
    */
  def lineRepetitionSignals(text: Column): Seq[Column] = {
    val lines = docLines(text)
    val nLines = size(lines)
    val dupLines = nLines - size(array_distinct(lines))
    val dupLineChars = coalesce(aggregate(
      filter(lines, l => size(filter(lines, m => m === l)) >= 2),
      lit(0), (acc, l) => acc + length(l)), lit(0))
    val lineChars = coalesce(
      aggregate(lines, lit(0), (acc, l) => acc + length(l)), lit(0))
    Seq(nLines.as("n_lines"), dupLines.as("dup_lines"),
      dupLineChars.as("dup_line_chars"), lineChars.as("line_chars"))
  }

  /** Keep-first-occurrence dedup of an array, order preserved —
    * the within-document repeated-line cleanup. */
  def dedupKeepFirst(arr: Column): Column =
    filter(arr, (x, i) => array_position(arr, x) === i + 1)

  /** C4 line filter (Raffel et al. 2020 §2.2): lines kept iff they
    * end in a terminal punctuation mark, have at least `minWords`
    * words, and contain no banned phrase (case-insensitive). */
  def c4KeptLines(text: Column, minWords: Int = 5,
      banned: Seq[String] = Seq("javascript")): Column =
    filter(docLines(text), l => {
      val low = lower(l)
      banned.foldLeft(
        l.rlike("[.!?\"']$") && size(split(l, "\\s+")) >= minWords) {
        (acc, b) => acc && !low.contains(b)
      }
    })

  /** C4-style document cleaning (Raffel et al. 2020 §2.2) as one
    * narrow transform: per document, the kept-line count after the
    * [[c4KeptLines]] filter, the page-level keep decision (≥
    * `minKeptLines` retained lines, no "lorem ipsum", no curly
    * brace), and the cleaned text both as-is and with repeated lines
    * collapsed to their first occurrence ([[dedupKeepFirst]]) —
    * values pinned by md5 so the whole rewritten document is
    * oracle-checkable. Zero shuffle; scales as a linear scan.
    */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5, minKeptLines: Int = 3,
      banned: Seq[String] = Seq("javascript")): DataFrame = {
    df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("kept", c4KeptLines(col("text"), minWords, banned))
      .withColumn("dedup", dedupKeepFirst(col("kept")))
      .select(col("id"),
        size(docLines(col("text"))).as("n_lines"),
        size(col("kept")).as("n_kept"),
        (size(col("kept")) >= minKeptLines &&
          !lower(col("text")).contains("lorem ipsum") &&
          !col("text").contains("{")).as("keep_doc"),
        md5(concat_ws("\n", col("kept"))).as("clean_md5"),
        md5(concat_ws("\n", col("dedup"))).as("dedup_md5"))
  }

  /** Train a hashed-feature linear text classifier from labeled seed
    * documents — the fastText/CCNet quality-filter shape (Joulin et
    * al. 2016; CCNet's LM/quality classifiers), trained in-engine and
    * exactly reproducible cross-engine.
    *
    * Features are the hashing trick: token → md5 bucket in
    * [0, buckets) ([[graft.ops.Pipeline.hashBucket]], the
    * oracle-portable hash). The weight table is therefore BOUNDED at
    * `buckets` rows no matter how large the corpus vocabulary grows —
    * at 100 TB it still broadcasts. Training is one map-side-
    * combinable count aggregation over seed tokens (≤ `buckets`
    * groups) plus a broadcast of the 1-row class totals; no driver
    * collect, no iteration.
    *
    * Weights are Laplace-smoothed class-conditional token-rate
    * differences in scaled-INTEGER arithmetic (`div`, not `log` —
    * libm log differs in the last ulp across engines, integer ratios
    * are exact):
    *   weight(b) = (posCnt+1)·scale div (posTot+buckets)
    *             - (negCnt+1)·scale div (negTot+buckets)
    * Buckets never seen in the seed get no row: absent features score
    * 0 (neutral), matching the smoothing's symmetric prior.
    *
    * `labelCol` must be boolean; NULL labels contribute to neither
    * class (unlabeled seeds are ignored, not misread as negatives).
    */
  def trainHashedClassifier(seed: DataFrame, textCol: String,
      labelCol: String, buckets: Int = 4096,
      scale: Long = 1000000L): DataFrame = {
    require(buckets > 0 && scale > 0, "buckets and scale must be positive")
    val toks = seed.select(col(labelCol).as("_pos"),
      explode(tokens(col(textCol))).as("_tok"))
    val counts = toks
      .select(col("_pos"), Pipeline.hashBucket(col("_tok"), buckets).as("bucket"))
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("_pos"), 1L).otherwise(0L)).as("pos_cnt"),
        sum(when(!col("_pos"), 1L).otherwise(0L)).as("neg_cnt"))
    val totals = counts.agg(
      sum(col("pos_cnt")).as("pos_tot"), sum(col("neg_cnt")).as("neg_tot"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (expr(s"(pos_cnt + 1) * ${scale}L div (pos_tot + $buckets)") -
          expr(s"(neg_cnt + 1) * ${scale}L div (neg_tot + $buckets)"))
          .as("weight"))
  }

  /** Score documents with a [[trainHashedClassifier]] weight table:
    * per-document sum of bucket weights over its tokens (token
    * multiplicity counts). One narrow map (tokenize + bucket), one
    * BROADCAST join against the bounded weight table, one keyed
    * aggregation — a single shuffle over the corpus regardless of
    * scale. Documents with no tokens (or only unseen buckets) score
    * 0 via the left join, never drop out. */
  def scoreHashedClassifier(docs: DataFrame, idCol: String,
      textCol: String, weights: DataFrame,
      buckets: Int = 4096): DataFrame = {
    val scored = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("_tok"))
      .select(col(idCol), Pipeline.hashBucket(col("_tok"), buckets).as("bucket"))
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("weight")).as("score"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("score"), lit(0L)).as("score"))
  }

  /** md5 feature-hash bucket of a token: first 15 hex chars as a
    * 60-bit integer, mod `dim`. Portable (every engine has md5), so
    * hashed-TF features are cross-engine value-checkable — the same
    * portability/speed trade as [[graft.ops.Dedup.simhashMd5Df]]. */
  def md5Bucket(token: Column, dim: Int): Column =
    pmod(conv(substring(md5(token), 1, 15), 16, 10).cast("long"),
      lit(dim.toLong)).cast("int")

  /** Feature hashing (the hashing trick, HashingVectorizer): each
    * document becomes a fixed `dim`-bucket term-frequency table with
    * NO vocabulary pass — token t counts into bucket md5(t) mod dim.
    * The no-model bridge from the text pipeline to the vector/ANN
    * pipeline: downstream cosine/LSH/IVF run on these exactly as on
    * learned embeddings, and the integer counts keep every comparison
    * exact.
    *
    * Returns the SPARSE (id, pos, tf) relation — one keyed shuffle
    * with map-side combine, never a dim-wide dense row. Use
    * [[hashedTfVectors]] for the dense array form.
    */
  def hashedTf(docs: DataFrame, idCol: String, textCol: String,
               dim: Int): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(graft.plans.NativeCols.hashedGramBuckets(
          col(textCol), dim, bigrams = false)).as("pos"))
      .groupBy(col("id"), col("pos"))
      .agg(count(lit(1)).as("tf"))

  /** Fold-form twin of [[hashedTf]] — the spec's equivalence
    * reference ([[graft.plans.HashedGramBucketsExpression]] is the
    * production path: one compiled pass instead of explode-per-token
    * through the md5 Column chain). */
  private[graft] def hashedTfFold(docs: DataFrame, idCol: String,
      textCol: String, dim: Int): DataFrame =
    docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("t"))
      .select(col("id"), md5Bucket(col("t"), dim).as("pos"))
      .groupBy(col("id"), col("pos"))
      .agg(count(lit(1)).as("tf"))

  /** Dense-vector form of [[hashedTf]]: the per-doc buckets
    * reassemble into an `array<double>` of length `dim` (absent
    * buckets 0.0) — the shape [[Similarity]]'s cosine/LSH/IVF ops
    * consume. Per-doc state is bounded by `dim`, never vocabulary. */
  def hashedTfVectors(docs: DataFrame, idCol: String, textCol: String,
                      dim: Int): DataFrame =
    hashedTf(docs, idCol, textCol, dim)
      .groupBy(col("id"))
      .agg(map_from_entries(
        collect_list(struct(col("pos"), col("tf")))).as("m"))
      .select(col("id").as(idCol),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0L)).cast("double"))
          .as("tf_vec"))

  /** Per-group vocabulary richness — type-token ratio and hapax share
    * in exact integer ppm: the cheap templated/spam detector (machine-
    * generated or boilerplate-stuffed sources repeat a tiny vocabulary
    * → low TTR, low hapax share; natural text keeps minting one-off
    * words). One (group, word)-keyed shuffle with map-side combine,
    * then a |vocab|-sized collapse — token rows never reach the
    * driver and the second aggregate's input is already vocabulary-
    * bounded.
    *
    * @return (group, n_tokens, n_types, n_hapax, ttr_ppm, hapax_ppm)
    *         — ttr_ppm = types·10⁶ div max(tokens, 1); hapax_ppm =
    *         hapax·10⁶ div max(types, 1).
    */
  def vocabRichness(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val wc = docs
      .select(col(groupCol).as("group"),
        explode(tokens(col(textCol))).as("w"))
      .groupBy(col("group"), col("w"))
      .agg(count(lit(1)).as("c"))
    wc.groupBy(col("group"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("group"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("n_types * 1000000 div greatest(n_tokens, 1)").as("ttr_ppm"),
        expr("n_hapax * 1000000 div greatest(n_types, 1)").as("hapax_ppm"))
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS local-fingerprinting algorithm): hash
    * every word `k`-gram, slide a window of `w` consecutive gram
    * hashes, and in each window select the MINIMUM hash (ties →
    * rightmost position). The selected (position, hash) set is the
    * document's fingerprint, with the paper's two guarantees the
    * global-min schemes (minhash, [[fingerprint]]) lack:
    * any shared substring of length ≥ `w + k − 1` tokens is ALWAYS
    * detected (some window inside it selects the same gram in both
    * docs), and expected density is 2/(w+1) — fingerprint volume is a
    * tuned fraction of the corpus, position-addressable for span
    * reporting, robust to edits outside the shared region.
    *
    * Exactness: the gram hash is the md5-derived [[Pipeline.hashHex]]
    * 60-bit integer and selection is pure integer argmin with a
    * deterministic tie rule, so the fingerprint set hash-matches any
    * engine.
    *
    * Scale shape: the whole per-document selection runs inside the
    * native one-pass `winnow_fingerprints` codegen expression (a
    * monotonic deque over the gram-hash sequence — O(L) amortized),
    * so fingerprinting is a NARROW map with zero shuffle and zero
    * fan-out; only the selected ≈2·L/(w+1) fingerprints ever leave
    * the row. The DataFrame window formulation is kept as
    * [[winnowingFingerprintsFold]], the spec-proved semantic twin.
    *
    * @return (id, pos, h) — selected 0-based gram positions and
    *         their 60-bit hashes, distinct per (id, pos)
    */
  def winnowingFingerprints(docs: DataFrame, idCol: String,
      textCol: String, k: Int = 4, w: Int = 4): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(graft.plans.NativeCols.winnowFingerprints(
          col(textCol), k, w)).as("fp"))
      .select(col("id"), col("fp.pos").as("pos"), col("fp.h").as("h"))

  /** The original DataFrame/window form of [[winnowingFingerprints]]
    * — the semantic reference the native expression is verified
    * against (VectorExprsSpec): per-window argmin via a ×w window
    * explode + one (doc, window)-keyed row_number. */
  private[graft] def winnowingFingerprintsFold(docs: DataFrame,
      idCol: String, textCol: String, k: Int = 4, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val g = docs
      .select(col(idCol).as("id"),
        graft.plans.NativeCols.positionedGrams(col(textCol), k).as("garr"))
      .withColumn("ng", size(col("garr")))
      .filter(col("ng") > 0)
      .select(col("id"), col("ng"),
        posexplode(col("garr")).as(Seq("pos", "gram")))
      .withColumn("h", Pipeline.hashHex(col("gram"), 15))
    // 0-based window starts run [0, max(0, ng−w)]; the gram at pos
    // belongs to starts [max(0, pos−w+1), min(pos, max(0, ng−w))] —
    // a doc with fewer than w grams forms one short window.
    val smin = greatest(col("pos") - lit(w - 1), lit(0))
    val smax = least(col("pos"), greatest(col("ng") - lit(w), lit(0)))
    g.select(col("id"), col("pos"), col("h"),
        explode(sequence(smin, smax)).as("s"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("id", "s").orderBy(col("h"), col("pos").desc)))
      .filter(col("rn") === 1)
      .select(col("id"), col("pos"), col("h"))
      .distinct()
  }
}
