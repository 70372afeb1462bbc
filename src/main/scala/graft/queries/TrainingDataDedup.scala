package graft.queries

import graft.{GraftQuery, Tables}
import graft.fixtures.Planted
import graft.ops.{BloomJoin, Dedup, Multimodal, Pipeline, Profiling, Retrieval, Sampling, Similarity, Sketches, TextAnalysis, Winnowing}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication: exact, MinHash/LSH, SimHash, components,
  * spans, chunking, decontamination.
  *
  * Split from the original TrainingData.scala (round 11) —
  * query definitions are unchanged; TrainingData.all still
  * registers everything in the original order.
  */
object TrainingDataDedup {

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
      val corpus = Planted.corpus(d,
        (pmod(col("doc_id"), lit(7)) === 0) ->
          Seq("doc_id" -> (col("doc_id") + 1000000L)),
        (pmod(col("doc_id"), lit(31)) === 0) ->
          Seq("doc_id" -> (col("doc_id") + 2000000L)),
        (pmod(col("doc_id"), lit(31)) === 0) ->
          Seq("doc_id" -> (col("doc_id") + 3000000L)))
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
      val corpus = Planted.corpus(d,
        lit(true) -> Seq("doc_id" -> (col("doc_id") + 1000000L)))
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
      val corpus = Planted.corpus(d,
        (pmod(col("doc_id"), lit(5)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 1000000L),
          "text" -> concat(col("text"), lit(" xtra wrds"))))
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
      val corpus = Planted.corpus(d,
        (col("source") === "src0") -> Seq(
          "source" -> lit("srcX"),
          "text" -> concat(col("text"), lit(" xtra wrds"))))
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
      val corpus = Planted.corpus(d,
        (pmod(col("doc_id"), lit(5)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 1000000L),
          "text" -> concat(col("text"), lit(" xtra wrds"))))
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
      val corpus = Planted.corpus(d,
        (pmod(col("doc_id"), lit(5)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 1000000L),
          "text" -> concat(col("text"), lit(" xtra wrds"))))
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
      val corpus = Planted.corpus(d,
        (pmod(col("doc_id"), lit(5)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 1000000L),
          "text" -> concat(col("text"), lit(" xtra wrds"))))
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


  /** Quality-aware dedup ([[graft.ops.Dedup.dedupCorpusBy]]): same
    * planted corpus as [[td_dedup_survivors]], but the cluster
    * winner is the LONGEST member (score = text length), so the
    * planted "+ xtra wrds" copies beat their originals — the output
    * provably differs from lowest-id selection. */
  val td_dedup_best = GraftQuery(
    "td_dedup_best",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 150)
      val corpus = Planted.corpus(d,
        (pmod(col("doc_id"), lit(5)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 1000000L),
          "text" -> concat(col("text"), lit(" xtra wrds"))))
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
      val corpus = Planted.corpus(d,
        (pmod(col("doc_id"), lit(4)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 1000000L),
          "text" -> concat(upper(col("text")), lit("!!"))))
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
      val corpus = Planted.corpus(d.select(col("doc_id"), col("text")),
        (pmod(col("doc_id"), lit(5)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 1000000L),
          "text" -> concat(lit("PREFIX-2026 "), col("text"))))
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
      val corpus = Planted.corpus(d.select(col("doc_id"), col("text")),
        (pmod(col("doc_id"), lit(5)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 1000000L),
          "text" -> concat(lit("PREFIX-2026 "), col("text"))))
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
      val corpus = Planted.corpus(d,
        (pmod(col("doc_id"), lit(5)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 1000000L),
          "text" -> concat(col("text"), lit(" xtra wrds"))))
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
      val corpus = Planted.corpus(d,
        (pmod(col("doc_id"), lit(7)) === 0) ->
          Seq("doc_id" -> (col("doc_id") + 1000000L)))
      val aug = corpus.withColumn("text",
        when(pmod(col("doc_id"), lit(10)) === 0,
          concat(col("text"), lit(" zz yy xx ww vv uu tt ss")))
          .otherwise(col("text")))
      Winnowing.duplicatedSpans(aug, "doc_id", "text", n = 5)
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
      val corpus = Planted.corpus(d,
        (pmod(col("doc_id"), lit(7)) === 0) ->
          Seq("doc_id" -> (col("doc_id") + 1000000L)))
      val aug = corpus.withColumn("text",
        when(pmod(col("doc_id"), lit(10)) === 0,
          concat(col("text"), lit(" zz yy xx ww vv uu tt ss")))
          .otherwise(col("text")))
      Winnowing.removeDuplicatedSpans(aug, "doc_id", "text", n = 5)
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
      val corpus = Planted.corpus(d,
        (pmod(col("doc_id"), lit(5)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 1000000L),
          "text" -> concat(col("text"), lit(" ver2"))))
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


  /** Chunk-level (paragraph-analog) dedup retention per doc. */
  val td_chunk_dedup = GraftQuery(
    "td_chunk_dedup",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val corpus = Planted.corpus(d,
        (pmod(col("doc_id"), lit(7)) === 0) ->
          Seq("doc_id" -> (col("doc_id") + 1000000L)))
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


  /** Winnowing fingerprint pair mining ([[graft.ops.Dedup
    * .winnowingPairs]], the MOSS detector): planted twins carry a
    * PREPENDED preamble, the edit that shifts every fixed-offset
    * scheme — winnowing's content-anchored windows still share the
    * fingerprints of the common region (guaranteed for any shared
    * run ≥ w+k−1 tokens). Exact 60-bit md5 gram hashes; df cap 64
    * keeps template fingerprints out of the pair join. */
  val td_winnowing = GraftQuery(
    "td_winnowing",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 250)
        .select(col("doc_id"), col("text"))
      val corpus = Planted.corpus(d,
        (pmod(col("doc_id"), lit(7)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 1000000L),
          "text" -> concat(lit("intro preamble lines here "), col("text"))))
      Winnowing.winnowingPairs(corpus, "doc_id", "text", k = 4, w = 4,
        minShared = 3, maxDf = 64)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 250
        UNION ALL
        SELECT doc_id + 1000000, 'intro preamble lines here ' || text
        FROM documents WHERE doc_id < 250 AND doc_id % 7 = 0),
      base AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        FROM corpus),
      grams AS (
        SELECT doc_id, pos - 1 AS pos, len(t) - 3 AS ng,
          t[pos]||' '||t[pos+1]||' '||t[pos+2]||' '||t[pos+3] AS gram
        FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS pos
              FROM base WHERE n_tokens >= 4)),
      h AS (
        SELECT doc_id, pos, ng,
          CAST(('0x' || substring(md5(gram), 1, 15)) AS BIGINT) AS h
        FROM grams),
      wins AS (
        SELECT doc_id, pos, h,
          unnest(range(greatest(pos - 3, 0),
                       least(pos, greatest(ng - 4, 0)) + 1)) AS s
        FROM h),
      sel AS (
        SELECT doc_id, pos, h, ROW_NUMBER() OVER (
          PARTITION BY doc_id, s ORDER BY h, pos DESC) AS rn
        FROM wins),
      fp AS (SELECT DISTINCT doc_id, h FROM sel WHERE rn = 1),
      rare AS (
        SELECT doc_id, h FROM fp
        QUALIFY COUNT(*) OVER (PARTITION BY h) <= 64),
      nf AS (SELECT doc_id, COUNT(*) AS nfp FROM fp GROUP BY 1),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        FROM rare a JOIN rare b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      SELECT p.id_a, p.id_b, fa.nfp AS fp_a, fb.nfp AS fp_b, p.n_shared
      FROM pairs p JOIN nf fa ON fa.doc_id = p.id_a
      JOIN nf fb ON fb.doc_id = p.id_b
      ORDER BY id_a, id_b"""))


  /** Incremental winnowing probe ([[graft.ops.Dedup
    * .incrementalWinnowPairs]]): the per-batch operating mode — a
    * persisted fingerprint index is probed by the NEW batch's
    * fingerprints only (broadcast hash-set prune, global-df cap),
    * never re-fingerprinting the corpus. Planted preamble-shifted
    * twins land as new×index pairs. */
  val td_incremental_winnowing = GraftQuery(
    "td_incremental_winnowing",
    (s, dir) => {
      val d = Tables.documents(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id"), col("text"))
      val newBatch = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("text",
          concat(lit("intro preamble lines here "), col("text")))
      val index = Winnowing.winnowIndex(d, "doc_id", "text", k = 4, w = 4)
      Winnowing.incrementalWinnowPairs(newBatch, index, "doc_id", "text",
        k = 4, w = 4, minShared = 3, maxDf = 64)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 1000000, 'intro preamble lines here ' || text
        FROM documents WHERE doc_id < 150 AND doc_id % 5 = 0),
      base AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        FROM corpus),
      grams AS (
        SELECT doc_id, pos - 1 AS pos, len(t) - 3 AS ng,
          t[pos]||' '||t[pos+1]||' '||t[pos+2]||' '||t[pos+3] AS gram
        FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS pos
              FROM base WHERE n_tokens >= 4)),
      h AS (
        SELECT doc_id, pos, ng,
          CAST(('0x' || substring(md5(gram), 1, 15)) AS BIGINT) AS h
        FROM grams),
      wins AS (
        SELECT doc_id, pos, h,
          unnest(range(greatest(pos - 3, 0),
                       least(pos, greatest(ng - 4, 0)) + 1)) AS s
        FROM h),
      sel AS (
        SELECT doc_id, pos, h, ROW_NUMBER() OVER (
          PARTITION BY doc_id, s ORDER BY h, pos DESC) AS rn
        FROM wins),
      fp AS (SELECT DISTINCT doc_id, h FROM sel WHERE rn = 1),
      rare AS (
        SELECT doc_id, h FROM fp
        QUALIFY COUNT(*) OVER (PARTITION BY h) <= 64)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        COUNT(*) AS n_shared
      FROM rare a JOIN rare b ON a.h = b.h
      WHERE a.doc_id >= 1000000
        AND (b.doc_id < 1000000 OR a.doc_id < b.doc_id)
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
      ORDER BY id_a, id_b"""))

  /** The PERSISTED form of [[td_incremental_winnowing]]: the index is
    * written through [[graft.ops.Winnowing.writeWinnowIndex]] (h-range-
    * clustered files + DataSkipping stats manifest) and the probe runs
    * [[graft.ops.Winnowing.incrementalWinnowPairsPruned]], opening only
    * the files whose h-slice can hold a batch fingerprint. Same fixture
    * and oracle as the in-memory probe — pruning is a superset
    * guarantee, so the rows must be hash-identical; what changes is the
    * I/O shape, which is what makes the index a production artifact at
    * 100 TB (a batch of hashes touches O(|hashes|) files, not the
    * fleet). */
  val td_winnow_index_pruned = GraftQuery(
    "td_winnow_index_pruned",
    (s, dir) => {
      val stage = s"${System.getProperty("java.io.tmpdir")}/graft_winnowix_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val d = Tables.documents(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id"), col("text"))
      val newBatch = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("text",
          concat(lit("intro preamble lines here "), col("text")))
      Winnowing.writeWinnowIndex(s,
        Winnowing.winnowIndex(d, "doc_id", "text", k = 4, w = 4),
        stage, nFiles = 16)
      Winnowing.incrementalWinnowPairsPruned(s, newBatch, stage,
        "doc_id", "text", k = 4, w = 4, minShared = 3, maxDf = 64)
        .orderBy(col("id_a"), col("id_b"))
    },
    td_incremental_winnowing.oracle)

  /** Winnowing density sweep: measured fingerprint density vs the
    * paper's expected 2/(w+1) across window sizes — the tuning curve
    * an operator reads to pick the index-size/guarantee trade-off
    * (w up → smaller index, longer minimum guaranteed-detected run
    * w+k−1). Exact integer ppm; selection runs in the native
    * one-pass expression, so the sweep is three narrow scans.
    * Long bound: 10⁶·n_fp needs n_fp < ~9·10¹² fingerprints — cast
    * to DECIMAL (the cooccurrence discipline) past ~5·10¹³ corpus
    * grams. */
  val td_winnowing_density = GraftQuery(
    "td_winnowing_density",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val grams = docs.select(
          size(graft.plans.NativeCols.positionedGrams(col("text"), 4))
            .as("ng"))
        .agg(sum(col("ng")).as("n_grams"))
      val fps = Seq(4, 8, 16).map { w =>
        TextAnalysis.winnowingFingerprints(docs, "doc_id", "text", 4, w)
          .agg(count(lit(1)).as("n_fp"))
          .withColumn("w", lit(w))
      }.reduce(_ unionByName _)
      fps.crossJoin(broadcast(grams))
        .select(col("w"), col("n_grams"), col("n_fp"),
          expr("1000000 * n_fp div n_grams").as("density_ppm"),
          expr("2000000 div (w + 1)").as("expected_ppm"))
        .orderBy(col("w"))
    },
    Some("""WITH base AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        FROM documents),
      grams AS (
        SELECT doc_id, pos - 1 AS pos, len(t) - 3 AS ng,
          t[pos]||' '||t[pos+1]||' '||t[pos+2]||' '||t[pos+3] AS gram
        FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS pos
              FROM base WHERE n_tokens >= 4)),
      h AS (
        SELECT doc_id, pos, ng,
          CAST(('0x' || substring(md5(gram), 1, 15)) AS BIGINT) AS h
        FROM grams),
      tot AS (SELECT COUNT(*) AS n_grams FROM h),
      w4 AS (
        SELECT doc_id, pos, h,
          unnest(range(greatest(pos - 3, 0),
                       least(pos, greatest(ng - 4, 0)) + 1)) AS s
        FROM h),
      f4 AS (SELECT COUNT(*) AS n_fp FROM (
        SELECT DISTINCT doc_id, pos FROM (
          SELECT doc_id, pos, ROW_NUMBER() OVER (
            PARTITION BY doc_id, s ORDER BY h, pos DESC) AS rn
          FROM w4) WHERE rn = 1)),
      w8 AS (
        SELECT doc_id, pos, h,
          unnest(range(greatest(pos - 7, 0),
                       least(pos, greatest(ng - 8, 0)) + 1)) AS s
        FROM h),
      f8 AS (SELECT COUNT(*) AS n_fp FROM (
        SELECT DISTINCT doc_id, pos FROM (
          SELECT doc_id, pos, ROW_NUMBER() OVER (
            PARTITION BY doc_id, s ORDER BY h, pos DESC) AS rn
          FROM w8) WHERE rn = 1)),
      w16 AS (
        SELECT doc_id, pos, h,
          unnest(range(greatest(pos - 15, 0),
                       least(pos, greatest(ng - 16, 0)) + 1)) AS s
        FROM h),
      f16 AS (SELECT COUNT(*) AS n_fp FROM (
        SELECT DISTINCT doc_id, pos FROM (
          SELECT doc_id, pos, ROW_NUMBER() OVER (
            PARTITION BY doc_id, s ORDER BY h, pos DESC) AS rn
          FROM w16) WHERE rn = 1)),
      u AS (
        SELECT 4 AS w, (SELECT n_fp FROM f4) AS n_fp
        UNION ALL
        SELECT 8, (SELECT n_fp FROM f8)
        UNION ALL
        SELECT 16, (SELECT n_fp FROM f16))
      SELECT u.w, tot.n_grams, u.n_fp,
        CAST(1000000 * u.n_fp // tot.n_grams AS BIGINT) AS density_ppm,
        CAST(2000000 // (u.w + 1) AS BIGINT) AS expected_ppm
      FROM u, tot ORDER BY w"""))


  /** Span-level benchmark decontamination ([[graft.ops.Dedup
    * .scrubContaminationSpans]]): same benchmark split as
    * [[td_decontam]] (doc_id % 97), but the ACTION is surgical —
    * widen each colliding 3-gram by 2 tokens each side, merge, and
    * excise only the contaminated windows. Rewrites pinned by md5. */
  val td_decontam_spans = GraftQuery(
    "td_decontam_spans",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      Winnowing.scrubContaminationSpans(
        docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(97)) === 0),
        "doc_id", "text", n = 3, radius = 2)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_spans"),
          col("removed_tokens"), md5(col("clean_text")).as("clean_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH base AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
          CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
        FROM documents),
      bgrams AS (
        SELECT DISTINCT t[pos]||' '||t[pos+1]||' '||t[pos+2] AS gram
        FROM (SELECT t, unnest(range(1, len(t) - 1)) AS pos
              FROM base WHERE doc_id % 97 = 0 AND n_tokens >= 3)),
      cgrams AS (
        SELECT doc_id, pos - 1 AS pos,
          t[pos]||' '||t[pos+1]||' '||t[pos+2] AS gram
        FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS pos
              FROM base WHERE doc_id % 97 <> 0 AND n_tokens >= 3)),
      seeds AS (
        SELECT c.doc_id, greatest(c.pos - 2, 0) AS pos, c.pos + 4 AS e
        FROM cgrams c JOIN bgrams USING (gram)),
      isl AS (
        SELECT doc_id, pos, e,
          MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        FROM seeds),
      isl2 AS (
        SELECT doc_id, pos, e,
          SUM(CASE WHEN pme IS NULL OR pos > pme THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM isl),
      ivl AS (
        SELECT doc_id, island, MIN(pos) AS s, MAX(e) AS e
        FROM isl2 GROUP BY 1, 2),
      ns AS (SELECT doc_id, COUNT(*) AS n_spans FROM ivl GROUP BY 1),
      toks AS (
        SELECT doc_id, pos, t[pos] AS tok
        FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS pos
              FROM base WHERE doc_id % 97 <> 0 AND n_tokens > 0)),
      kept AS (
        SELECT tk.doc_id, tk.pos, tk.tok FROM toks tk
        WHERE NOT EXISTS (SELECT 1 FROM ivl v
          WHERE v.doc_id = tk.doc_id
            AND tk.pos - 1 >= v.s AND tk.pos - 1 <= v.e)),
      rebuilt AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
          COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id)
      SELECT b.doc_id, CAST(b.n_tokens AS INTEGER) AS n_tokens,
        CAST(COALESCE(ns.n_spans, 0) AS BIGINT) AS n_spans,
        CAST(b.n_tokens - COALESCE(r.n_kept, 0) AS BIGINT)
          AS removed_tokens,
        md5(COALESCE(r.clean_text, '')) AS clean_md5
      FROM base b
      LEFT JOIN ns USING (doc_id)
      LEFT JOIN rebuilt r USING (doc_id)
      WHERE b.doc_id % 97 <> 0
      ORDER BY b.doc_id"""))

}
