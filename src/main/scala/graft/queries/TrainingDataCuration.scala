package graft.queries

import graft.{GraftQuery, Tables}
import graft.fixtures.Planted
import graft.ops.{Dedup, Pipeline, Winnowing}
import org.apache.spark.sql.functions._

/** Curation composition + sketch-accuracy queries (round-12
  * continuation): asymmetric containment mining and its dedup
  * action, minhash estimation error, per-source dedup ROI, and the
  * end-to-end quality->dedup->decontam funnel. Split from
  * TrainingDataDedup.scala to keep the themed modules under the
  * 1,200-line discipline; definitions unchanged.
  */
object TrainingDataCuration {

  /** EXACT asymmetric near-containment pairs
    * ([[Winnowing.containmentPairs]]) — the quote/subset detector Jaccard
    * misses: planted half-slices (+2e6 twins, fully contained) and
    * half-slices with a novel tail (+3e6 twins, contained ≈ 0.8)
    * against the base corpus. The oracle is brute-force all-pairs
    * directional containment, so the match proves the one-sided
    * prefix filter misses nothing. Containment is one small-int
    * division — bit-identical across engines. */
  val td_containment = GraftQuery(
    "td_containment",
    (s, dir) => {
      val base = Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val toks = split(trim(col("text")), "\\s+")
      val half = array_join(
        slice(toks, lit(1), (size(toks) / 2).cast("int")), " ")
      val plantable = length(trim(col("text"))) > 0 && size(toks) >= 8
      val corpus = Planted.corpus(base,
        (plantable && pmod(col("doc_id"), lit(6)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 2000000L), "text" -> half),
        (plantable && pmod(col("doc_id"), lit(9)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 3000000L),
          "text" -> concat(half, lit(" qq zz extra tail"))))
      Winnowing.containmentPairs(corpus, "doc_id", "text", n = 3,
          threshold = 0.75, minShingles = 4)
        .orderBy(col("id_contained"), col("id_container"))
    },
    Some("""WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 200),
    tok0 AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS t
      FROM base WHERE length(trim(text)) > 0),
    plantable AS (SELECT * FROM tok0 WHERE len(t) >= 8),
    corpus AS (
      SELECT doc_id, text FROM base
      UNION ALL
      SELECT doc_id + 2000000, array_to_string(t[1:len(t)//2], ' ')
      FROM plantable WHERE doc_id % 6 = 0
      UNION ALL
      SELECT doc_id + 3000000,
        array_to_string(t[1:len(t)//2], ' ') || ' qq zz extra tail'
      FROM plantable WHERE doc_id % 9 = 0),
    tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM corpus),
    sh AS (
      SELECT doc_id,
        CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
             ELSE list_distinct(list_transform(range(1, len(t)-1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
      FROM tok)
    SELECT id_contained, id_container, n_sh_contained, n_sh_container,
      containment
    FROM (
      SELECT a.doc_id AS id_contained, b.doc_id AS id_container,
        CAST(len(a.s) AS INTEGER) AS n_sh_contained,
        CAST(len(b.s) AS INTEGER) AS n_sh_container,
        CAST(len(list_filter(a.s, x -> list_contains(b.s, x))) AS DOUBLE)
          / len(a.s) AS containment
      FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
      WHERE len(a.s) >= 4)
    WHERE containment >= 0.75
    ORDER BY id_contained, id_container"""))


  /** The containment dedup ACTION ([[Winnowing.dropContained]]): survivors
    * after dropping docs ≥ 0.75-contained in a strictly dominant
    * other (larger shingle set, tie on lower id — an identical pair
    * keeps exactly its lowest id). Same planted corpus as
    * td_containment: the +2e6/+3e6 slices must vanish, their hosts
    * must survive. */
  val td_containment_dedup = GraftQuery(
    "td_containment_dedup",
    (s, dir) => {
      val base = Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val toks = split(trim(col("text")), "\\s+")
      val half = array_join(
        slice(toks, lit(1), (size(toks) / 2).cast("int")), " ")
      val plantable = length(trim(col("text"))) > 0 && size(toks) >= 8
      val corpus = Planted.corpus(base,
        (plantable && pmod(col("doc_id"), lit(6)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 2000000L), "text" -> half),
        (plantable && pmod(col("doc_id"), lit(9)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 3000000L),
          "text" -> concat(half, lit(" qq zz extra tail"))))
      Winnowing.dropContained(corpus, "doc_id", "text", n = 3,
          threshold = 0.75, minShingles = 4)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 200),
    tok0 AS (
      SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS t
      FROM base WHERE length(trim(text)) > 0),
    plantable AS (SELECT * FROM tok0 WHERE len(t) >= 8),
    corpus AS (
      SELECT doc_id, text FROM base
      UNION ALL
      SELECT doc_id + 2000000, array_to_string(t[1:len(t)//2], ' ')
      FROM plantable WHERE doc_id % 6 = 0
      UNION ALL
      SELECT doc_id + 3000000,
        array_to_string(t[1:len(t)//2], ' ') || ' qq zz extra tail'
      FROM plantable WHERE doc_id % 9 = 0),
    tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM corpus),
    sh AS (
      SELECT doc_id,
        CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
             ELSE list_distinct(list_transform(range(1, len(t)-1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
      FROM tok),
    drops AS (
      SELECT DISTINCT a.doc_id
      FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
      WHERE len(a.s) >= 4
        AND CAST(len(list_filter(a.s, x -> list_contains(b.s, x)))
              AS DOUBLE) / len(a.s) >= 0.75
        AND (len(b.s) > len(a.s)
          OR (len(b.s) = len(a.s) AND b.doc_id < a.doc_id)))
    SELECT doc_id FROM corpus
    WHERE doc_id NOT IN (SELECT doc_id FROM drops)
    ORDER BY doc_id"""))


  /** MinHash ESTIMATION-ERROR report — "measure, don't guess" for the
    * sketch itself: on planted (original, tailed-copy) pairs, the
    * 32-hash md5 minhash estimate of Jaccard vs the exact value, in
    * ppm. The report quantifies the sketch error an LSH dedup run
    * actually carries (the number that justifies numHashes/band
    * choices); signatures use [[Dedup.minhashSignatureMd5]] so DuckDB
    * recomputes them bit-for-bit. Estimates and exact values are both
    * integer ppm — hash-green, no float tolerance. */
  val td_minhash_error = GraftQuery(
    "td_minhash_error",
    (s, dir) => {
      val base = Tables.documents(s, dir)
        .filter(col("doc_id") < 120 && length(trim(col("text"))) > 0)
      val orig = base.filter(pmod(col("doc_id"), lit(4)) === 0)
        .select(col("doc_id").as("id_a"),
          Dedup.shingles(col("text"), 3).as("sh_a"))
      val copy = base.filter(pmod(col("doc_id"), lit(4)) === 0)
        .select(col("doc_id").as("id_a"),
          Dedup.shingles(
            concat(col("text"), lit(" xtra tail wrds end")), 3).as("sh_b"))
      orig.join(copy, Seq("id_a"))
        .select(col("id_a"), (col("id_a") + 1000000L).as("id_b"),
          Dedup.minhashSignatureMd5(col("sh_a"), 32).as("sig_a"),
          Dedup.minhashSignatureMd5(col("sh_b"), 32).as("sig_b"),
          col("sh_a"), col("sh_b"))
        .withColumn("matches",
          size(filter(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => x - y), v => v === 0)).cast("long"))
        .withColumn("n_inter",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .withColumn("n_union",
          size(array_union(col("sh_a"), col("sh_b"))).cast("long"))
        .select(col("id_a"), col("id_b"),
          expr("matches * 1000000 div 32").as("est_ppm"),
          expr("n_inter * 1000000 div n_union").as("exact_ppm"),
          expr("abs(matches * 1000000 div 32 -" +
            " n_inter * 1000000 div n_union)").as("err_ppm"))
        .orderBy(col("id_a"))
    },
    Some("""WITH base AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id < 120 AND length(trim(text)) > 0 AND doc_id % 4 = 0),
    v AS (
      SELECT doc_id, text AS ta, text || ' xtra tail wrds end' AS tb
      FROM base),
    sh AS (
      SELECT doc_id,
        CASE WHEN len(sa) < 3 THEN [array_to_string(sa, ' ')]
             ELSE list_distinct(list_transform(range(1, len(sa)-1),
                    i -> sa[i] || ' ' || sa[i+1] || ' ' || sa[i+2])) END AS s_a,
        CASE WHEN len(sb) < 3 THEN [array_to_string(sb, ' ')]
             ELSE list_distinct(list_transform(range(1, len(sb)-1),
                    i -> sb[i] || ' ' || sb[i+1] || ' ' || sb[i+2])) END AS s_b
      FROM (SELECT doc_id,
              string_split_regex(trim(ta), '\s+') AS sa,
              string_split_regex(trim(tb), '\s+') AS sb FROM v)),
    sig AS (
      SELECT doc_id, j,
        MIN(CAST(('0x' || substring(md5(CAST(j AS VARCHAR) || '|' || ga),
          1, 15)) AS BIGINT)) AS ha
      FROM (SELECT doc_id, unnest(s_a) AS ga FROM sh), range(0, 32) r(j)
      GROUP BY doc_id, j),
    sigb AS (
      SELECT doc_id, j,
        MIN(CAST(('0x' || substring(md5(CAST(j AS VARCHAR) || '|' || gb),
          1, 15)) AS BIGINT)) AS hb
      FROM (SELECT doc_id, unnest(s_b) AS gb FROM sh), range(0, 32) r(j)
      GROUP BY doc_id, j),
    est AS (
      SELECT a.doc_id,
        CAST(SUM(CASE WHEN a.ha = b.hb THEN 1 ELSE 0 END) AS BIGINT)
          AS matches
      FROM sig a JOIN sigb b ON a.doc_id = b.doc_id AND a.j = b.j
      GROUP BY a.doc_id),
    ex AS (
      SELECT doc_id,
        CAST(len(list_filter(s_a, x -> list_contains(s_b, x)))
          AS BIGINT) AS n_inter,
        CAST(len(list_distinct(list_concat(s_a, s_b)))
          AS BIGINT) AS n_union
      FROM sh)
    SELECT e.doc_id AS id_a, e.doc_id + 1000000 AS id_b,
      CAST(matches * 1000000 // 32 AS BIGINT) AS est_ppm,
      CAST(n_inter * 1000000 // n_union AS BIGINT) AS exact_ppm,
      CAST(abs(matches * 1000000 // 32 - n_inter * 1000000 // n_union)
        AS BIGINT) AS err_ppm
    FROM est e JOIN ex USING (doc_id) ORDER BY id_a"""))


  /** Per-source dedup ROI ([[Dedup.dedupRoi]]): token savings each
    * source realizes under global exact dedup, with planted
    * cross-source copies (every doc_id % 13 re-hosted verbatim under
    * source 'mirror' at +5e6) so the mirror source's mass is pure
    * savings and original sources keep canonicals. The dedup-campaign
    * ordering signal; exact integer ppm. */
  val td_dedup_roi = GraftQuery(
    "td_dedup_roi",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"))
      val corpus = Planted.corpus(docs,
        (pmod(col("doc_id"), lit(13)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 5000000L),
          "source" -> lit("mirror")))
      Dedup.dedupRoi(corpus, "doc_id", "text", "source")
        .orderBy(col("source"))
    },
    Some("""WITH corpus AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT doc_id + 5000000, 'mirror', text FROM documents
        WHERE doc_id % 13 = 0),
      base AS (
        SELECT doc_id, source,
          CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
          md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        FROM corpus),
      winners AS (SELECT fp, MIN(doc_id) AS keep_id FROM base GROUP BY fp)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS BIGINT)
          AS n_dup_docs,
        CAST(SUM(n_words) AS BIGINT) AS total_tokens,
        CAST(SUM(CASE WHEN doc_id <> keep_id THEN n_words ELSE 0 END)
          AS BIGINT) AS dup_tokens,
        CAST(SUM(CASE WHEN doc_id <> keep_id THEN n_words ELSE 0 END)
          * 1000000 // greatest(SUM(n_words), 1) AS BIGINT) AS savings_ppm
      FROM base JOIN winners USING (fp)
      GROUP BY source ORDER BY source"""))


  /** End-to-end curation FUNNEL ([[graft.ops.Pipeline.curationFunnel]]):
    * quality floor → exact dedup → benchmark decontamination composed
    * into ONE plan, reported per source. Planted exact copies
    * (doc_id % 11 → +4e6 twins) exercise the dedup stage; the % 97
    * benchmark split exercises decontamination; short docs fall to
    * the quality floor. Every ratio is exact integer ppm. */
  val td_curation_funnel = GraftQuery(
    "td_curation_funnel",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val m97 = pmod(col("doc_id"), lit(97))
      val train = Planted.variants(docs, Seq(
        (m97 =!= 0) -> Seq.empty,
        (m97 =!= 0 && pmod(col("doc_id"), lit(11)) === 0) ->
          Seq("doc_id" -> (col("doc_id") + 4000000L))))
      val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      Pipeline.curationFunnel(train, bench, "doc_id", "text", "source",
          minWords = 5, shingleN = 3)
        .orderBy(col("source"))
    },
    Some("""WITH train AS (
        SELECT doc_id, source, text FROM documents WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 4000000, source, text FROM documents
        WHERE doc_id % 97 <> 0 AND doc_id % 11 = 0),
      base AS (
        SELECT doc_id, source,
          CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
          md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
          text
        FROM train),
      quality AS (SELECT * FROM base WHERE n_words >= 5),
      canon AS (SELECT fp, MIN(doc_id) AS keep_id FROM quality GROUP BY fp),
      surv AS (
        SELECT q.* FROM quality q
        JOIN canon c ON q.fp = c.fp AND q.doc_id = c.keep_id),
      stok AS (
        SELECT doc_id, source, n_words,
          string_split_regex(trim(text), '\s+') AS t FROM surv),
      ssh AS (
        SELECT doc_id, source, n_words,
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t)-1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS sh
        FROM stok),
      btok AS (
        SELECT string_split_regex(trim(text), '\s+') AS t
        FROM documents WHERE doc_id % 97 = 0),
      bsh AS (
        SELECT DISTINCT unnest(
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t)-1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END) AS g
        FROM btok),
      contam AS (
        SELECT DISTINCT doc_id
        FROM (SELECT doc_id, unnest(sh) AS g FROM ssh) j
        JOIN bsh USING (g)),
      kept AS (
        SELECT * FROM ssh WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
      f_in AS (SELECT source, COUNT(*) AS n_input FROM base GROUP BY source),
      f_q AS (SELECT source, COUNT(*) AS n_quality FROM quality GROUP BY source),
      f_c AS (SELECT source, COUNT(*) AS n_canonical FROM surv GROUP BY source),
      f_k AS (
        SELECT source, COUNT(*) AS n_kept,
          CAST(SUM(n_words) AS BIGINT) AS kept_tokens
        FROM kept GROUP BY source)
      SELECT f_in.source, n_input,
        COALESCE(n_quality, 0) AS n_quality,
        COALESCE(n_canonical, 0) AS n_canonical,
        COALESCE(n_kept, 0) AS n_kept,
        COALESCE(kept_tokens, 0) AS kept_tokens,
        CAST(COALESCE(n_kept, 0) * 1000000 // n_input AS BIGINT) AS kept_ppm
      FROM f_in
      LEFT JOIN f_q USING (source)
      LEFT JOIN f_c USING (source)
      LEFT JOIN f_k USING (source)
      ORDER BY f_in.source"""))


  /** CANONICALIZED benchmark decontamination — the obfuscation-robust
    * form of td_decontam: shingles are taken over
    * [[graft.ops.TextAnalysis.canonicalize]]d text (lowercase,
    * punctuation stripped, whitespace collapsed), so a benchmark
    * passage that leaked UPPERCASED or with injected punctuation
    * still matches. Planted twins (+6e6) carry exactly that
    * obfuscation: uppercased with commas between every word — raw
    * 3-gram decontam sees zero shared shingles, the canonical form
    * sees all of them. Same broadcast-benchmark plan shape as
    * td_decontam; one extra narrow regex pass. */
  val td_decontam_canonical = GraftQuery(
    "td_decontam_canonical",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      val m97 = pmod(col("doc_id"), lit(97))
      val corpus = Planted.variants(
        docs.select(col("doc_id"), col("text")), Seq(
          (m97 =!= 0) -> Seq.empty,
          (m97 === 0 && length(trim(col("text"))) > 0) -> Seq(
            "doc_id" -> (col("doc_id") + 6000000L),
            "text" -> regexp_replace(upper(col("text")), " ", " , "))))
      graft.ops.Dedup.contaminatedDocs(
          corpus.withColumn("ctext",
            graft.ops.TextAnalysis.canonicalize(col("text"))),
          bench.withColumn("ctext",
            graft.ops.TextAnalysis.canonicalize(col("text"))),
          "doc_id", "ctext")
        .orderBy(col("doc_id"))
    },
    Some("""WITH bench AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
      corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
        UNION ALL
        SELECT doc_id + 6000000,
          regexp_replace(upper(text), ' ', ' , ', 'g')
        FROM bench WHERE length(trim(text)) > 0),
      ctok AS (
        SELECT doc_id, string_split_regex(trim(regexp_replace(
          regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
          '\s+', ' ', 'g')), '\s+') AS t
        FROM corpus),
      btok AS (
        SELECT string_split_regex(trim(regexp_replace(
          regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
          '\s+', ' ', 'g')), '\s+') AS t
        FROM bench),
      csh AS (
        SELECT doc_id, unnest(
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t)-1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END)
          AS shingle
        FROM ctok),
      bsh AS (
        SELECT DISTINCT unnest(
          CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
               ELSE list_distinct(list_transform(range(1, len(t)-1),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END)
          AS shingle
        FROM btok)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM csh JOIN bsh USING (shingle)
      GROUP BY doc_id ORDER BY doc_id"""))


  /** LSH operating-point measurement — candidate PRECISION and RECALL
    * of md5-minhash banding (16 hashes, 4 bands × 4 rows) against the
    * exact Jaccard-0.8 pair set on a corpus with planted near-copies:
    * precision says how much verify work the buckets waste, recall
    * says what the sketch misses — the two numbers that pick a band
    * configuration. Signatures and buckets are md5-derived
    * ([[graft.ops.Dedup.minhashSignatureMd5]]), so DuckDB replays the
    * whole pipeline bit-for-bit; the exact pair set reuses the
    * lossless prefix-filter miner. */
  val td_lsh_precision = GraftQuery(
    "td_lsh_precision",
    (s, dir) => {
      val d0 = Tables.documents(s, dir).filter(col("doc_id") < 150)
      // near-copies (high jaccard, should verify) + borderline copies
      // (a 12-word tail pushes jaccard under 0.8 for most docs: bucket
      // collisions that FAIL verify → measurable precision < 1)
      val corpus = Planted.corpus(d0,
        (pmod(col("doc_id"), lit(5)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 1000000L),
          "text" -> concat(col("text"), lit(" xtra wrds"))),
        (pmod(col("doc_id"), lit(7)) === 0) -> Seq(
          "doc_id" -> (col("doc_id") + 2000000L),
          "text" -> concat(col("text"),
            lit(" b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12"))))
      val d = corpus
        .select(col("doc_id").as("id"),
          graft.ops.Dedup.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .localCheckpoint(eager = false)
      val sig = d.withColumn("sig",
        graft.ops.Dedup.minhashSignatureMd5(col("sh"), 16))
      val banded = sig.select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(3)),
          b => md5(concat_ws(",",
            transform(slice(col("sig"), b * 4 + 1, lit(4)),
              x => x.cast("string")))))).as(Seq("band", "bucket")))
      val a = banded.select(col("band"), col("bucket"),
        col("id").as("id_a"), col("sh").as("sh_a"))
      val bb = banded.select(col("band"), col("bucket"),
        col("id").as("id_b"), col("sh").as("sh_b"))
      val cand = a.join(bb, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
        .distinct()
        .localCheckpoint(eager = false)
      val nCand = cand.agg(count(lit(1)).as("n_candidates"))
      val nVer = cand
        .withColumn("ni", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jac", col("ni").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("ni")))
        .filter(col("jac") >= 0.8)
        .agg(count(lit(1)).as("n_verified"))
      val nExact = graft.ops.Dedup.ngramJaccardSimilar(
          corpus, "doc_id", "text", 3, 0.8)
        .agg(count(lit(1)).as("n_exact"))
      nCand.crossJoin(broadcast(nVer)).crossJoin(broadcast(nExact))
        .select(lit(4).as("bands"), lit(4).as("rows_per_band"),
          col("n_candidates"), col("n_verified"), col("n_exact"),
          expr("n_verified * 1000000 div greatest(n_candidates, 1)")
            .as("precision_ppm"),
          expr("n_verified * 1000000 div greatest(n_exact, 1)")
            .as("recall_ppm"))
    },
    Some("""WITH base AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 150),
    corpus AS (
      SELECT doc_id, text FROM base
      UNION ALL
      SELECT doc_id + 1000000, text || ' xtra wrds' FROM base
      WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 2000000,
        text || ' b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12' FROM base
      WHERE doc_id % 7 = 0),
    tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM corpus),
    sh AS (
      SELECT doc_id,
        CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
             ELSE list_distinct(list_transform(range(1, len(t)-1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
      FROM tok),
    sig AS (
      SELECT doc_id, j,
        MIN(CAST(('0x' || substring(md5(CAST(j AS VARCHAR) || '|' || g),
          1, 15)) AS BIGINT)) AS h
      FROM (SELECT doc_id, unnest(s) AS g FROM sh), range(0, 16) r(j)
      GROUP BY doc_id, j),
    sigl AS (
      SELECT doc_id, list(h ORDER BY j) AS sig FROM sig GROUP BY doc_id),
    banded AS (
      SELECT doc_id, b,
        md5(array_to_string(sig[(CAST(b AS INT)*4+1):(CAST(b AS INT)*4+4)],
          ',')) AS bucket
      FROM sigl, range(0, 4) r(b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM banded a JOIN banded c
        ON a.b = c.b AND a.bucket = c.bucket AND a.doc_id < c.doc_id),
    ver AS (
      SELECT COUNT(*) AS n_verified FROM (
        SELECT id_a FROM cand
        JOIN sh sa ON sa.doc_id = cand.id_a
        JOIN sh sb ON sb.doc_id = cand.id_b
        WHERE CAST(len(list_filter(sa.s, x -> list_contains(sb.s, x)))
            AS DOUBLE)
          / len(list_distinct(list_concat(sa.s, sb.s))) >= 0.8)),
    nc AS (SELECT COUNT(*) AS n_candidates FROM cand),
    ex AS (
      SELECT COUNT(*) AS n_exact FROM (
        SELECT a.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_filter(a.s, x -> list_contains(b.s, x)))
            AS DOUBLE)
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.8))
    SELECT 4 AS bands, 4 AS rows_per_band,
      n_candidates, n_verified, n_exact,
      CAST(n_verified * 1000000 // greatest(n_candidates, 1) AS BIGINT)
        AS precision_ppm,
      CAST(n_verified * 1000000 // greatest(n_exact, 1) AS BIGINT)
        AS recall_ppm
    FROM nc, ver, ex"""))
}
