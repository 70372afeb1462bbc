package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse text retrieval — inverted index, BM25 top-k, and
  * reciprocal-rank fusion for hybrid (sparse + dense) search. The
  * training-data uses: "more-like-this" retrieval for targeted
  * dedup/decontamination sweeps, and quality-weighted selection of
  * documents matching a seed set.
  *
  * Scale shape: the inverted index is one explode + one keyed agg;
  * scoring equi-joins the (small, broadcast) query-term list against
  * the posting table, so only documents sharing at least one query
  * term are ever touched — candidate set ≪ corpus, never a scan per
  * query. Corpus-level constants (N docs, total tokens) are a 1-row
  * aggregate cross-joined (broadcast) into the scoring expression.
  * Per-query top-k is a window over scored candidates only.
  *
  * Determinism: scores are integer ppm. BM25's k1=1.2, b=0.75 are
  * rationals, so with idf in its log-free "probabilistic" form
  * ((N - df + ½)/(df + ½), Robertson-Sparck-Jones without the log)
  * the whole per-term contribution is a ratio of exact integers; it
  * is evaluated in IEEE doubles (every operand integer-exact below
  * 2^53, every op correctly rounded, same expression order both
  * engines) and floored to ppm. Summing the per-term BIGINT ppm is
  * then order-free — cross-engine hash-identical, the td_tfidf
  * discipline.
  */
object Retrieval {

  /** Posting table: one row per (term, id) with term frequency `tf`
    * and the document's token length `dl`. Whitespace tokenization —
    * the same `\s+` split as [[TextAnalysis]] / the DuckDB oracles.
    * Empty documents are dropped (they can never match a query). */
  def invertedIndex(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("id"),
        split(trim(col(textCol)), "\\s+").as("toks"))
      .select(col("id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("term", "id", "dl").agg(count(lit(1)).as("tf"))

  /** BM25 per-term contribution in integer ppm, k1 = 1.2, b = 0.75.
    * With T = total corpus tokens and N = doc count (so avgdl = T/N):
    *
    *   tfNorm = tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/T))
    *          = 44·T·tf / (20·T·tf + 6·T + 18·dl·N)   (×20T/20T)
    *   idf    = (N − df + ½)/(df + ½) = (2N − 2df + 1)/(2df + 1)
    *
    * Mirrored verbatim (operand order included) in the SQL oracle. */
  private def contributionPpm: Column = {
    val idf = (lit(2.0) * col("n_docs") - lit(2.0) * col("df") + lit(1.0)) /
      (lit(2.0) * col("df") + lit(1.0))
    val tfNorm = (lit(44.0) * col("t_tokens") * col("tf")) /
      (lit(20.0) * col("t_tokens") * col("tf") +
        lit(6.0) * col("t_tokens") + lit(18.0) * col("dl") * col("n_docs"))
    floor(lit(1000000.0) * idf * tfNorm).cast("long")
  }

  /** BM25 top-k: score every corpus document sharing a term with the
    * query, rank per query by (score desc, id asc), keep `k`.
    * Query term frequency is ignored (binary query model — the
    * standard simplification); a query matching nothing returns no
    * rows for that query id.
    *
    * @return (query_id, rank, id, score_ppm) */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qidCol: String, qtextCol: String,
               k: Int, excludeSelf: Boolean = false,
               index: Option[DataFrame] = None): DataFrame = {
    // the index feeds both df-counting and scoring — materialize once
    // (a production pipeline builds it once with [[invertedIndex]],
    // writes it bucketed by term, and passes it via `index`)
    val idx = index.getOrElse(
      invertedIndex(docs, idCol, textCol).localCheckpoint())
    val consts = idx.groupBy("id").agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tokens"))
    val df_ = idx.groupBy("term").agg(count(lit(1)).as("df"))
    val qTerms = broadcast(
      queries.filter(length(trim(col(qtextCol))) > 0)
        .select(col(qidCol).as("query_id"),
          explode(split(trim(col(qtextCol)), "\\s+")).as("term"))
        .distinct())
    val cand = qTerms.join(idx, "term").join(df_, "term")
      .crossJoin(broadcast(consts))
    val scored0 = cand.withColumn("c_ppm", contributionPpm)
    val scored =
      (if (excludeSelf) scored0.filter(col("id") =!= col("query_id"))
       else scored0)
        .groupBy(col("query_id"), col("id"))
        .agg(sum(col("c_ppm")).as("score_ppm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("score_ppm"))
  }

  /** Reciprocal-rank fusion: each input is a per-query ranking
    * (query_id, id, rank); a document's fused score is
    * Σ 1000000 ÷ (rrfK + rank) over the lists it appears in (integer
    * division — exact cross-engine), missing-from-a-list contributes
    * nothing. The standard hybrid-search merge (Cormack et al. 2009):
    * rank-based, so the sparse and dense scores never need to be on
    * comparable scales. One union + one keyed agg + one window.
    *
    * @return (query_id, rank, id, rrf_score) — top `k` per query */
  def reciprocalRankFusion(rankings: Seq[DataFrame], k: Int,
                           rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contrib = rankings
      .map(_.select(col("query_id"), col("id"),
        (lit(1000000L) / (lit(rrfK.toLong) + col("rank").cast("long")))
          .cast("long").as("c")))
      .reduce(_ unionByName _)
    val fused = contrib.groupBy(col("query_id"), col("id"))
      .agg(sum(col("c")).as("rrf_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("rrf_score"))
  }

  /** Reciprocal rank @ k — the retrieval-quality eval that
    * complements [[graft.ops.Similarity]]-side recall@k: per query,
    * the rank of the FIRST relevant document inside the top `k`, and
    * its reciprocal as exact-integer ppm (`1 000 000 div rank` — no
    * float, so MRR sums hash-match any engine). Queries whose top-k
    * holds no relevant doc report (NULL, 0) — they count against the
    * mean, which is the standard MRR@k convention. The query universe
    * is `relevant`'s query set (an eval set defines one+ relevant doc
    * per query by construction); ranked rows for queries outside it
    * are ignored.
    *
    * Scale shape: `ranked` is already a per-query top-k (rows ∝
    * queries·k); one equi-join against the relevance pairs and one
    * query-keyed min — evaluation cost is independent of the corpus,
    * the [[graft.ops.Similarity]] recall-eval discipline.
    *
    * @param ranked  (queryCol, docCol, rankCol) — a per-query ranking,
    *                e.g. [[bm25TopK]] output
    * @param relevant (queryCol, docCol) relevance pairs
    * @return (queryCol, first_rank, rr_ppm) — one row per query in
    *         `relevant`; first_rank NULL and rr_ppm 0 on a miss
    */
  def reciprocalRank(ranked: DataFrame, relevant: DataFrame,
      queryCol: String, docCol: String, rankCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val hits = ranked
      .filter(col(rankCol) <= k)
      .select(col(queryCol), col(docCol), col(rankCol))
      .join(relevant.select(col(queryCol), col(docCol)).distinct(),
        Seq(queryCol, docCol), "left_semi")
      .groupBy(col(queryCol))
      .agg(min(col(rankCol)).as("first_rank"))
    relevant.select(col(queryCol)).distinct()
      .join(hits, Seq(queryCol), "left")
      .select(col(queryCol), col("first_rank"),
        when(col("first_rank").isNotNull,
          expr("1000000L div first_rank")).otherwise(lit(0L))
          .as("rr_ppm"))
  }
}
