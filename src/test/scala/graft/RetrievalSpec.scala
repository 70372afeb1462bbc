package graft

import graft.ops.Retrieval
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry date"),
    (4L, "date date"),
    (5L, "   ")).toDF("doc_id", "text")

  test("invertedIndex: tf and dl per posting; empty docs dropped") {
    val idx = Retrieval.invertedIndex(corpus, "doc_id", "text")
      .as[(String, Long, Int, Long)].collect().toSet
    assert(idx.contains(("apple", 1L, 3, 2L)))   // tf 2, dl 3
    assert(idx.contains(("cherry", 3L, 4, 3L)))
    assert(!idx.exists(_._2 == 5L), "whitespace-only doc indexed")
    assert(idx.size == 7)
  }

  test("bm25: only candidate docs scored; tf raises, df lowers") {
    val q = Seq((1L, "apple cherry")).toDF("query_id", "qtext")
    val r = Retrieval.bm25TopK(corpus, "doc_id", "text", q,
      "query_id", "qtext", k = 10)
      .select("id", "score_ppm").as[(Long, Long)].collect().toMap
    assert(r.keySet == Set(1L, 2L, 3L), "docs sharing no term scored")
    // apple is rarer (df 1 vs 2) and doc 1 is short — top score;
    // doc 3 has cherry tf 3 vs doc 2's tf 1
    assert(r(1L) > r(3L) && r(3L) > r(2L))
    // per-term contribution is a positive integer ppm
    assert(r.values.forall(s => s > 0 && s < 10000000L))
  }

  test("bm25: multi-term scores add; excludeSelf drops the query doc") {
    val qBoth = Seq((1L, "apple cherry")).toDF("query_id", "qtext")
    val qA = Seq((1L, "apple")).toDF("query_id", "qtext")
    val qC = Seq((1L, "cherry")).toDF("query_id", "qtext")
    def score(q: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(corpus, "doc_id", "text", q,
        "query_id", "qtext", k = 10)
        .select("id", "score_ppm").as[(Long, Long)].collect().toMap
    val both = score(qBoth)
    val parts = (score(qA).toSeq ++ score(qC).toSeq)
      .groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2).sum }
    assert(both == parts, "BM25 must be additive over query terms")

    val self = Seq((2L, "banana cherry")).toDF("query_id", "qtext")
    val r = Retrieval.bm25TopK(corpus, "doc_id", "text", self,
      "query_id", "qtext", k = 10, excludeSelf = true)
      .select("id").as[Long].collect().toSet
    assert(!r.contains(2L) && r.nonEmpty)
  }

  test("reciprocalRankFusion: exact integer scores, shared doc wins") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "id", "rank")
    val r = Retrieval.reciprocalRankFusion(Seq(a, b), k = 10)
      .select("rank", "id", "rrf_score")
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    // 1000000/61 = 16393, 1000000/62 = 16129 (integer division)
    assert(r == Seq((1, 11L, 16393L + 16129L), (2, 10L, 16393L),
      (3, 12L, 16129L)))
  }

  test("reciprocalRank: first relevant hit per query, exact ppm, " +
      "misses report (NULL, 0), beyond-k hits don't count") {
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),   // q1: relevant at 2 and 3
      (2L, 20L, 1), (2L, 21L, 2),                 // q2: nothing relevant
      (3L, 30L, 1), (3L, 31L, 2), (3L, 32L, 3),   // q3: relevant only at 3,
      (4L, 40L, 7))                               //     but k=2 cuts it off
      .toDF("query_id", "id", "rank")
    val rel = Seq((1L, 11L), (1L, 12L), (2L, 99L), (3L, 32L), (4L, 40L))
      .toDF("query_id", "id")
    val out = Retrieval.reciprocalRank(ranked, rel, "query_id", "id",
        "rank", k = 2)
      .as[(Long, Option[Int], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(2), 500000L)))   // first relevant at rank 2
    assert(out(2L) == ((None, 0L)))           // relevant doc never retrieved
    assert(out(3L) == ((None, 0L)))           // rank 3 is outside k=2
    assert(out(4L) == ((None, 0L)))           // rank 7 outside k even alone
    assert(out.size == 4, "every query in the relevance set reports")
  }
}
