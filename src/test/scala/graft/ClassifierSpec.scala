package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val seed = Seq(
    // positive class: fruit vocabulary; negative: metal vocabulary
    (1L, "apple banana apple cherry", true),
    (2L, "banana cherry plum apple", true),
    (3L, "apple plum banana banana", true),
    (4L, "iron copper zinc lead", false),
    (5L, "copper lead iron tin", false),
    (6L, "zinc tin copper iron", false)
  ).toDF("doc_id", "text", "is_fruit")

  test("separable seed trains weights that rank classes correctly") {
    val w = TextAnalysis.trainHashedClassifier(seed, "text", "is_fruit",
      buckets = 1024)
    assert(w.count() <= 1024)
    val scored = TextAnalysis.scoreHashedClassifier(
      Seq((10L, "apple cherry banana"), (11L, "iron zinc lead"))
        .toDF("doc_id", "text"),
      "doc_id", "text", w, buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored(10L) > 0, s"fruit doc should score positive: $scored")
    assert(scored(11L) < 0, s"metal doc should score negative: $scored")
  }

  test("unseen tokens are neutral; empty docs score zero, not drop") {
    val w = TextAnalysis.trainHashedClassifier(seed, "text", "is_fruit",
      buckets = 1024)
    val scored = TextAnalysis.scoreHashedClassifier(
      Seq((20L, "quartz feldspar obsidian"), (21L, ""), (22L, "   "))
        .toDF("doc_id", "text"),
      "doc_id", "text", w, buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored === Map(20L -> 0L, 21L -> 0L, 22L -> 0L))
  }

  test("null labels join neither class") {
    val withNull = seed.union(
      Seq((7L, "apple apple apple apple")).toDF("doc_id", "text")
        .withColumn("is_fruit", lit(null).cast("boolean")))
    val w0 = TextAnalysis.trainHashedClassifier(seed, "text", "is_fruit", 1024)
    val w1 = TextAnalysis.trainHashedClassifier(withNull, "text", "is_fruit", 1024)
    val d0 = w0.orderBy("bucket").collect().toSeq
    val d1 = w1.orderBy("bucket").collect().toSeq
    assert(d0 === d1, "a null-labeled doc must not shift any weight")
  }

  test("scores are invariant under repartitioning (pure hash features)") {
    val docs = Seq(
      (30L, "apple iron banana copper"), (31L, "plum plum tin")
    ).toDF("doc_id", "text")
    val w = TextAnalysis.trainHashedClassifier(seed, "text", "is_fruit", 1024)
    val a = TextAnalysis.scoreHashedClassifier(docs, "doc_id", "text", w, 1024)
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.scoreHashedClassifier(docs.repartition(7),
      "doc_id", "text", w.repartition(3), 1024)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("token multiplicity counts: repeating a token scales its vote") {
    val w = TextAnalysis.trainHashedClassifier(seed, "text", "is_fruit", 1024)
    val scored = TextAnalysis.scoreHashedClassifier(
      Seq((40L, "apple"), (41L, "apple apple apple")).toDF("doc_id", "text"),
      "doc_id", "text", w, 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored(41L) === 3 * scored(40L))
  }
}
