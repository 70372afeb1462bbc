package graft

import graft.ops.{Dedup, Pipeline}
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("chunkForEmbedding: overlapping windows, short tail, single-chunk doc") {
    import graft.ops.Pipeline
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"))                                  // under one window
      .toDF("doc_id", "text")
    val r = Pipeline.chunkForEmbedding(d, "doc_id", "text",
      windowTokens = 4, strideTokens = 3)
      .select("id", "chunk_idx", "chunk", "n_tokens")
      .as[(Long, Int, String, Int)].collect().toSeq.sorted
    // doc 1: ceil((10-4)/3)+1 = 3 chunks at offsets 0,3,6
    assert(r == Seq(
      (1L, 0, "t1 t2 t3 t4", 4),
      (1L, 1, "t4 t5 t6 t7", 4),
      (1L, 2, "t7 t8 t9 t10", 4),
      (2L, 0, "a b c", 3)), r.toString)
  }

  test("packSequences: offset binning with straddling docs") {
    // 80+80+80 tokens on window 200: starts 0,80,160 → all bin 0
    // (third doc straddles); the next doc starts at 240 → bin 1
    val d = docs(
      (1L, "s", Seq.fill(80)("w").mkString(" ")),
      (2L, "s", Seq.fill(80)("w").mkString(" ")),
      (3L, "s", Seq.fill(80)("w").mkString(" ")),
      (4L, "s", Seq.fill(50)("w").mkString(" ")))
    val out = Pipeline.packSequences(d, "source", "doc_id", "text", 200)
      .orderBy("bin").select("bin", "n_docs", "n_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 3L, 240L), (1L, 1L, 50L)))
  }

  test("tokenBudget: keeps prefix while running total fits") {
    val d = docs(
      (1L, "s", "a b c"), (2L, "s", "a b"), (3L, "s", "a b c d"))
    val out = Pipeline.tokenBudget(d, "source", "doc_id", "text", budget = 5L)
      .orderBy("doc_id").select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L))
  }

  test("interleave: weight-2 stratum appears twice as often") {
    val d = docs(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "x"), (4L, "a", "x"),
      (10L, "b", "x"), (11L, "b", "x"))
    val out = Pipeline.interleave(d, "source", "doc_id",
      Map("a" -> 2, "b" -> 1), limit = 6)
      .orderBy("pos").select("source").as[String].collect().toSeq
    // ikeys: a → 0.25, 0.75, 1.25, 1.75 ; b → 0.5, 1.5
    assert(out == Seq("a", "b", "a", "a", "b", "a"))
  }

  test("assignSplit: percentages roughly honored, membership stable") {
    val d = (1L to 2000L).toDF("doc_id")
    val counts = d.select(Pipeline.assignSplit(col("doc_id"), 90, 5).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts("train") > 1700 && counts("val") > 50 && counts("test") > 50)
    assert(counts.values.sum == 2000L)
  }

  test("contaminatedDocs: counts distinct shared 3-grams, benchmark excluded") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "totally unrelated words here now"),
      (3L, "quick brown fox jumps high")
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val out = Dedup.contaminatedDocs(corpus, benchmark, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (3L, 1L)))
  }

  test("leakageSafeSplit: no pair straddles; singletons match assignSplit") {
    // 200 originals + 200 near-dup partners, pair i ↔ i+1000
    val ids = (1L to 200L) ++ (1001L to 1200L)
    val d = ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = (1L to 200L).map(i => (i, i + 1000L)).toDF("id_a", "id_b")

    val plain = d.select($"doc_id",
      Pipeline.assignSplit($"doc_id", 80, 10).as("split"))
      .as[(Long, String)].collect().toMap
    // the property is non-vacuous only if plain hashing WOULD straddle
    val straddlers = (1L to 200L).count(i => plain(i) != plain(i + 1000L))
    assert(straddlers > 0, "test corpus never straddles under plain split")

    val safe = Pipeline.leakageSafeSplit(d, "doc_id", pairs, 80, 10)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    (1L to 200L).foreach { i =>
      assert(safe(i) == safe(i + 1000L), s"pair ($i, ${i + 1000L}) straddles")
      // cluster label is min(id) = i, so both sides carry plain(i)
      assert(safe(i) == plain(i), s"cluster $i not split by its min id")
    }
  }

  test("leakageSafeSplit: transitive cluster shares one split; empty pairs = assignSplit") {
    val d = (1L to 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Pipeline.leakageSafeSplit(d, "doc_id", chain, 80, 10)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val plain = d.select($"doc_id",
      Pipeline.assignSplit($"doc_id", 80, 10).as("split"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == plain(1L) && out(2L) == plain(1L) && out(3L) == plain(1L))
    (4L to 50L).foreach(i => assert(out(i) == plain(i)))

    val none = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    val same = Pipeline.leakageSafeSplit(d, "doc_id", none, 80, 10)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    (1L to 50L).foreach(i => assert(same(i) == plain(i)))
  }

  test("lengthBuckets: power-of-two buckets, floor, exact waste ppm") {
    // token counts: 0 ("" after trim), 1, 16, 17, 100 → buckets
    // 16, 16, 16, 32, 128 (boundary n=16 stays in 16; n=17 jumps)
    val d = Seq(
      (1L, "s", ""),
      (2L, "s", "w"),
      (3L, "s", (1 to 16).map(_ => "t").mkString(" ")),
      (4L, "s", (1 to 17).map(_ => "t").mkString(" ")),
      (5L, "s", (1 to 100).map(_ => "t").mkString(" "))).toDF(
      "doc_id", "source", "text")
    val out = Pipeline.lengthBuckets(d, "text", minBucket = 16)
      .orderBy("bucket")
      .select("bucket", "n_docs", "n_tokens", "n_padded", "waste_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (16L, 3L, 17L, 48L, (31L * 1000000L) / 48L),
      (32L, 1L, 17L, 32L, (15L * 1000000L) / 32L),
      (128L, 1L, 100L, 128L, (28L * 1000000L) / 128L)))
  }

  test("curationFunnel: each stage drops exactly the right docs") {
    // src A: doc 1 ok; doc 2 short (quality drop); doc 3 = copy of 1
    //        (dedup drop); doc 4 contaminated (shares a 3-gram with
    //        the benchmark)
    // src B: doc 5 ok, nothing drops
    val train = Seq(
      (1L, "A", "one two three four five six"),
      (2L, "A", "too short"),
      (3L, "A", "one two three four five six"),
      (4L, "A", "leak gram here padding pads more"),
      (5L, "B", "clean words flow along nicely here")).toDF(
      "doc_id", "source", "text")
    val bench = Seq((100L, "E", "leak gram here")).toDF(
      "doc_id", "source", "text")
    val out = Pipeline.curationFunnel(train, bench,
        "doc_id", "text", "source", minWords = 5, shingleN = 3)
      .orderBy("source")
      .select("source", "n_input", "n_quality", "n_canonical", "n_kept",
        "kept_tokens", "kept_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("A", 4L, 3L, 2L, 1L, 6L, 250000L),
      ("B", 1L, 1L, 1L, 1L, 6L, 1000000L)))
  }
}
