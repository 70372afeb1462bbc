package graft

import graft.ops.{Dedup, Packing}
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("assignSequences: offset binning with straddling docs") {
    // tokens 80,80,80 on budget 200: starts 0,80,160 → bins 0,0,0
    // (third doc straddles — offset binning keeps it in bin 0);
    // next doc starts at 240 → bin 1
    val df = Seq((1L, 80), (2L, 80), (3L, 80), (4L, 50))
      .toDF("id", "tok").withColumn("g", lit("s"))
    val out = Packing.assignSequences(df, "g", "id", col("tok"), 200L)
      .orderBy("id").select("seq_id").as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 0L, 1L))
  }

  test("packedStats: per-sequence doc and token totals") {
    val df = Seq((1L, 150), (2L, 150), (3L, 10))
      .toDF("id", "tok").withColumn("g", lit("s"))
    val out = Packing.packedStats(df, "g", "id", col("tok"), 200L)
      .orderBy("seq_id")
      .select("seq_id", "n_docs", "n_tokens")
      .as[(Long, Long, Long)].collect().toSeq
    // starts: 0, 150, 300 → bins 0, 0, 1
    assert(out == Seq((0L, 2L, 300L), (1L, 1L, 10L)))
  }

  test("contaminatedDocs: counts distinct shared 3-grams, benchmark excluded") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),       // shares "the quick brown", "quick brown fox"
      (2L, "totally unrelated words here now"),
      (3L, "quick brown fox jumps high")       // shares "quick brown fox"
    ).toDF("doc_id", "text")
    val benchmark = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val out = Dedup.contaminatedDocs(corpus, benchmark, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (3L, 1L)))
  }
}
