package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** BPE trainer/encoder vs an independent in-memory reference: the
  * engine's replace-chain merge must reproduce classic greedy
  * left-to-right non-overlapping BPE exactly — including the "aaa"
  * overlap case, count-weighted pair selection, and lexicographic
  * tie-breaks. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference implementation (vectors of symbols, no Spark) ----
  private def refMergeWord(w: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      if (i + 1 < w.length && w(i) == l && w(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += w(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(words: Map[String, Long], n: Int,
                       minCount: Long = 2L): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] =
      words.groupMapReduce(kv => kv._1.map(_.toString).toVector)(_._2)(_ + _)
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var stop = false
    while (k < n && !stop) {
      val pairCounts = vocab.toSeq.flatMap { case (w, c) =>
        w.zip(w.drop(1)).map(p => p -> c)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (pairCounts.isEmpty) stop = true
      else {
        val ((l, r), c) = pairCounts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        if (c < minCount) stop = true
        else {
          merges += ((l, r)); k += 1
          vocab = vocab.toSeq
            .map { case (w, c) => refMergeWord(w, l, r) -> c }
            .groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
    }
    merges.result()
  }

  private def refEncode(text: String, merges: Seq[(String, String)]): Vector[String] =
    text.trim.split("\\s+").filter(_.nonEmpty).toVector.flatMap { w =>
      merges.foldLeft(w.map(_.toString).toVector) {
        case (syms, (l, r)) => refMergeWord(syms, l, r)
      }
    }

  test("trainMerges ≡ reference BPE on a known corpus, tie-breaks included") {
    val docs = Seq(
      "the then there other the the",
      "thin thing the there banana banana",
      "aaa aaa aaa bb bb").toDF("text")
    val words = docs.as[String].collect()
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Bpe.trainMerges(docs, "text", numMerges = 12)
    val want = refTrain(words, 12)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got.nonEmpty)
  }

  test("encode ≡ reference greedy merge, 'aaa' overlap pinned") {
    val merges = Seq(("t", "h"), ("th", "e"), ("a", "a"), ("i", "n"))
    val texts = Seq("the then", "aaa aaaa", "in thin", "", "  ")
    val out = texts.toDF("text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .as[Seq[String]].collect()
    texts.zip(out).foreach { case (t, got) =>
      assert(got == refEncode(t, merges), s"text '$t': $got")
    }
    // the canonical overlap case, explicitly
    assert(out(1).take(2) == Seq("aa", "a")) // "aaa" → [aa, a]
  }

  test("tokenCount = encode length; trained merges shrink token counts") {
    val docs = Seq("the then there", "banana banana band").toDF("text")
    val merges = Bpe.trainMerges(docs, "text", numMerges = 8)
    val rows = docs.select(
      Bpe.tokenCount(col("text"), merges).as("n"),
      size(Bpe.encode(col("text"), merges)).as("m"),
      length(regexp_replace(col("text"), "\\s+", "")).as("chars"))
      .as[(Int, Int, Int)].collect()
    rows.foreach { case (n, m, chars) =>
      assert(n == m)
      assert(n < chars, "trained merges should compress below char count")
    }
  }

  test("native tokenCount ≡ fold form, incl degenerate whitespace and multi-byte") {
    import spark.implicits._
    val merges = Seq("t" -> "h", "th" -> "e", "a" -> "n", "an" -> "a")
    val texts = Seq(
      "", "   ", "the theatre is near the lane",
      "banana anna than", "a", "aa ana anana",
      "\tthe\nthing",            // boundary non-space whitespace →
      " \t weird   runs \n ",    // empty tokens hit the sequence(1,0) quirk
      "héllo thé 日本 😀then")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = texts.toDF("id", "text").select(
      Bpe.tokenCount(col("text"), merges).as("native"),
      Bpe.tokenCountFold(col("text"), merges).as("fold"))
      .as[(Int, Int)].collect()
    got.zip(texts).foreach { case ((n, f), (_, t)) =>
      assert(n == f, s"text='$t': native=$n fold=$f")
    }
  }
}
