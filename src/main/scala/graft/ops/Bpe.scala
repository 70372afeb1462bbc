package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and encoding in-engine —
  * the real version of the `\w+|[^\w\s]` token-count heuristic: learn
  * the `numMerges` highest-frequency symbol merges from the corpus,
  * then tokenize with them.
  *
  * Scale shape (why this survives 100 TB): classic BPE trains on the
  * WORD-FREQUENCY table, not the corpus — one corpus-wide shuffle
  * builds `(word, count)` (map-side combinable; |vocab| ≪ corpus),
  * and every merge round then runs on that bounded table: explode
  * adjacent symbol pairs, one small weighted count agg, collect the
  * single best pair (a 1-row collect per round, the [[KMeans]]
  * driver-loop precedent), apply the merge with a literal
  * (non-regex) `replace`. Rounds are `numMerges` tiny jobs; the
  * corpus is touched exactly once.
  *
  * Words are represented with every symbol WRAPPED in U+0001
  * separators (rendered `§` below — outside any text alphabet this
  * engine ingests; raw control chars in input should be scrubbed
  * upstream like every tokenizer assumes): `§b§§an§§an§§a§`. A pair
  * merge is then the literal (non-regex) `replace(s, §l§§r§, §lr§)`:
  * the pattern's outer separators can only align with complete
  * symbol boundaries (symbols never contain SEP, and `§§` occurs
  * nowhere but between symbols), so a match can never start or end
  * mid-symbol — and because each symbol carries its OWN delimiters,
  * adjacent merge sites share no characters: left-to-right
  * non-overlapping replace is exactly BPE's greedy within-word merge
  * order ("aaa" + (a,a) → ["aa","a"], "aaaa" → ["aa","aa"],
  * "banana" after (a,n) + (an,a) → ["b","an","ana"] — all pinned by
  * spec against a reference implementation).
  *
  * Determinism: ties on pair count break lexicographically on
  * (left, right); all ops are literal string/integer — the encoder
  * is cross-engine ORACLED (td_bpe_encode), the trainer is
  * spec-equivalent to an independent in-memory reference.
  */
object Bpe {

  val SEP = "\u0001"

  /** Word-frequency table of a corpus: ONE shuffle over the corpus,
    * everything after runs on this. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** A word as its SEP-wrapped character symbols:
    * `abc` → `§a§§b§§c§`. */
  def symbolize(w: Column): Column =
    concat(lit(SEP),
      array_join(
        transform(sequence(lit(1), length(w)),
          i => call_function("substr", w, i, lit(1))),
        SEP + SEP),
      lit(SEP))

  /** Apply trained merges in rank order (literal boundary-safe
    * replaces — the merge list is bounded, so the chain compiles
    * once and runs as narrow codegen over any corpus size). */
  def applyMerges(sym: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(sym) { case (acc, (l, r)) =>
      call_function("replace", acc,
        lit(SEP + l + SEP + SEP + r + SEP), lit(SEP + l + r + SEP))
    }

  /** SEP-wrapped word back to its symbol array. */
  private def symbols(s: Column): Column =
    split(call_function("substr", s, lit(2), length(s) - 2), SEP + SEP)

  /** Adjacent symbol pairs of a wrapped word, weighted later by the
    * word count. Empty for single-symbol words. */
  private def adjacentPairs(s: Column): Column = {
    val syms = symbols(s)
    when(size(syms) > 1,
      transform(sequence(lit(0), size(syms) - 2),
        i => struct(element_at(syms, i + 1).as("l"),
          element_at(syms, i + 1 + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
  }

  /** Train `numMerges` BPE merges on the corpus' word-count table.
    * Each round: weighted pair count (small agg on the vocab table) →
    * best pair by (count desc, left asc, right asc) → merge applied
    * to every vocab word. Stops early when the best pair's weighted
    * count falls under `minCount`.
    *
    * @return merges in rank order
    */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  minCount: Long = 2L): Seq[(String, String)] = {
    var vocab = wordCounts(docs, textCol)
      .select(symbolize(col("word")).as("s"), col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.Buffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < numMerges) {
      val best = vocab
        .select(explode(adjacentPairs(col("s"))).as("p"), col("cnt"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minCount) continue = false
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += ((l, r))
        val prev = vocab
        vocab = vocab.select(
          applyMerges(col("s"), Seq((l, r))).as("s"),
          col("cnt")).localCheckpoint()
        prev.unpersist()
      }
    }
    merges.toSeq
  }

  /** Tokenize with a trained merge list: per-word symbolize → merge
    * chain → split. Narrow map over the corpus — no shuffle, no per-
    * row driver work. @return array<string> of BPE tokens */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(TextAnalysis.tokens(text),
      w => symbols(applyMerges(symbolize(w), merges))))

  /** Token count under the trained tokenizer (the number that sizes
    * a training mix): sum of per-word BPE token counts. Native
    * one-pass expression ([[graft.plans.BpeTokenCountExpression]]) —
    * the fold form below pays an interpreted lambda per word plus one
    * per character; BpeSpec proves native ≡ fold. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    graft.plans.NativeCols.bpeTokenCount(text, merges)

  /** Fold-form twin of [[tokenCount]] — the spec's equivalence
    * reference. */
  private[graft] def tokenCountFold(text: Column,
      merges: Seq[(String, String)]): Column =
    aggregate(
      transform(TextAnalysis.tokens(text),
        w => size(symbols(applyMerges(symbolize(w), merges)))),
      lit(0), _ + _)
}
