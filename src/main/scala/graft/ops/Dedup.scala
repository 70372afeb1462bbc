package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard. Designed for the 100 TB
  * path: every stage is a narrow map or a shuffle keyed by
  * hash/band-bucket; candidate pair generation never goes O(n²) on
  * the full corpus — only within LSH buckets.
  */
object Dedup {

  /** Exact dedup: keep the lowest id per content fingerprint.
    * One shuffle on the (high-cardinality, well-distributed) md5 key;
    * min-aggregate is map-side combinable.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Word n-gram shingle set of a text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** MinHash signature: for each of `numHashes` seeded hash
    * functions, the min over the shingle set of xxhash64(shingle,
    * seed). Pure column expressions → codegen, no shuffle.
    */
  def minhashSignature(shingleSet: Column, numHashes: Int = 32): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleSet, s => xxhash64(s, lit(seed))))
    }: _*)

  /** MinHash LSH candidate pairs, verified by true Jaccard.
    *
    * shingle → signature (map) → explode bands (map) → shuffle by
    * (band, bucket-hash) → pairs within buckets (tiny) → distinct →
    * exact-Jaccard filter on the pair (map). The only O(n²) work is
    * inside buckets; band/bucket keying is the scale path.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold
    */
  def minhashNearDuplicates(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, threshold: Double = 0.8,
      shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands

    val withSig = docs
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sh", shingles(col("text"), shingleN))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    val banded = withSig.select(
      col("id"), col("sh"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)))))
        .as(Seq("band", "bucket")))

    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh").as("sh_b"))

    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: sign-sum of per-token
    * hashes, bit by bit — expressed as a fold over bit positions with
    * only built-ins.
    */
  def simhash(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val hashes = transform(toks, t => xxhash64(t))
    // bit i of the simhash = majority vote of bit i across token hashes
    val bits = (0 until 64).map { i =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** SimHash near-dup candidates: block on 16-bit chunks (any pair
    * within Hamming distance 3 shares at least one of 4 chunks —
    * pigeonhole), verify by true Hamming distance.
    */
  def simhashNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                            maxHamming: Int = 3): DataFrame = {
    val withSim = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sim", simhash(col("text")))
    val chunked = withSim.select(
      col("id"), col("sim"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sim"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "ckey")))
    val a = chunked.select(col("chunk"), col("ckey"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = chunked.select(col("chunk"), col("ckey"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sim_a"), col("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Character-set Jaccard similarity (the classic cheap near-dup
    * score; set-based |A∩B| / |A∪B| over distinct characters).
    */
  def charJaccard(a: Column, b: Column): Column = {
    val ca = array_distinct(split(a, ""))
    val cb = array_distinct(split(b, ""))
    size(array_intersect(ca, cb)).cast("double") / size(array_union(ca, cb))
  }
}
