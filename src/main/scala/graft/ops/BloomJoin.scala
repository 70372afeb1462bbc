package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-sketch membership pre-filtering for joins against a key set
  * that is too large to broadcast as an exact hash relation but cheap
  * as a bit array (an opt-out / blocklist of content fingerprints: a
  * billion 32-byte keys is a 32 GB broadcast, while a 1%-fpp bloom of
  * them is ~1.2 GB). Results are EXACT, not approximate: a bloom
  * filter has no false negatives, so a failed membership check proves
  * the key is absent; false positives are removed by an exact
  * residual join over only the "might contain" sliver. This is the
  * manual, cross-stage analog of the runtime bloom pruning Spark's
  * InjectRuntimeFilter applies within one query (audited in
  * PlanAuditSpec) — here the sketch is built once and can be reused
  * across many scrub jobs.
  *
  * The membership probe is a deserialized predicate (BloomFilter is
  * driver-built and broadcast; there is no codegen'd expression over
  * it), deliberately: one branch-free hash probe per row before the
  * exchange is noise next to the shuffle it avoids — at 100 TB the
  * exchange, not the scan, is the bottleneck.
  */
object BloomJoin {

  /** `put`/`mightContain` dispatch longs and strings differently —
    * accept exactly the types whose dispatch is defined. */
  private def mightContain(bf: Broadcast[BloomFilter], c: Column,
      dt: DataType): Column = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      udf((k: java.lang.Long) =>
        k != null && bf.value.mightContainLong(k)).apply(c.cast(LongType))
    case StringType =>
      udf((k: String) => k != null && bf.value.mightContainString(k))
        .apply(c)
    case other => throw new IllegalArgumentException(
      s"bloom prefilter supports integral/string keys, got ${other.sql}")
  }

  private def build(keys: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double): Broadcast[BloomFilter] =
    keys.sparkSession.sparkContext.broadcast(
      keys.stat.bloomFilter(keyCol, expectedItems, fpp))

  /** Exact semi-join with a bloom pre-filter: corpus rows whose key
    * fails the bloom check cannot match and are dropped BEFORE the
    * shuffle; survivors are confirmed (false positives removed) by
    * the exact semi-join. Result ≡ `fact.join(keys, "left_semi")`.
    */
  def semiJoin(fact: DataFrame, keys: DataFrame, factKey: String,
      keysKey: String, expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = build(keys, keysKey, expectedItems, fpp)
    fact.filter(mightContain(bf, col(factKey),
        fact.schema(factKey).dataType))
      .join(keys.select(col(keysKey).as(factKey)), Seq(factKey),
        "left_semi")
  }

  /** Exact anti-join (the blocklist scrub): corpus rows whose key
    * fails the bloom check are PROVEN absent from the blocklist and
    * bypass the join entirely; only the "might contain" sliver —
    * true matches + fpp·|corpus| false positives — reaches the
    * exchange, where the exact anti-join drops the true matches.
    * Result ≡ `fact.join(keys, "left_anti")` (bloom false positives
    * survive the residual anti-join; null keys match nothing and are
    * kept on the bypass branch, same as a plain left_anti).
    *
    * The corpus is scanned twice (bypass + residual branch), both
    * scans column-pruned with the probe pushed to the scan — the
    * trade is two cheap narrow passes for a shuffle that is ~fpp of
    * the corpus instead of all of it.
    */
  def antiJoin(fact: DataFrame, keys: DataFrame, factKey: String,
      keysKey: String, expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bf = build(keys, keysKey, expectedItems, fpp)
    val mc = mightContain(bf, col(factKey), fact.schema(factKey).dataType)
    val residual = fact.filter(mc)
      .join(keys.select(col(keysKey).as(factKey)), Seq(factKey),
        "left_anti")
    fact.filter(!mc).unionByName(residual)
  }
}
