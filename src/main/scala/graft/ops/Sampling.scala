package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. `rand()`-based
  * sampling is unreproducible across runs/planners and un-oracleable;
  * hashing a stable id gives the same sample on every engine, every
  * run, at every parallelism — and stays a narrow map (no shuffle)
  * for the Bernoulli form.
  */
object Sampling {

  /** Uniform deterministic hash of an id column into [0, 2^60):
    * first 15 hex chars of md5 of the id's decimal text. md5 (not
    * xxhash64) so any engine can reproduce the sample membership.
    */
  def hash60(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** The integer cutoff such that `hash60 < cutoff` keeps ≈`fraction`
    * of rows. Computed in driver code so Spark and any oracle can
    * share the exact literal. */
  def cutoff(fraction: Double): Long =
    (fraction * (1L << 60).toDouble).toLong

  /** Bernoulli sample: keep a row iff its id hashes under the cutoff.
    * Membership depends only on the id — stable under repartitioning,
    * retries, and engine changes; no shuffle. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hash60(col(idCol)) < lit(cutoff(fraction)))

  /** Domain-mixing sample: a different keep-fraction per group value
    * (e.g. up-sample curated sources, down-sample web crawl), with a
    * `default` for unlisted groups. Same hash-membership determinism
    * as [[hashSample]]; still a narrow map, no shuffle. */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
                     fractions: Map[String, Double], default: Double): DataFrame = {
    val cut = fractions.foldLeft(lit(cutoff(default))) {
      case (acc, (g, f)) => when(col(groupCol) === g, lit(cutoff(f))).otherwise(acc)
    }
    df.filter(hash60(col(idCol)) < cut)
  }

  /** Stratified fixed-size sample: the `n` rows of each stratum whose
    * ids hash lowest (ties broken by id). Equivalent to a per-stratum
    * uniform draw, but deterministic; one shuffle on the stratum key.
    * At scale, strata are many and small relative to the corpus —
    * the window never sees a partition bigger than a stratum.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hash60(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Discrete quantiles of an integer measure per group: the value at
    * 1-based rank `ceil(p * count)` in (measure, id) order — the
    * percentile-disc definition, integer-exact so any engine agrees
    * bit-for-bit (interpolating quantiles differ by float rounding).
    */
  def discreteQuantiles(df: DataFrame, groupCol: String, idCol: String,
                        measure: Column, ps: Seq[(String, Double)]): DataFrame = {
    val ranked = df
      .select(col(groupCol), col(idCol), measure.as("__m"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__m"), col(idCol))))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    // ceil(p * count) must be written IDENTICALLY in any oracle SQL:
    // both engines do the same IEEE double multiply, so edge cases
    // like 500 * 0.9 = 450.00000000000006 → 451 agree by construction
    val aggs = ps.map { case (name, p) =>
      max(when(col("__rn") === ceil(col("__cnt") * p), col("__m"))).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
