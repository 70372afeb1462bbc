package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data profiling — the pipeline-health scan a 100 TB ingest
  * runs before anything else: per-column null counts, distinct
  * counts, and min/max, computed in a SINGLE pass over the table.
  *
  * Scale shape: every measure is an aggregate with a map-side partial
  * (count/sum/min/max), so the scan streams once and ships one
  * partial row per partition. Exact multi-column DISTINCT makes
  * Catalyst expand the input once per distinct column before the
  * shuffle — fine for a handful of profiled columns; for wide
  * profiles at full scale use [[profileApprox]], whose HLL++ sketches
  * keep the plan expand-free at any column count.
  */
object Profiling {

  private def measures(c: String, exact: Boolean) = Seq(
    sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
    (if (exact) countDistinct(col(c))
     else approx_count_distinct(col(c), 0.02)).as(s"${c}__distinct"),
    min(col(c)).cast("string").as(s"${c}__min"),
    max(col(c)).cast("string").as(s"${c}__max"))

  private def stacked(df: DataFrame, cols: Seq[String], exact: Boolean) = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(measures(_, exact))
    val row = df.agg(aggs.head, aggs.tail: _*)
    // one wide row → one tidy row per column
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    row.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)"))
  }

  /** Exact profile: (col_name, n_nulls, n_distinct, min_val, max_val)
    * per named column; min/max rendered as strings so mixed column
    * types share one schema. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    stacked(df, cols, exact = true)

  /** [[profile]] with approximate (HLL++, 2% rsd) distinct counts —
    * the wide-profile / full-scale variant. */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    stacked(df, cols, exact = false)

  /** Distribution drift between two corpus versions, as total
    * variation distance over a caller-chosen bucketing (length bucket,
    * language, source, quality band, …): the per-bucket share gap a
    * retrain gate checks before swapping in a new crawl.
    *
    * TVD = ½·Σ_buckets |share_a − share_b| is exactly representable in
    * integer ppm arithmetic (unlike KL/PSI, whose log makes the result
    * float-divergent across engines), so the gate value is bit-exact
    * anywhere. Returns one row per bucket present in EITHER version
    * (absent side counts 0) with both shares, the bucket's |gap|, and
    * the corpus-level `tvd_ppm` repeated on every row.
    *
    * Scale shape: each side is one map-side-combinable count-by-bucket
    * (a streaming pass); the join + global window run on |buckets|
    * rows, never corpus rows. Both inputs must be non-empty (shares of
    * an empty corpus are undefined).
    */
  def driftTvd(a: DataFrame, b: DataFrame, bucket: Column): DataFrame = {
    def counts(df: DataFrame, n: String) =
      df.select(bucket.as("bucket")).groupBy("bucket")
        .agg(count(lit(1)).as(n))
    driftTvdCounts(counts(a, "n_a"), counts(b, "n_b"))
  }

  /** [[driftTvd]] over pre-aggregated histograms — the form a
    * STREAMING gate uses, where the reference side is a frozen
    * `(bucket, n_a)` table and only the batch side is counted live.
    * Inputs: `(bucket, n_a)` and `(bucket, n_b)`; both totals must be
    * positive (an empty side has no shares — under ANSI mode the div
    * raises rather than returning nulls). */
  def driftTvdCounts(countsA: DataFrame, countsB: DataFrame): DataFrame = {
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    // null-SAFE join: a null bucket (e.g. unknown language) is a real
    // category present on both sides — an equality join would keep the
    // two null rows apart and double-count their share gap
    val a = countsA.select(col("bucket").as("__ba"),
      col("n_a").cast("long").as("n_a"))
    val b = countsB.select(col("bucket").as("__bb"),
      col("n_b").cast("long").as("n_b"))
    a.join(b, col("__ba") <=> col("__bb"), "full_outer")
      .select(coalesce(col("__ba"), col("__bb")).as("bucket"),
        col("n_a"), col("n_b"))
      .na.fill(0L, Seq("n_a", "n_b"))
      .withColumn("__ta", sum(col("n_a")).over(whole))
      .withColumn("__tb", sum(col("n_b")).over(whole))
      .withColumn("share_a_ppm", expr("n_a * 1000000 div __ta"))
      .withColumn("share_b_ppm", expr("n_b * 1000000 div __tb"))
      .withColumn("gap_ppm", abs(col("share_a_ppm") - col("share_b_ppm")))
      .withColumn("tvd_ppm", expr("sum(gap_ppm) over () div 2"))
      .drop("__ta", "__tb")
  }

  /** Corpus snapshot diff — the dataset-versioning primitive: which
    * documents were `added`, `removed`, `changed`, or `unchanged`
    * between two corpus versions, decided by content fingerprint
    * (md5), keyed by document id.
    *
    * Scale shape: both sides collapse to (id, 16-byte fingerprint) in
    * a narrow map BEFORE the full-outer join, so the shuffle moves
    * hashes, never text — at 100 TB the join weighs |ids|·~25 bytes
    * per side regardless of document size. One id-keyed exchange per
    * side, nothing else.
    *
    * `idCol` must be unique WITHIN each version (the usual corpus
    * contract; [[graft.ops.Validation]]'s key-uniqueness check gates
    * it) — a duplicated id would fan out through the join like any
    * keyed join would.
    */
  def corpusDiff(a: DataFrame, b: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    // explicit presence flags + null-safe fingerprint compare: a doc
    // PRESENT with a NULL text must not read as absent (md5(null) is
    // null), and null-vs-null text is unchanged
    val fa = a.select(col(idCol).as(idCol), md5(col(textCol)).as("__fa"),
      lit(true).as("__ina"))
    val fb = b.select(col(idCol).as(idCol), md5(col(textCol)).as("__fb"),
      lit(true).as("__inb"))
    fa.join(fb, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__ina").isNull, lit("added"))
          .when(col("__inb").isNull, lit("removed"))
          .when(col("__fa") <=> col("__fb"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col(idCol), col("status"))
  }

  /** Mergeable sufficient statistics for simple linear regression of
    * `yCol` on `xCol`, per group: (n, Σx, Σy, Σx², Σxy, Σy²) plus the
    * derived slope, intercept, and Pearson r.
    *
    * Scale shape: the six statistics are all sums/counts — map-side
    * combinable monoids — so the whole fit is ONE streaming pass and
    * one partial-aggregated shuffle, no matter the table size; and
    * because sums merge, per-partition (or per-day) stats roll up into
    * global ones without revisiting the data. The sums are exact
    * DECIMAL arithmetic (cross-engine deterministic); the derived
    * coefficients are IEEE-double expressions over those exact sums,
    * so they too are bit-identical wherever the expression order
    * matches. Rows with a NULL x or y are excluded (the SQL
    * regr_slope convention). */
  def sufficientStats(df: DataFrame, groupCols: Seq[String],
                      xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "sufficientStats needs group columns")
    val x = col(xCol).cast("decimal(18,6)")
    val y = col(yCol).cast("decimal(18,6)")
    def prod(a: Column, b: Column) =
      (a * b).cast("decimal(38,12)")
    def sumProd(a: Column, b: Column) =
      sum(prod(a, b)).cast("decimal(30,6)").cast("double")
    val stats = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sum_x"),
        sum(y).cast("double").as("sum_y"),
        sumProd(x, x).as("sum_xx"),
        sumProd(x, y).as("sum_xy"),
        sumProd(y, y).as("sum_yy"))
    // covariance/variance numerators, scaled by n (no division yet).
    // Degenerate groups (zero variance — e.g. a single point) get NULL
    // coefficients, the SQL regr_slope convention; the guard also keeps
    // ANSI mode from raising on the 0/0.
    val covXY = col("n") * col("sum_xy") - col("sum_x") * col("sum_y")
    val varX = col("n") * col("sum_xx") - col("sum_x") * col("sum_x")
    val varY = col("n") * col("sum_yy") - col("sum_y") * col("sum_y")
    stats
      .withColumn("slope", when(varX =!= 0.0, covXY / varX))
      .withColumn("intercept",
        (col("sum_y") - col("slope") * col("sum_x")) / col("n"))
      .withColumn("r", when(varX =!= 0.0 && varY =!= 0.0,
        covXY / (sqrt(varX) * sqrt(varY))))
  }

  /** Embedding-space drift between two corpus snapshots: per group
    * (label/domain), the L1 and L∞ distance between the two
    * snapshots' centroids — the semantic complement of the discrete
    * [[driftTvd]] gate (a re-crawled domain whose bucket histogram
    * is stable can still MOVE in embedding space; the centroid shift
    * is what the retrieval/dedup thresholds downstream actually feel).
    *
    * Exactness (the md5-sibling discipline applied to floats): each
    * float component is quantized ONCE to `floor(x · 2^20)` — float→
    * double widening is exact, the double multiply and floor are the
    * same IEEE ops in any engine — and every aggregate thereafter is
    * integer (sums, counts, `div`). Centroid components are scaled
    * integers; no float sum ever crosses engines. Quantization error
    * ≤ 2⁻²⁰ per component is three orders below any drift worth
    * alarming on.
    *
    * Scale shape: posexplode to (group, dim, q) is a narrow map; the
    * sums collapse map-side to |groups|·dim rows; the join and final
    * per-group fold are over that tiny aggregate — the embedding
    * tables themselves shuffle once each, keyed (group, dim).
    * Magnitudes: |q| ≤ 2²⁰ for unit-normalized components, so the
    * per-(group, dim) Long sum is safe to ~8·10¹² rows per group;
    * past that, cast the sum to DECIMAL (the cooccurrence
    * discipline) before the div. Requires fixed-dimension vectors
    * and FAILS LOUDLY on ragged input (the winnowIndex params-guard
    * discipline, but plan-embedded — zero extra pass): the centroid
    * join is a full-outer on (group, dim), and a group is rejected
    * with raise_error when a dim is present in only one snapshot OR
    * when per-dim vector counts vary within a side (short vectors
    * inside one snapshot) — the silent alternative biases exactly
    * the high dims a truncated embedding batch drops. A group
    * present in only ONE snapshot entirely is not ragged — it has no
    * drift to measure and is dropped, as the inner join always did.
    *
    * @return (group, n_a, n_b, l1_drift_q20, linf_drift_q20) — scaled
    *         by 2²⁰; divide by 1 048 576 for raw units
    */
  def embeddingDrift(a: DataFrame, b: DataFrame, groupCol: String,
      vecCol: String): DataFrame = {
    def centroids(df: DataFrame, side: String) = df
      .select(col(groupCol).as("group"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("q", floor(col("x").cast("double") * lit(1048576.0))
        .cast("long"))
      .groupBy(col("group"), col("dim"))
      .agg(sum(col("q")).as(s"sum_$side"),
        count(lit(1)).as(s"n_$side"))
      .withColumn(s"c_$side",
        expr(s"sum_$side div n_$side"))
    val ragged = col("__da") < col("__dims") || col("__db") < col("__dims") ||
      col("__na_min") =!= col("__na_max") || col("__nb_min") =!= col("__nb_max")
    centroids(a, "a")
      .join(centroids(b, "b"), Seq("group", "dim"), "full_outer")
      .withColumn("d", abs(col("c_a") - col("c_b")))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("__dims"),
        count(col("c_a")).as("__da"), count(col("c_b")).as("__db"),
        min(col("n_a")).as("__na_min"), max(col("n_a")).as("__na_max"),
        min(col("n_b")).as("__nb_min"), max(col("n_b")).as("__nb_max"),
        sum(col("d")).as("__l1"), max(col("d")).as("__linf"))
      // group absent from one snapshot entirely: nothing to compare
      .filter(col("__da") > 0 && col("__db") > 0)
      .select(col("group"),
        when(ragged, raise_error(concat(
          lit("embeddingDrift: ragged dimensions in group "),
          col("group").cast("string"),
          lit(" — a dim is missing from one snapshot or vector " +
            "lengths vary within a snapshot; fix the embedding batch " +
            "upstream"))).cast("long"))
          .otherwise(col("__na_max")).as("n_a"),
        col("__nb_max").as("n_b"),
        col("__l1").as("l1_drift_q20"),
        col("__linf").as("linf_drift_q20"))
  }
}
