package graft.ops

import org.apache.spark.sql.DataFrame
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
}
