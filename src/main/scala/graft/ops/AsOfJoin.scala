package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Point-in-time ("as-of") join: attach to each left row the NEAREST
  * right row at-or-before (backward) or at-or-after (forward) its
  * timestamp, within the same key — the feature-lookup shape of
  * training pipelines (no feature leakage from the future), plus the
  * forward/tolerance variants of pandas' merge_asof.
  *
  * NOT implemented as a θ-join + per-left top-1 (that join explodes
  * to |left|×|right| per key before pruning). Instead both sides
  * union into ONE stream, shuffle once on the key, and a single
  * ordered window scan carries the nearest right row past each left
  * row — O(n log n) in the partition, no blowup; the merge-scan an
  * interval index would do, expressed as a window.
  *
  * Matching is equi-join-semantics on keys and timestamps: right
  * rows with a NULL key or NULL timestamp never match anything
  * (`l.key = r.key AND r.ts <= l.ts` is never true through NULL),
  * and left rows with a NULL key or timestamp get NULL lookups.
  */
object AsOfJoin {

  /** @param keys    equi-key columns present on both sides
    * @param tsCol   event-time column present on both sides
    * @param tieCol  total-order tiebreak among right rows with equal
    *                (keys, ts) — the LARGEST tie value wins
    * @param rightVals right columns to attach (bundled atomically:
    *                all values come from the SAME right row)
    * @param suffix  appended to attached column names
    * @param forward false (default): latest right ts ≤ left ts;
    *                true: earliest right ts ≥ left ts
    * @param tolerance optional predicate on (leftTs, matchedRightTs);
    *                when it evaluates false the lookup is masked to
    *                NULL. Correct as a post-mask: the window carries
    *                the NEAREST eligible right row, so if that row is
    *                out of tolerance no in-tolerance row exists.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           tsCol: String, tieCol: String, rightVals: Seq[String],
           suffix: String = "_asof", forward: Boolean = false,
           tolerance: Option[(Column, Column) => Column] = None): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must not be empty")
    val leftCols = left.columns.toSeq
    val reserved = Seq("__side", "__tie", "__r", "__last") ++
      rightVals.map(c => s"$c$suffix")
    reserved.foreach(c => require(!leftCols.contains(c),
      s"left already has a column named '$c' (reserved or attach target)"))

    // the matched right row's own ts rides along for tolerance checks
    val bundleVals = (rightVals :+ tsCol).distinct
    val bundleType = StructType(
      bundleVals.map(c => StructField(c, right.schema(c).dataType)))
    val unifiedCols = leftCols ++ Seq("__side", "__tie", "__r")

    val lNorm = left.select(
      leftCols.map(col) ++ Seq(
        lit(1).as("__side"),
        lit(null).cast(right.schema(tieCol).dataType).as("__tie"),
        lit(null).cast(bundleType).as("__r")): _*)
    // equi-semantics: NULL keys/ts on the right can never match
    val rNorm = right
      .filter(col(tsCol).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .select(leftCols.map { c =>
        val fromRight: Column =
          if (keys.contains(c) || c == tsCol) col(c)
          else lit(null).cast(left.schema(c).dataType)
        fromRight.as(c)
      } ++ Seq(
        lit(0).as("__side"),
        col(tieCol).as("__tie"),
        struct(bundleVals.map(col): _*).as("__r")): _*)

    // Backward (ts asc): at equal ts, right (side 0) sorts before left
    // (side 1) so an exactly-coincident right row is visible "at or
    // before"; among equal-ts right rows the largest tie is last
    // (= wins); left rows with NULL ts sort first and see no rights.
    // Forward (ts desc): rights later in time are scanned first, so
    // the carried "last" right row is the EARLIEST one ≥ the left ts —
    // the same window code computes the mirror-image nearest match.
    val tsOrder =
      if (forward) col(tsCol).desc_nulls_last else col(tsCol).asc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = lNorm.select(unifiedCols.map(col): _*)
      .unionByName(rNorm)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // left rows with a NULL key share one window partition, and in the
    // forward scan NULL-ts left rows sort last (they'd see every right
    // row) — mask both back to NULL (equi-joins never match NULLs)
    val lookupNull = keys.map(col(_).isNull).reduce(_ || _) ||
      (if (forward) col(tsCol).isNull else lit(false))
    val inTolerance = tolerance match {
      case Some(p) => p(col(tsCol), col("__last").getField(tsCol))
      case None    => lit(true)
    }
    attached.select(
      leftCols.map(col) ++ rightVals.map { c =>
        when(!lookupNull && inTolerance, col("__last").getField(c))
          .as(s"$c$suffix")
      }: _*)
  }
}
