package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: attach to each left row the LATEST
  * right row whose timestamp is ≤ the left row's, within the same
  * key — the feature-lookup shape of training pipelines (no feature
  * leakage from the future).
  *
  * NOT implemented as a θ-join + per-left top-1 (that join explodes
  * to |left|×|right| per key before pruning). Instead both sides
  * union into ONE stream, shuffle once on the key, and a single
  * ordered window scan carries the latest right row forward past
  * each left row — O(n log n) in the partition, no blowup; the
  * merge-scan an interval index would do, expressed as a window.
  */
object AsOfJoin {

  /** @param keys    equi-key columns present on both sides
    * @param tsCol   event-time column present on both sides
    * @param tieCol  total-order tiebreak among right rows with equal
    *                (keys, ts) — the LARGEST tie value wins
    * @param rightVals right columns to attach (bundled atomically:
    *                all values come from the SAME right row)
    * @param suffix  appended to attached column names
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           tsCol: String, tieCol: String, rightVals: Seq[String],
           suffix: String = "_asof"): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must not be empty")
    val leftCols = left.columns.toSeq
    // unified shape: keys ++ ts ++ side ++ tie ++ left payload ++ right bundle
    val lNorm = left
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(right.schema(tieCol).dataType))
      .withColumn("__r", lit(null).cast(
        s"struct<${rightVals.map(c => s"$c:${right.schema(c).dataType.sql}").mkString(",")}>"))
    val rNorm = {
      val bundle = struct(rightVals.map(col): _*)
      val base = right
        .withColumn("__side", lit(0))
        .withColumn("__tie", col(tieCol))
        .withColumn("__r", bundle)
      // right rows carry ONLY the unified-schema columns
      val padded = leftCols.foldLeft(base) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
      padded.select((leftCols ++ Seq("__side", "__tie", "__r")).map(col): _*)
    }
    val unioned = lNorm.select(
      (leftCols ++ Seq("__side", "__tie", "__r")).map(col): _*)
      .unionByName(rNorm)

    // at equal ts, right (side 0) sorts before left (side 1) so an
    // exactly-coincident right row is visible "at or before"; among
    // equal-ts right rows the largest tie is last (= wins)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = unioned
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    rightVals.foldLeft(attached) { (df, c) =>
      df.withColumn(s"$c$suffix", col(s"__last.$c"))
    }.drop("__side", "__tie", "__r", "__last")
  }
}
