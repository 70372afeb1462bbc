package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment ("range") join: pair each point row with every
  * interval row of the same key that contains its timestamp.
  *
  * The naive form is a θ-join (`p.ts BETWEEN i.start AND i.end`) —
  * Spark can only run that as BroadcastNestedLoopJoin or a cartesian
  * per key, O(|points|×|intervals|). Instead both sides map onto
  * coarse time buckets: an interval replicates into each bucket it
  * overlaps, a point lands in exactly ONE bucket, and the join becomes
  * a plain hash equi-join on (key, bucket) + a residual containment
  * filter. Because the point side has a single bucket, every matching
  * (interval, point) pair appears exactly once — no dedup pass.
  * Replication factor = interval length / bucketSeconds (pick the
  * bucket near the typical interval length).
  */
object RangeJoin {

  /** @param intervals needs `startCol`/`endCol` (inclusive bounds)
    * @param points    needs `tsCol`
    * @param keys      equi-key columns on both sides
    *
    * Callers must pre-project the two sides to disjoint non-key
    * column names (the result carries both sides' columns). Bucket
    * ids use second-truncated timestamps — truncation is monotone, so
    * bucketing stays conservative and the exact residual filter on
    * the full-precision timestamps decides membership.
    */
  def byBucket(intervals: DataFrame, points: DataFrame, keys: Seq[String],
               startCol: String, endCol: String, tsCol: String,
               bucketSeconds: Long = 60): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(!intervals.columns.contains("__bucket") &&
      !points.columns.contains("__bucket"),
      "input already has a __bucket column (reserved temp name)")
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSeconds),
        floor(unix_timestamp(col(endCol)) / bucketSeconds))))
    val pt = points.withColumn("__bucket",
      floor(unix_timestamp(col(tsCol)) / bucketSeconds))
    iv.join(pt, keys :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
