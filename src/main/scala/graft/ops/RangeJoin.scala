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

  /** Interval × interval OVERLAP join: pair rows of the same key whose
    * [start, end] ranges intersect (inclusive bounds) — the
    * session-vs-incident shape. Same bucket-replication idea as
    * [[byBucket]], but BOTH sides replicate, so a pair can share many
    * buckets; instead of a dedup pass, each pair is emitted only in
    * the FIRST bucket the two ranges share —
    * max(bucket(a.start), bucket(b.start)) — which costs one integer
    * comparison per candidate instead of a distinct over the result.
    *
    * Callers pre-project disjoint non-key column names; bounds
    * columns are (aStart, aEnd) on `left` and (bStart, bEnd) on
    * `right`. Replication factor per row = range length /
    * bucketSeconds.
    */
  def overlapByBucket(left: DataFrame, right: DataFrame, keys: Seq[String],
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketSeconds: Long = 60): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val reserved = Seq("__bucket", "__astart_b", "__bstart_b")
    reserved.foreach(c => require(
      !left.columns.contains(c) && !right.columns.contains(c),
      s"input already has a column named '$c' (reserved temp name)"))
    def b(c: String) = floor(unix_timestamp(col(c)) / bucketSeconds)
    val l = left
      .withColumn("__astart_b", b(aStart))
      .withColumn("__bucket", explode(sequence(b(aStart), b(aEnd))))
    val r = right
      .withColumn("__bstart_b", b(bStart))
      .withColumn("__bucket", explode(sequence(b(bStart), b(bEnd))))
    l.join(r, keys :+ "__bucket")
      // overlap test (inclusive): a.start <= b.end AND b.start <= a.end
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      // emit each pair exactly once: in the first shared bucket
      .filter(col("__bucket") ===
        greatest(col("__astart_b"), col("__bstart_b")))
      .drop("__bucket", "__astart_b", "__bstart_b")
  }
}
