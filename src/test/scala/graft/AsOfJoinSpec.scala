package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // (id, key, ts-seconds, value)
  private def side(rows: (Long, String, Long, Double)*) =
    rows.toDF("event_id", "k", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")

  test("asOf: latest right at-or-before, per key; nulls before any right") {
    val left = side((10L, "a", 100L, 1.0), (11L, "a", 200L, 2.0),
      (12L, "a", 50L, 3.0), (20L, "b", 100L, 4.0))
    val right = side((1L, "a", 90L, 0.9), (2L, "a", 150L, 1.5),
      (3L, "b", 100L, 7.0)) // exactly coincident with left 20
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "event_id",
      Seq("event_id", "value"))
      .select("event_id", "event_id_asof", "value_asof")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(10L) == (Some(1L), Some(0.9)))   // 90 <= 100
    assert(out(11L) == (Some(2L), Some(1.5)))   // 150 <= 200
    assert(out(12L) == (None, None))            // nothing at or before 50
    assert(out(20L) == (Some(3L), Some(7.0)))   // equal ts is eligible
  }

  test("asOf: equal-ts right rows tie-break to the largest tie value") {
    val left = side((10L, "a", 100L, 0.0))
    val right = side((5L, "a", 100L, 5.5), (7L, "a", 100L, 7.7),
      (6L, "a", 100L, 6.6))
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "event_id",
      Seq("event_id", "value"))
      .select("event_id_asof", "value_asof")
      .as[(Long, Double)].collect().toSeq
    // all values from the SAME winning row (event_id 7), never mixed
    assert(out == Seq((7L, 7.7)))
  }

  test("asOf: no cross-key leakage") {
    val left = side((10L, "a", 100L, 0.0))
    val right = side((1L, "b", 90L, 9.9))
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "event_id",
      Seq("value"))
      .select("value_asof").as[Option[Double]].collect().toSeq
    assert(out == Seq(None))
  }

  test("rangeJoin byBucket ≡ theta join, incl bucket-straddling intervals") {
    import graft.ops.RangeJoin
    // interval [95, 185] spans buckets 1..3 at 60s buckets; points at
    // 94 (out), 95 (edge in), 150 (in), 185 (edge in), 186 (out)
    val intervals = Seq((1L, "a", 95L, 185L), (2L, "a", 400L, 410L),
      (3L, "b", 100L, 200L))
      .toDF("iv_id", "k", "s", "e")
      .withColumn("st", timestamp_seconds(col("s")))
      .withColumn("en", timestamp_seconds(col("e"))).drop("s", "e")
    val points = Seq((10L, "a", 94L), (11L, "a", 95L), (12L, "a", 150L),
      (13L, "a", 185L), (14L, "a", 186L), (15L, "b", 150L))
      .toDF("pt_id", "k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val got = RangeJoin.byBucket(intervals, points, Seq("k"), "st", "en", "ts")
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    val expected = intervals.as("i").join(points.as("p"),
      $"i.k" === $"p.k" && $"p.ts" >= $"i.st" && $"p.ts" <= $"i.en")
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(got == Set((1L, 11L), (1L, 12L), (1L, 13L), (3L, 15L)))
  }
}
