package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("byBucket ≡ theta join, incl bucket-straddling intervals") {
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
