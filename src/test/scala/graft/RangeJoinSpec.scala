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

  test("overlapByBucket ≡ theta join, each pair emitted exactly once") {
    val rnd = new scala.util.Random(13)
    val keys = Seq("a", "b")
    def ivs(idBase: Long, n: Int) = (1 to n).map { i =>
      val s = rnd.nextInt(1000).toLong
      (idBase + i, keys(rnd.nextInt(2)), s, s + rnd.nextInt(300).toLong)
    }
    val left = ivs(0L, 60).toDF("a_id", "k", "s", "e")
      .withColumn("a_start", timestamp_seconds(col("s")))
      .withColumn("a_end", timestamp_seconds(col("e"))).drop("s", "e")
    val right = ivs(1000L, 60).toDF("b_id", "k", "s", "e")
      .withColumn("b_start", timestamp_seconds(col("s")))
      .withColumn("b_end", timestamp_seconds(col("e"))).drop("s", "e")
    for (bucket <- Seq(7L, 60L, 500L)) {
      val got = RangeJoin.overlapByBucket(left, right, Seq("k"),
        "a_start", "a_end", "b_start", "b_end", bucket)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      val expected = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"l.a_start" <= $"r.b_end" &&
          $"r.b_start" <= $"l.a_end")
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      // multiset equality: no pair may be emitted twice
      assert(got.sorted == expected.sorted, s"bucket=$bucket")
    }
  }

  test("byBucket ≡ theta join on random data across bucket widths") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val intervals = (0 until 50).map { i =>
        val s = rnd.nextInt(3000).toLong
        (i.toLong, "k" + rnd.nextInt(4), s, s + rnd.nextInt(400).toLong)
      }.toDF("iv_id", "k", "s", "e")
        .withColumn("st", timestamp_seconds(col("s")))
        .withColumn("en", timestamp_seconds(col("e"))).drop("s", "e")
      val points = (0 until 200).map { i =>
        (1000L + i, "k" + rnd.nextInt(4), rnd.nextInt(3500).toLong)
      }.toDF("pt_id", "k", "sec")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      val expected = intervals.as("i").join(points.as("p"),
        $"i.k" === $"p.k" && $"p.ts" >= $"i.st" && $"p.ts" <= $"i.en")
        .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
      for (bucket <- Seq(7L, 60L, 1000L)) {
        val got = RangeJoin.byBucket(intervals, points, Seq("k"),
          "st", "en", "ts", bucketSeconds = bucket)
          .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
        assert(got == expected, s"seed=$seed bucket=$bucket")
      }
    }
  }
}
