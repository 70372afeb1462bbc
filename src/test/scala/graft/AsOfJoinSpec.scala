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

  test("asOf: NULL keys/ts never match (equi-join semantics)") {
    val left = Seq(
      (10L, Option("a"), Option(100L), 1.0),
      (11L, Option.empty[String], Option(100L), 2.0),  // null key
      (12L, Option("a"), Option.empty[Long], 3.0))     // null ts
      .toDF("event_id", "k", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val right = Seq(
      (1L, Option("a"), Option(90L), 0.9),
      (2L, Option.empty[String], Option(90L), 8.8),    // null key: never matches
      (3L, Option("a"), Option.empty[Long], 7.7))      // null ts: never matches
      .toDF("event_id", "k", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "event_id",
      Seq("event_id", "value"))
      .select("event_id", "event_id_asof")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(10L).contains(1L)) // normal match unaffected
    assert(out(11L).isEmpty)      // null-key left: no lookup
    assert(out(12L).isEmpty)      // null-ts left: nothing at-or-before
  }

  test("asOf: rejects reserved/colliding output column names") {
    val left = side((10L, "a", 100L, 1.0)).withColumn("value_asof", lit(9))
    val right = side((1L, "a", 90L, 0.9))
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("k"), "ts", "event_id", Seq("value"))
    }
  }

  test("asOf forward: earliest right at-or-after; tolerance masks far matches") {
    val left = side((10L, "a", 100L, 1.0), (11L, "a", 200L, 2.0),
      (12L, "a", 500L, 3.0))
    val right = side((1L, "a", 100L, 0.9), (2L, "a", 260L, 1.5))
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "event_id",
      Seq("event_id"), forward = true,
      tolerance = Some((l, r) =>
        unix_micros(r) - unix_micros(l) <= 100L * 1000000L))
      .select("event_id", "event_id_asof")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(10L).contains(1L)) // coincident right is eligible
    assert(out(11L).contains(2L)) // 260 within 200+100
    assert(out(12L).isEmpty)      // nothing at or after 500
    // without tolerance, 11 still matches 2; 10 prefers the
    // coincident row over the later one
    val free = AsOfJoin.asOf(left, right, Seq("k"), "ts", "event_id",
      Seq("event_id"), forward = true)
      .select("event_id", "event_id_asof")
      .as[(Long, Option[Long])].collect().toMap
    assert(free(10L).contains(1L) && free(11L).contains(2L)
      && free(12L).isEmpty)
  }

  test("asOf forward ≡ θ-join + earliest-per-left on random data") {
    val rnd = new scala.util.Random(7)
    val keys = Seq("a", "b", "c")
    val left = (1L to 120L).map(i =>
      (i, keys(rnd.nextInt(3)), rnd.nextInt(1000).toLong, 0.0))
    val right = (1001L to 1200L).map(i =>
      (i, keys(rnd.nextInt(3)), rnd.nextInt(1000).toLong, 0.0))
    val l = side(left: _*); val r = side(right: _*)
    val got = AsOfJoin.asOf(l, r, Seq("k"), "ts", "event_id",
      Seq("event_id"), forward = true)
      .select("event_id", "event_id_asof")
      .as[(Long, Option[Long])].collect().toMap
    val theta = l.as("l").join(r.as("r"),
        col("l.k") === col("r.k") && col("r.ts") >= col("l.ts"), "left")
      .groupBy(col("l.event_id"))
      .agg(min_by(col("r.event_id"),
        struct(col("r.ts"), -col("r.event_id"))).as("want"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == theta)
  }

  test("last-touch attribution shape: in-window nearest wins, tie by id, " +
    "out-of-window masks to none") {
    // touches (right): user a has a view@100 and click@200 (equal-ts
    // pair at 200 tie-breaks to the larger id); user b's only touch is
    // far outside the 50 s lookback
    val conv = side((90L, "a", 210L, 9.0), (91L, "b", 500L, 5.0))
    val touch = Seq(
      (1L, "a", 100L, "view"), (2L, "a", 200L, "view"),
      (3L, "a", 200L, "click"), (4L, "b", 100L, "view"))
      .toDF("event_id", "k", "sec", "event_type")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val out = AsOfJoin.asOf(conv, touch, Seq("k"), "ts", "event_id",
      Seq("event_type"),
      tolerance = Some((l, r) => unix_micros(l) - unix_micros(r) <= 50000000L))
      .select(col("event_id"),
        coalesce(col("event_type_asof"), lit("none")).as("channel"))
      .as[(Long, String)].collect().toMap
    assert(out(90L) == "click") // nearest ts 200, tie → id 3 (click)
    assert(out(91L) == "none")  // touch@100 is 400 s back — masked
  }
}
