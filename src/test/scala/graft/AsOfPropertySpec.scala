package graft

import scala.util.Random

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

/** Property: the union+window as-of join ≡ the reference θ-join +
  * per-left top-1 (the definitionally-correct but non-scalable form),
  * across random key/timestamp distributions with heavy ties,
  * coincident timestamps, and sparse keys.
  */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomSide(rnd: Random, n: Int, idBase: Long) =
    (0 until n).map { i =>
      (idBase + i,                       // unique event id (tiebreak)
        "k" + rnd.nextInt(6),            // few keys → collisions
        rnd.nextInt(40).toLong,          // coarse ts → many exact ties
        math.round(rnd.nextDouble() * 1e4) / 100.0)
    }

  test("asOf ≡ theta-join top-1 on random data (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val left = randomSide(rnd, 60, 1000L)
        .toDF("event_id", "k", "sec", "value")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      val right = randomSide(rnd, 60, 2000L)
        .toDF("event_id", "k", "sec", "value")
        .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")

      val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "event_id",
        Seq("event_id", "value"))
        .select(col("event_id"), col("event_id_asof"), col("value_asof"))
        .as[(Long, Option[Long], Option[Double])].collect().toSet

      // reference implementation: θ-join, rank right rows per left by
      // (ts DESC, tie DESC), keep rank 1 (left-outer so no-match rows
      // survive with nulls)
      val r = right.select(
        col("k").as("r_k"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("value").as("r_value"))
      val ranked = left.join(r,
          col("k") === col("r_k") && col("r_ts") <= col("ts"), "left_outer")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_id"))
            .orderBy(col("r_ts").desc_nulls_last, col("r_event_id").desc_nulls_last)))
        .filter(col("rn") === 1)
      val expected = ranked
        .select(col("event_id"), col("r_event_id"), col("r_value"))
        .as[(Long, Option[Long], Option[Double])].collect().toSet

      assert(got == expected, s"seed=$seed")
    }
  }
}
