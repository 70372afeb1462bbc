package graft

import graft.apply.{ApplyEngine, IncrementalAgg}
import graft.model.{TableId, TableMeta}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance ≡ full recompute — the property
  * the oracle checks once (cdc_incr_agg) is exercised here across
  * adversarial change shapes: group migration, group-emptying
  * deletes, first-of-group inserts, replace-on-existing, patches on
  * missing keys, null groups, and multi-batch chaining. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def baseTable: DataFrame = Seq(
    (1L, "red", 10.0), (2L, "red", 20.0), (3L, "blue", 5.0),
    (4L, "blue", 7.0), (5L, "lone", 100.0), (6L, null.asInstanceOf[String], 1.0))
    .toDF("id", "g", "v")

  private def meta(t: DataFrame) =
    TableMeta(TableId("db", "public", "t"), t.schema, Seq("id"))

  private def collapsedOf(rows: (Seq[String], String, Map[String, String])*) =
    rows.map { case (k, st, vals) => (k, st, vals, 0) }
      .toDF("key", "st", "vals", "viol")

  private val dec = (r: String => org.apache.spark.sql.Column) =>
    r("v").cast("decimal(18,6)")

  private def maintain(t: DataFrame, collapsed: DataFrame): DataFrame = {
    val m = meta(t)
    val s0 = IncrementalAgg.groupState(t, "g", col("v").cast("decimal(18,6)"))
    IncrementalAgg.applyDelta(s0,
      IncrementalAgg.delta(t, collapsed, m, "g", dec), "g")
  }

  private def recompute(t: DataFrame, collapsed: DataFrame): DataFrame = {
    val m = meta(t)
    IncrementalAgg.groupState(
      ApplyEngine.merge(t, collapsed, m), "g", col("v").cast("decimal(18,6)"))
  }

  private def canon(df: DataFrame): Seq[(Option[String], Long, BigDecimal)] =
    df.select(col("g"), col("cnt"), col("total").cast("decimal(18,6)"))
      .as[(Option[String], Long, BigDecimal)].collect().toSeq
      .sortBy(r => r._1.getOrElse(""))

  test("maintained state matches recompute across every change shape") {
    val t = baseTable
    val changes = collapsedOf(
      (Seq("1"), "patch", Map("g" -> "blue")),          // migrates red → blue
      (Seq("3"), "del", Map.empty),                     // shrink blue
      (Seq("5"), "del", Map.empty),                     // empties group lone
      (Seq("7"), "row", Map("id" -> "7", "g" -> "green", "v" -> "3.5")), // new group
      (Seq("2"), "row", Map("id" -> "2", "g" -> "red", "v" -> "99.0")),  // replace existing
      (Seq("6"), "patch", Map("v" -> "2.0")),           // null group stays null
      (Seq("42"), "patch", Map("v" -> "8.0")))          // missing key: no-op both sides
    assert(canon(maintain(t, changes)) == canon(recompute(t, changes)))
    // group 'lone' must be gone, 'green' must exist
    val groups = canon(maintain(t, changes)).map(_._1)
    assert(!groups.contains(Some("lone")) && groups.contains(Some("green")))
  }

  test("multi-batch chaining: fold deltas through two applies") {
    val t = baseTable
    val m = meta(t)
    val b1 = collapsedOf(
      (Seq("1"), "patch", Map("v" -> "11.0")),
      (Seq("8"), "row", Map("id" -> "8", "g" -> "red", "v" -> "1.0")))
    val b2 = collapsedOf(
      (Seq("8"), "patch", Map("g" -> "blue")),          // migrate the new row
      (Seq("2"), "del", Map.empty))
    val afterB1 = ApplyEngine.merge(t, b1, m).localCheckpoint()
    val s0 = IncrementalAgg.groupState(t, "g", col("v").cast("decimal(18,6)"))
    val s1 = IncrementalAgg.applyDelta(s0,
      IncrementalAgg.delta(t, b1, m, "g", dec), "g").localCheckpoint()
    val s2 = IncrementalAgg.applyDelta(s1,
      IncrementalAgg.delta(afterB1, b2, meta(afterB1), "g", dec), "g")
    val full = IncrementalAgg.groupState(
      ApplyEngine.merge(afterB1, b2, meta(afterB1)), "g",
      col("v").cast("decimal(18,6)"))
    assert(canon(s2) == canon(full))
  }

  test("randomized batches: maintain ≡ recompute") {
    val rnd = new scala.util.Random(97)
    val t = (1L to 60L).map(i =>
      (i, s"g${rnd.nextInt(6)}", rnd.nextInt(100).toDouble))
      .toDF("id", "g", "v")
    val ops = (1 to 40).map { _ =>
      val id = (rnd.nextInt(80) + 1).toLong // some ids miss the table
      rnd.nextInt(3) match {
        case 0 => (Seq(id.toString), "del", Map.empty[String, String])
        case 1 => (Seq(id.toString), "row",
          Map("id" -> id.toString, "g" -> s"g${rnd.nextInt(8)}",
            "v" -> s"${rnd.nextInt(100)}.0"))
        case _ => (Seq(id.toString), "patch",
          if (rnd.nextBoolean()) Map("g" -> s"g${rnd.nextInt(8)}")
          else Map("v" -> s"${rnd.nextInt(100)}.0"))
      }
    }
    // collapse guarantees one state per key; emulate by last-op-wins
    val changes = collapsedOf(
      ops.groupBy(_._1).map(_._2.last).toSeq: _*)
    assert(canon(maintain(t, changes)) == canon(recompute(t, changes)))
  }

  test("refreshGroups: MIN maintained by recomputing only touched groups") {
    val t = baseTable
    val m = meta(t)
    val changes = collapsedOf(
      (Seq("1"), "del", Map.empty),                     // red loses its min
      (Seq("9"), "row", Map("id" -> "9", "g" -> "green", "v" -> "4.0")))
    val applied = ApplyEngine.merge(t, changes, m).localCheckpoint()
    val aggs = Seq(min(col("v")).as("min_v"), count(lit(1)).as("cnt"))
    val state0 = t.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
    val touched = Seq("red", "green").toDF("g") // groups named by the delta
    val out = IncrementalAgg.refreshGroups(state0, applied, touched, "g", aggs)
      .orderBy(col("g"))
    val full = applied.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
      .orderBy(col("g"))
    assert(out.collect().toSeq == full.collect().toSeq)
  }
}
