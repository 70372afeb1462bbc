package graft.apply

import graft.model.TableMeta
import graft.types.PgTypeMapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped COUNT/SUM aggregate from a
  * collapsed CDC change set — materialized-view maintenance over the
  * apply stream. At 100 TB you never recompute `GROUP BY` over the
  * table per batch; you fold the batch's DELTA into the stored
  * aggregate:
  *
  *  1. pre-images: ONE keyed join of the batch's change keys against
  *     the current table (cost ∝ batch, and the join prunes further
  *     under the bucketed store / manifest point lookups) — a row's
  *     old (group, value) is retracted as (−1, −v);
  *  2. post-images: computed LOCALLY from (pre-image, change) with
  *     exactly [[ApplyEngine.merge]]'s semantics (`row` builds from
  *     vals, `patch` overrides the pre-image and is dropped without
  *     one, `del` contributes nothing) — added as (+1, +v);
  *  3. the per-group delta (a map-side-combinable aggregation over ≤
  *     2·|batch| contribution rows) merges into the stored aggregate
  *     by a null-safe group join; groups whose count reaches zero
  *     disappear, groups first seen in the batch appear.
  *
  * COUNT and SUM form an abelian group (retractable); MIN/MAX do not
  * — for those, recompute only the groups the delta touches (the
  * affected-group refresh) instead of folding retractions.
  *
  * Sums run in the caller-chosen exact type (pass a decimal-cast
  * value column — the QueryRegistry determinism contract), so
  * retract-then-add round-trips bit-for-bit.
  */
object IncrementalAgg {

  /** The stored aggregate's full (re)computation — used to seed the
    * state once; after that, [[applyDelta]] keeps it current.
    * Output: (group, cnt, total). */
  def groupState(table: DataFrame, groupCol: String, value: Column): DataFrame =
    table.groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"), sum(value).as("total"))

  /** Per-group delta of one collapsed batch against the CURRENT
    * table state (pre-apply). `valueOf` builds the measured value
    * from a column RESOLVER (name → Column) — the same callback is
    * evaluated once over the pre-image columns and once over the
    * synthesized post-image columns, so retraction and addition
    * measure identically by construction.
    *
    * Single pass: the right-outer PK join yields one row per change
    * key; each row contributes its retraction and its addition via
    * an exploded 2-element array — the joined subtree runs once.
    */
  def delta(table: DataFrame, collapsed: DataFrame, meta: TableMeta,
            groupCol: String,
            valueOf: (String => Column) => Column): DataFrame = {
    val typedKeys = meta.pkCols.zipWithIndex.map { case (c, i) =>
      PgTypeMapper.castFromText(element_at(col("key"), i + 1), meta.colType(c))
        .as(s"__k_$c")
    }
    val chg = collapsed.select(
      typedKeys :+ col("st").as("__st") :+ col("vals").as("__vals"): _*)

    def fromVals(c: String): Column =
      when(map_contains_key(col("__vals"), lit(c)),
        PgTypeMapper.castFromText(element_at(col("__vals"), lit(c)),
          meta.colType(c)))

    val joinCond = meta.pkCols
      .map(c => table(c) <=> chg(s"__k_$c"))
      .reduce(_ && _)
    val joined = table.join(chg, joinCond, "right_outer")

    // a pre-image exists iff the PK join matched (PK cols are non-null
    // in any real row, so a null table-side PK means "no match")
    val preExists = meta.pkCols.map(table(_).isNotNull).reduce(_ && _)

    // post-image per merge semantics; null struct = contributes nothing
    def postCol(c: String): Column = {
      val dt = meta.colType(c)
      when(col("__st") === "row",
        if (meta.pkCols.contains(c)) col(s"__k_$c").cast(dt)
        else fromVals(c).otherwise(lit(null).cast(dt)))
        .when(col("__st") === "patch" && preExists,
          fromVals(c).otherwise(table(c)))
    }
    val postExists = col("__st") === "row" ||
      (col("__st") === "patch" && preExists)

    val preG = table(groupCol)
    val preV = valueOf(c => table(c))
    val postV = valueOf(postCol _)
    val contrib = array(
      when(preExists,
        struct(preG.as("g"), lit(-1L).as("dc"), (-preV).as("dv"))),
      when(postExists,
        struct(postCol(groupCol).as("g"), lit(1L).as("dc"),
          postV.as("dv"))))
    joined
      .select(explode(filter(contrib, c => c.isNotNull)).as("c"))
      .groupBy(col("c.g").as(groupCol))
      .agg(sum(col("c.dc")).as("d_cnt"), sum(col("c.dv")).as("d_total"))
  }

  /** Fold a delta into the stored aggregate: null-safe full-outer on
    * the group (a null group is a group), counts and totals add,
    * zero-count groups vanish. The delta side is ≤ |batch groups|
    * rows — the planner broadcasts it; the state side never
    * reshuffles beyond its own group hash. */
  def applyDelta(state: DataFrame, d: DataFrame, groupCol: String): DataFrame = {
    // sums stay in the state's own exact type (decimal by contract);
    // the retract/add arithmetic must not silently widen it
    val totalT = state.schema("total").dataType.sql
    val s = state.alias("s")
    val del = d.alias("d")
    s.join(del, col(s"s.$groupCol") <=> col(s"d.$groupCol"), "full_outer")
      .select(
        coalesce(col(s"s.$groupCol"), col(s"d.$groupCol")).as(groupCol),
        (coalesce(col("s.cnt"), lit(0L)) +
          coalesce(col("d.d_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("s.total"), lit(0).cast(totalT)) +
          coalesce(col("d.d_total"), lit(0).cast(totalT)))
          .cast(totalT).as("total"))
      .filter(col("cnt") =!= 0)
  }

  /** Affected-group refresh for non-retractable aggregates (MIN/MAX):
    * recompute ONLY the groups named by the delta from the post-apply
    * table, keep every other stored row untouched. Cost ∝ rows of the
    * touched groups, not the table. */
  def refreshGroups(state: DataFrame, appliedTable: DataFrame,
                    touchedGroups: DataFrame, groupCol: String,
                    aggs: Seq[Column]): DataFrame = {
    val touched = touchedGroups.select(col(groupCol)).distinct()
    val recomputed = appliedTable
      .join(broadcast(touched), Seq(groupCol), "left_semi")
      .groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    state.join(broadcast(touched), Seq(groupCol), "left_anti")
      .unionByName(recomputed, allowMissingColumns = false)
  }
}
