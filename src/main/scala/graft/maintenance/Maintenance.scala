package graft.maintenance

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's catalog-introspection / maintenance queries
  * (SURVEY §2.4 J3–J6, §2.5 G2, §2.6 W1), over DataFrames shaped like
  * the PG catalogs (FIXTURES.md §5). Pure DataFrame logic — works on
  * fixtures in tests and on real catalog extracts in production.
  */
object Maintenance {

  /** J3: PK columns per constraint — `unnest(conkey)` joined to
    * `pg_attribute` on `(conrelid=attrelid, unnest=attnum)`, ordered
    * by position (`replayer/connemara_replay.pl:461-466`).
    * W1: `WITH ORDINALITY` ≡ `posexplode` (+1 for 1-based).
    */
  def pkColumns(pgConstraint: DataFrame, pgAttribute: DataFrame): DataFrame =
    pgConstraint
      .filter(col("contype") === "p")
      .select(
        col("conname"), col("conrelid"),
        posexplode(col("conkey")).as(Seq("pos", "attkey")))
      .withColumn("ordinality", col("pos") + 1)
      .join(
        pgAttribute,
        col("conrelid") === pgAttribute("attrelid") &&
          col("attkey") === pgAttribute("attnum"))
      .select(col("conname"), col("conrelid"), col("ordinality"), col("attname"))
      .orderBy(col("conrelid"), col("conname"), col("ordinality"))

  private def prefix(indkey: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
    slice(indkey, lit(1), n)

  /** J4 + E2: FK constraints with no valid index whose leading
    * `size(conkey)` columns are set-equal to `conkey` — the two-way
    * array containment `@> AND <@` of `replayer/connemara_reindex.sh:35-45`,
    * as a left-anti join with `array_except` both ways.
    */
  def fkMissingIndex(pgConstraint: DataFrame, pgIndex: DataFrame): DataFrame = {
    val fks = pgConstraint.filter(col("contype") === "f")
    val idx = pgIndex.filter(col("indisvalid"))
    val pref = prefix(idx("indkey"), size(fks("conkey")))
    val cond = fks("conrelid") === idx("indrelid") &&
      size(array_except(pref, fks("conkey"))) === 0 &&
      size(array_except(fks("conkey"), pref)) === 0
    fks.join(idx, cond, "left_anti")
      .select(col("conname"), col("conrelid"))
      .orderBy(col("conrelid"), col("conname"))
  }

  /** J5 + G2: CREATE INDEX column lists for uncovered FKs —
    * `unnest WITH ORDINALITY` joined to `pg_attribute`, then
    * `string_agg(attname, ',' ORDER BY ordinality)`
    * (`replayer/connemara_reindex.sh:46-56`). Within-group ordering =
    * sort-by-struct then `transform`, all codegen'd built-ins.
    */
  def fkIndexColumnLists(pgConstraint: DataFrame, pgIndex: DataFrame,
                         pgAttribute: DataFrame): DataFrame =
    fkMissingIndex(pgConstraint, pgIndex)
      .join(pgConstraint.select(col("conname"), col("conkey")), Seq("conname"))
      .select(
        col("conname"), col("conrelid"),
        posexplode(col("conkey")).as(Seq("pos", "attkey")))
      .join(
        pgAttribute,
        col("conrelid") === pgAttribute("attrelid") &&
          col("attkey") === pgAttribute("attnum"))
      .groupBy(col("conname"), col("conrelid"))
      .agg(concat_ws(",",
        transform(
          array_sort(collect_list(struct(col("pos"), col("attname")))),
          _.getField("attname"))).as("index_cols"))
      .orderBy(col("conrelid"), col("conname"))

  /** J6: invalid indexes nobody holds a lock on — drop candidates
    * (`replayer/connemara_reindex.sh:14-18`). */
  def invalidUnlockedIndexes(pgIndex: DataFrame, pgLocks: DataFrame): DataFrame =
    pgIndex
      .filter(!col("indisvalid"))
      .join(pgLocks, pgIndex("indexrelid") === pgLocks("relation"), "left_anti")
      .select(col("indexrelid"), col("indrelid"))
      .orderBy(col("indexrelid"))

  /** S9/G1: unique-index count per table — `>1` means non-PK unique
    * constraints exist, which coarsens dispatch granularity
    * (`replayer/connemara_replay.pl:469-479,104-127`). */
  def uniqueIndexCounts(pgIndex: DataFrame): DataFrame =
    pgIndex
      .filter(col("indisunique"))
      .groupBy(col("indrelid"))
      .agg(count(lit(1)).as("n_unique"))
      .withColumn("has_other_uniques", col("n_unique") > 1)
      .orderBy(col("indrelid"))

  /** S10/G4: DISTINCT extension-owned objects from `pg_depend`
    * (`connemara_python/connemara/schema_dump.py:41-60`). */
  def extensionObjects(pgDepend: DataFrame): DataFrame =
    pgDepend
      .filter(col("deptype") === "e" && col("classid") === "pg_proc")
      .select(col("objid_regproc"))
      .distinct()
      .orderBy(col("objid_regproc"))
}
