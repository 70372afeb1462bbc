package graft.stream

import graft.decode.Wal2Json
import graft.model.ChangeRecord
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Offline quarantine repair/requeue — the engine analog of the
  * reference's manual-fix workflow (`replayer/connemara_fixer.pl`):
  * inspect the oldest failed records, repair their payloads, feed them
  * back through the replay. The TUI's interactive edit/apply loop
  * becomes a caller-supplied repair function; the queries it issues —
  * oldest failed record, 30 s repair horizon
  * (`replayer/connemara_fixer.pl:89-102`) — are [[oldestWindow]] and
  * the q8 oracle family.
  *
  * The quarantine dir is written by [[CdcStreamEngine.processBatch]]
  * (non-strict mode): raw spool rows that failed decode, partitioned
  * by the batch that dropped them. Requeued rows re-enter the parquet
  * spool as a fresh append, so the NEXT micro-batch replays them with
  * exactly-once semantics intact — no side door into the store.
  */
object Quarantine {

  /** Quarantine rows carry the spool schema plus the dropping batch. */
  val schema: StructType =
    StructType(ChangeRecord.schema.fields :+
      StructField("batch_id", LongType))

  /** Read the quarantine dir (explicit schema: a fully-drained
    * quarantine — or one not yet written — reads as empty, not as a
    * schema-inference error). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(schema).parquet(dir)

  /** The fixer's repair horizon (`connemara_fixer.pl:99-102`): only
    * records within `horizonSeconds` of the OLDEST failure — repair
    * proceeds oldest-first, preserving replay order. */
  def oldestWindow(quarantined: DataFrame, horizonSeconds: Int = 30): DataFrame = {
    val mn = quarantined.agg(min(col("insert_timestamp")).as("__mn"))
    quarantined.crossJoin(broadcast(mn))
      .filter(col("insert_timestamp") <=
        col("__mn") + expr(s"INTERVAL $horizonSeconds SECONDS"))
      .drop("__mn")
  }

  /** Repair and requeue: apply `repair` to every quarantined row,
    * split by the engine's own validity predicate
    * ([[Wal2Json.partitionValid]]), append the now-valid rows to the
    * parquet spool (the next micro-batch picks them up), and rewrite
    * the quarantine to hold only the still-bad rows — the
    * delete-on-success the fixer performs after a manual apply.
    *
    * @param repair spool-shaped rows in, spool-shaped rows out
    *               (typically a `withColumn("payload", …)` rewrite)
    * @return (requeued, stillBad) counts
    */
  def requeue(spark: SparkSession, quarantineDir: String, spoolDir: String,
              repair: DataFrame => DataFrame): (Long, Long) = {
    val spoolCols = ChangeRecord.schema.fieldNames.map(col).toSeq
    val q = read(spark, quarantineDir)
    val repaired = repair(q)
    val (valid, stillBad) = Wal2Json.partitionValid(Wal2Json.parse(repaired))

    val requeued = valid.select(spoolCols: _*)
    val nRequeued = requeued.count()
    if (nRequeued > 0)
      requeued.write.mode("append").parquet(spoolDir)

    // materialize the remainder BEFORE overwriting the dir it reads;
    // keep the engine's partitioned layout so later engine writes
    // (dynamic partition overwrite by batch_id) land consistently
    val keep = stillBad.drop("p").localCheckpoint(eager = true)
    val nStillBad = keep.count()
    keep.write.mode("overwrite").partitionBy("batch_id").parquet(quarantineDir)
    (nRequeued, nStillBad)
  }
}
