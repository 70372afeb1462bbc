package graft.stream

import graft.apply.ApplyEngine
import graft.decode.Wal2Json
import graft.model.{ChangeRecord, SchemaRegistry, TableId}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming CDC replay (SURVEY §2.8): spool file source →
  * per-micro-batch decode/collapse/merge per table → atomic
  * cross-table commit via [[TableStore]].
  *
  * Reference-semantics mapping:
  *  - spool scan in `(insert_timestamp, lsn_start)` order (S3) —
  *    order is irrelevant *across* keys under batch collapse; within
  *    key, [[ApplyEngine.collapse]] sorts by the same clock.
  *  - 30 s event-time commit cadence (A2) ≈ micro-batch boundary; the
  *    manifest is the all-tables-commit-together barrier (A3).
  *  - exactly-once (A6): checkpoint stores source offsets; version
  *    dirs keyed by batchId make replayed batches idempotent.
  *  - DDL barrier (A8): DDL records are routed to `ddlHandler`
  *    BEFORE the batch's DML merge, then the registry-backed plans
  *    rebuild — the `DISCARD`/cache-invalidation analog.
  *  - backpressure (A10): `maxFilesPerTrigger`.
  *  - fail-fast (A9): `strict=true` counts merge violations and
  *    aborts the query (affected-rows==1 parity).
  */
final class CdcStreamEngine(
    spark: SparkSession,
    registry: SchemaRegistry,
    store: TableStore,
    ddlHandler: graft.ddl.DdlEvent => Unit = _ => (),
    strict: Boolean = false,
    archiveDir: Option[String] = None,
    tableParallelism: Int = 4) {

  /** One micro-batch: the replay loop body. Public for batch-mode
    * reuse and direct testing.
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val parsed = Wal2Json.parse(batch).cache()
    try {
      // P7: DDL routing predicate splits the stream.
      val isDdl = col("p.schema") === "public" &&
        col("p.table") === "sql_ddl_statements"

      // A8: DDL first, under the batch barrier, in stream order.
      parsed.filter(isDdl)
        .orderBy(col("insert_timestamp"), col("lsn_start"))
        .select(col("database"),
          map_from_arrays(col("p.columnnames"), col("p.columnvalues")).as("m"))
        .collect()
        .foreach { r =>
          val m = r.getMap[String, String](1)
          ddlHandler(graft.ddl.DdlInterpreter.eventFrom(
            r.getString(0),
            Map.empty[String, String] ++ m.toMap.collect {
              case (k, v) if v != null => k -> v
            }))
        }

      val dml = parsed.filter(!isDdl)
      val touched = dml
        .select(col("database").as("d"), col("p.schema").as("s"), col("p.table").as("t"))
        .filter(!col("t").startsWith("pg_temp")) // P6
        .distinct().collect()
        .map(r => TableId(r.getString(0), r.getString(1), r.getString(2)))

      // Batch N publishes version N+1 (v=0 is the initial snapshot).
      // A table already at version ≥ N+1 was committed by a previous
      // attempt of this same batch (crash between manifest commit and
      // checkpoint commit) — skip it, or the replay would double-apply.
      val targetVersion = batchId + 1
      val committed = store.manifest()
      val work = touched.flatMap { tid =>
        registry.get(tid)
          .filter(meta => committed.get(meta.id.qualified).forall(_ < targetVersion))
      }

      // Per-table apply jobs run concurrently from the driver — the
      // nb_threads worker pool of the reference (`replayer/
      // connemara_replay.pl:764-777`), as concurrent Spark jobs.
      // Stage dirs are disjoint per table; the manifest commit below
      // is the only shared write and happens once, after the barrier.
      val updates: Map[graft.model.TableId, Long] =
        if (work.length <= 1) {
          work.map(applyOneTable(_, dml, batchId, targetVersion)).toMap
        } else {
          import scala.concurrent.{Await, ExecutionContext, Future}
          import scala.concurrent.duration.Duration
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(work.length, tableParallelism))
          implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
          try Await.result(
            Future.sequence(work.toSeq.map(meta =>
              Future(applyOneTable(meta, dml, batchId, targetVersion)))),
            Duration.Inf).toMap
          finally pool.shutdown()
        }

      // A2/A3: one atomic cross-table commit per batch.
      if (updates.nonEmpty) store.commit(updates)
      ()

      // K5 --keep_data / E4 archive CTE analog: applied spool records
      // move to the audit table instead of vanishing. Partitioned by
      // batch so a replayed batch overwrites its own partition
      // (idempotent), mirroring `WITH deleted AS (DELETE … RETURNING *)
      // INSERT INTO replication.replayed` (`replayer/connemara_replay.pl:521-526`).
      archiveDir.foreach { dir =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(dir)
      }
    } finally parsed.unpersist()
  }

  private def applyOneTable(meta: graft.model.TableMeta, dml: DataFrame,
                            batchId: Long, targetVersion: Long): (TableId, Long) = {
    val events = Wal2Json.decodeEvents(dml, meta)
    val collapsed = ApplyEngine.collapse(events)
    if (strict) {
      val nViol = ApplyEngine.violations(store.read(meta.id), collapsed, meta).count()
      if (nViol > 0) throw new IllegalStateException(
        s"batch $batchId: $nViol apply violations on ${meta.id.qualified}")
    }
    val merged = ApplyEngine.merge(store.read(meta.id), collapsed, meta)
    store.stage(meta.id, merged, targetVersion)
    meta.id -> targetVersion
  }

  /** Start the streaming replay over a spool directory. */
  def start(spoolDir: String, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Int = 1000): StreamingQuery =
    spark.readStream
      .schema(ChangeRecord.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(spoolDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, batchId: Long) => processBatch(batch, batchId))
      .start()
}

object CdcStreamEngine {
  /** Engine with the full in-stream DDL interpreter wired in (A8). */
  def withDdl(spark: SparkSession, registry: SchemaRegistry, store: TableStore,
              ignoredSchemas: Set[String] = Set.empty,
              md5Whitelist: Set[String] = Set.empty,
              strict: Boolean = false): CdcStreamEngine = {
    val interp = new graft.ddl.DdlInterpreter(
      spark, registry, store, ignoredSchemas, md5Whitelist)
    new CdcStreamEngine(spark, registry, store, interp.execute, strict)
  }
}
