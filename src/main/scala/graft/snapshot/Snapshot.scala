package graft.snapshot

import java.nio.file.{Files, Paths}

import graft.model.{SchemaRegistry, TableId, TableMeta}
import graft.stream.TableStore
import graft.types.LsnCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The "logical basebackup" analog (SURVEY §3.3,
  * `connemara_python/bin/connemara_basebackup.py:97-191`): one
  * consistent source snapshot, schema translation, parallel
  * partitioned copy, deferred validation, and the snapshot↔LSN
  * pinning that hands off to the change stream.
  *
  * Spark mapping: the pinned MVCC snapshot is an immutable source
  * directory; the P-way `ctid % P` copy
  * (`connemara_python/connemara/restore.py:13-28`) becomes
  * `repartition(P, pk)` — which also pre-clusters each table by its
  * merge key, the layout the CDC apply path wants; constraints
  * become validation queries (Spark enforces none — K7 parity note).
  */
object Snapshot {

  final case class TableSpec(id: TableId, pkCols: Seq[String], sourcePath: String)
  final case class TableReport(id: TableId, rows: Long, version: Long)
  final case class Report(tables: Seq[TableReport], startLsn: Long)

  /** Copy every table of one pinned snapshot into the store as
    * version 0 and record the consistent-point LSN the stream must
    * resume from (`CREATE_REPLICATION_SLOT … consistent_point`,
    * `connemara_python/connemara/schema_dump.py:31-37`).
    */
  def basebackup(
      spark: SparkSession,
      specs: Seq[TableSpec],
      registry: SchemaRegistry,
      store: TableStore,
      storeRoot: String,
      startLsn: Long,
      njobs: Int = 8,
      validatePk: Boolean = false,
      buckets: Option[Int] = None): Report = {
    // validate every table BEFORE staging any: all-or-nothing, no
    // orphan version dirs or polluted registry on a late failure.
    // A CDC target MUST be key-unique — duplicate keys make the keyed
    // merge fan out silently (the batch analog of the reference's
    // affected-rows==1 dying, replay.pl:417-421).
    // refuse to re-seed a table CDC has already advanced: the
    // monotonic manifest would keep serving the old version while
    // this snapshot's report claims the new rows were published
    specs.foreach { spec =>
      store.manifest().get(spec.id.qualified).filter(_ > 0L).foreach { v =>
        throw new IllegalStateException(
          s"table ${spec.id.qualified} is already at version $v; " +
            "drop it (and vacuum) before re-running the initial snapshot")
      }
    }
    // one source DataFrame per spec, reused by validation, meta
    // build, and staging — re-opening the parquet repeats footer
    // listing/schema inference per open
    val sources = specs.map(spec => spec -> spark.read.parquet(spec.sourcePath)).toMap
    if (validatePk) specs.foreach { spec =>
      require(spec.pkCols.nonEmpty,
        s"table ${spec.id.qualified}: no primary key declared")
      val dups = validatePrimaryKey(sources(spec), spec.pkCols).limit(1).count()
      if (dups > 0) throw new IllegalStateException(
        s"table ${spec.id.qualified}: PK ${spec.pkCols.mkString(",")} not unique")
    }
    // build ALL metas up front (source reads may fail — registry must
    // stay clean if any does), stage everything, and only then
    // register + commit: a mid-loop failure leaves no registered-but-
    // uncommitted tables behind.
    val metas = specs.map { spec =>
      spec -> TableMeta(spec.id, sources(spec).schema, spec.pkCols)
    }
    // Stage tables CONCURRENTLY — the analog of the reference's
    // 8-process restore pool (`pool(njobs=8)` over tables,
    // `connemara_python/connemara/restore.py:42-54`). Spark job
    // submission is thread-safe; each table's write+count is small
    // relative to scheduler latency, so overlapping them matters even
    // more than intra-table parallelism on a busy cluster.
    val reports = {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val fs = metas.map { case (spec, _) => Future {
        // `buckets` seeds the PK-bucketed layout: the snapshot is the
        // one full write a bucketed table ever pays; every CDC batch
        // after it rewrites only touched buckets (BucketedPublish)
        buckets match {
          case Some(n) =>
            store.stageBucketed(spec.id, sources(spec), 0L,
              TableStore.BucketSpec(n, spec.pkCols))
          case None =>
            val clustered = sources(spec).repartition(njobs, spec.pkCols.map(col): _*)
            store.stage(spec.id, clustered, 0L)
        }
        TableReport(spec.id, store.readVersion(spec.id, 0L).count(), 0L)
      }}
      Await.result(Future.sequence(fs), Duration.Inf)
    }
    metas.foreach { case (_, meta) => registry.register(meta) }
    // all tables commit together: one consistent snapshot cut
    store.commit(specs.map(_.id -> 0L).toMap)
    Files.writeString(Paths.get(storeRoot, "_start_lsn"), LsnCodec.format(startLsn))
    Report(reports, startLsn)
  }

  def readStartLsn(storeRoot: String): Option[Long] = {
    val p = Paths.get(storeRoot, "_start_lsn")
    if (Files.exists(p)) Some(LsnCodec.parse(Files.readString(p).trim)) else None
  }

  /** Post-data PK validation (K7: "PK/unique enforcement becomes a
    * validation query"): key tuples appearing more than once. */
  def validatePrimaryKey(df: DataFrame, pkCols: Seq[String]): DataFrame =
    df.groupBy(pkCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** FK orphan check (P11's kept FOREIGN KEY constraints): child key
    * tuples with no matching parent. */
  def validateForeignKey(child: DataFrame, childCols: Seq[String],
                         parent: DataFrame, parentCols: Seq[String]): DataFrame = {
    val parentKeys = parent
      .select(parentCols.zip(childCols).map { case (p, c) => col(p).as(c) }: _*)
      .distinct()
    child
      .filter(childCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(childCols.map(col): _*)
      .agg(count(lit(1)).as("n_orphan_rows"))
      .join(parentKeys, childCols, "left_anti")
  }
}
