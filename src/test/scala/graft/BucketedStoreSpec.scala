package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.apply.ApplyEngine
import graft.model.{SchemaRegistry, TableId, TableMeta}
import graft.stream.{BucketedPublish, CdcStreamEngine, TableStore}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PK-bucketed incremental publish: a batch rewrites ONLY the buckets
  * its keys hash into; everything else is carried by bucketmap
  * reference. The scale property under test is physical — we count
  * the bucket dirs a version actually wrote.
  */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  private val tid = TableId("srcdb", "public", "t")
  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", StringType)))
  private def meta = TableMeta(tid, schema, Seq("k"))
  private val spec = TableStore.BucketSpec(8, Seq("k"))

  private def fresh(): (TableStore, String) = {
    val root = Files.createTempDirectory("graft-bstore-").toString
    (new TableStore(spark, root), root)
  }

  private def seed(store: TableStore, n: Int = 100): Unit = {
    val df = (1 to n).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    store.stageBucketed(tid, df, 0L, spec)
    store.commit(Map(tid -> 0L))
  }

  /** __gb= dirs physically present under one version dir. */
  private def bucketsWritten(root: String, version: Long): Set[Int] = {
    val vd = Paths.get(root, tid.qualified, s"v=$version")
    val s = Files.list(vd)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith("__gb="))
      .map(_.stripPrefix("__gb=").toInt).toSet
    finally s.close()
  }

  private def collapsedOf(rows: (String, Long, Map[String, String])*): DataFrame =
    rows.toSeq
      .map { case (st, k, vals) => (Seq(k.toString), st, vals, 0) }
      .toDF("key", "st", "vals", "viol")

  test("full stage + read-back round-trips through the bucketmap") {
    val (store, _) = fresh()
    seed(store)
    assert(store.bucketSpec(tid).contains(spec))
    assert(store.read(tid).orderBy("k").collect().toSeq ==
      (1 to 100).map(i => Row(i.toLong, s"v$i")))
  }

  test("a 1-key batch rewrites exactly 1 bucket") {
    val (store, root) = fresh()
    seed(store)
    val changed = BucketedPublish.stageDelta(store, meta, spec,
      collapsedOf(("patch", 7L, Map("v" -> "PATCHED"))), 1L, 0L)
    store.commit(Map(tid -> 1L))
    assert(changed.size == 1)
    assert(bucketsWritten(root, 1L) == changed)
    val got = store.read(tid).orderBy("k").collect().toSeq
    assert(got == (1 to 100).map(i =>
      Row(i.toLong, if (i == 7) "PATCHED" else s"v$i")))
  }

  test("delta insert/delete/replace merge matches the full-table merge") {
    val (store, _) = fresh()
    seed(store)
    val collapsed = collapsedOf(
      ("row", 3L, Map("k" -> "3", "v" -> "REPLACED")),
      ("row", 1000L, Map("k" -> "1000", "v" -> "NEW")),
      ("del", 5L, Map.empty),
      ("patch", 42L, Map("v" -> "P42")))
    val expected = ApplyEngine.merge(
      store.readVersion(tid, 0L), collapsed, meta)
      .orderBy("k").collect().toSeq
    BucketedPublish.stageDelta(store, meta, spec, collapsed, 1L, 0L)
    store.commit(Map(tid -> 1L))
    assert(store.read(tid).orderBy("k").collect().toSeq == expected)
  }

  test("chained deltas resolve each bucket at its latest writing version") {
    val (store, _) = fresh()
    seed(store, n = 20)
    BucketedPublish.stageDelta(store, meta, spec,
      collapsedOf(("patch", 1L, Map("v" -> "A"))), 1L, 0L)
    store.commit(Map(tid -> 1L))
    BucketedPublish.stageDelta(store, meta, spec,
      collapsedOf(("patch", 2L, Map("v" -> "B"))), 2L, 1L)
    store.commit(Map(tid -> 2L))
    val got = store.read(tid).orderBy("k").collect().toSeq
    assert(got == (1 to 20).map(i => Row(i.toLong,
      if (i == 1) "A" else if (i == 2) "B" else s"v$i")))
  }

  test("replaying the same delta version is idempotent") {
    val (store, _) = fresh()
    seed(store, n = 10)
    val collapsed = collapsedOf(("patch", 4L, Map("v" -> "X")))
    BucketedPublish.stageDelta(store, meta, spec, collapsed, 1L, 0L)
    BucketedPublish.stageDelta(store, meta, spec, collapsed, 1L, 0L)
    store.commit(Map(tid -> 1L))
    assert(store.read(tid).filter($"k" === 4L).collect().toSeq ==
      Seq(Row(4L, "X")))
    assert(store.read(tid).count() == 10)
  }

  test("empty staged version (all buckets empty) reads back via the schema sidecar") {
    val (store, _) = fresh()
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    store.stageBucketed(tid, empty, 0L, spec)
    store.commit(Map(tid -> 0L))
    assert(store.read(tid).count() == 0)
    assert(store.read(tid).schema.fieldNames.toSeq == Seq("k", "v"))
  }

  test("vacuum keeps version dirs the committed bucketmap references") {
    val (store, root) = fresh()
    seed(store, n = 50)
    BucketedPublish.stageDelta(store, meta, spec,
      collapsedOf(("patch", 1L, Map("v" -> "A"))), 1L, 0L)
    store.commit(Map(tid -> 1L))
    BucketedPublish.stageDelta(store, meta, spec,
      collapsedOf(("patch", 2L, Map("v" -> "B"))), 2L, 1L)
    store.commit(Map(tid -> 2L))
    // v0 (most buckets) and v1 are still referenced by v2's bucketmap
    assert(store.vacuum(keepHistory = 0) == 0)
    assert(Files.exists(Paths.get(root, tid.qualified, "v=0")))
    val got = store.read(tid).orderBy("k").collect().toSeq
    assert(got == (1 to 50).map(i => Row(i.toLong,
      if (i == 1) "A" else if (i == 2) "B" else s"v$i")))
    // a full rewrite drops every old reference — now vacuum reclaims
    store.stageBucketed(tid, store.read(tid), 3L, spec)
    store.commit(Map(tid -> 3L))
    assert(store.vacuum(keepHistory = 0) == 3)
    assert(!Files.exists(Paths.get(root, tid.qualified, "v=0")))
    assert(store.read(tid).orderBy("k").collect().toSeq == got)
  }

  test("engine DML batch over a bucketed table stages only touched buckets") {
    val root = Files.createTempDirectory("graft-bstore-").toString
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType)))
    val ctid = TableId("srcdb", "public", "customer")
    val registry = new SchemaRegistry
    registry.register(TableMeta(ctid, custSchema, Seq("c_custkey")))
    val store = new TableStore(spark, root)
    val cspec = TableStore.BucketSpec(8, Seq("c_custkey"))
    store.stageBucketed(ctid,
      (1 to 64).map(i => (i.toLong, s"N$i", i * 1.0))
        .toDF("c_custkey", "c_name", "c_acctbal"), 0L, cspec)
    store.commit(Map(ctid -> 0L))
    val engine = new CdcStreamEngine(spark, registry, store)

    val batch = Seq(
      (1L, """{"kind":"update","schema":"public","table":"customer",
        "columnnames":["c_custkey","c_acctbal"],"columnvalues":[5,99.0],
        "oldkeys":{"keynames":["c_custkey"],"keyvalues":[5]}}"""),
      (2L, """{"kind":"delete","schema":"public","table":"customer",
        "oldkeys":{"keynames":["c_custkey"],"keyvalues":[6]}}"""))
      .toDF("lsn_start", "payload")
      .withColumn("insert_timestamp",
        timestamp_seconds(lit(1700000000L) + col("lsn_start")))
      .withColumn("database", lit("srcdb"))
      .withColumn("xid", col("lsn_start"))
      .withColumn("xid_timestamp", col("insert_timestamp"))
      .withColumn("source_slotname", lit("slot1"))
    engine.processBatch(batch, 0L)

    // version 1 wrote only the buckets keys 5 and 6 hash into
    val vd = Paths.get(root, ctid.qualified, "v=1")
    val s = Files.list(vd)
    val written =
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("__gb=")).toSet
      finally s.close()
    assert(written.size <= 2 && written.nonEmpty)
    val got = store.read(ctid).orderBy("c_custkey").collect().toSeq
    assert(got.length == 63)
    assert(got.find(_.getLong(0) == 5L).get.getDouble(2) == 99.0)
    assert(!got.exists(_.getLong(0) == 6L))
  }

  test("concurrent commits from SEPARATE store instances lose no entry") {
    // the manifest update is a read-modify-write of the FULL map; two
    // TableStore instances on one root (the two-engines case) must
    // serialize through the per-root monitor + _latest.lock, or an
    // interleaved parse->render->rename silently drops entries while
    // seq still advances
    val root = Files.createTempDirectory("graft-race-").toString
    val df = Seq((1L, "v")).toDF("k", "v")
    val ids = (0 until 8).map(i => TableId("srcdb", "public", s"race$i"))
    ids.foreach(id => new TableStore(spark, root).stage(id, df, 0L))
    val threads = ids.map { id =>
      val st = new TableStore(spark, root) // one instance per "engine"
      new Thread(() => st.commit(Map(id -> 0L)))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val m = new TableStore(spark, root).manifest()
    assert(ids.forall(id => m.get(id.qualified).contains(0L)),
      s"lost entries: ${ids.map(_.qualified).filterNot(m.contains)}")
  }
}
