package graft

import java.nio.file.Files

import graft.model.{SchemaRegistry, TableId, TableMeta}
import graft.sources.MemChangeSource
import graft.stream.{CdcStreamEngine, TableStore}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The source slot-in contract: `CdcStreamEngine.startSource` must run
  * the full decode→collapse→merge→atomic-commit loop on ANY
  * DataSourceV2 source carrying the ChangeRecord columns. The jsonl
  * spool source is one implementation; this spec drives the SAME
  * engine through a second, in-memory provider
  * ([[graft.sources.MemChangeSource]] — no files, no listing, no
  * pushdown), proving the engine binds to the row shape only. A Kafka
  * source is this contract with broker-held offsets.
  */
class SourceContractSpec extends SparkSpec {
  import spark.implicits._

  private val custSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_acctbal", DoubleType)))
  private val tid = TableId("srcdb", "public", "customer")

  private def rec(lsn: Long, payload: String): MemChangeSource.Rec = {
    val micros = (1700000000L + lsn) * 1000000L
    MemChangeSource.Rec(micros, "srcdb", lsn, lsn, payload, micros, "slot1")
  }

  private def freshEngine(): (CdcStreamEngine, TableStore, String) = {
    val root = Files.createTempDirectory("graft-memstore-").toString
    val ckpt = Files.createTempDirectory("graft-memckpt-").toString
    val registry = new SchemaRegistry
    registry.register(TableMeta(tid, custSchema, Seq("c_custkey")))
    val store = new TableStore(spark, root)
    store.stage(tid, Seq(
      (1L, "Alice", 10.0), (2L, "Bob", 20.0), (3L, "Carol", 30.0))
      .toDF("c_custkey", "c_name", "c_acctbal"), 0L)
    store.commit(Map(tid -> 0L))
    (new CdcStreamEngine(spark, registry, store), store, ckpt)
  }

  private def state(store: TableStore): Seq[Row] =
    store.read(tid).orderBy("c_custkey").collect().toSeq

  test("engine replays end-to-end through the in-memory provider and resumes exactly-once") {
    val (engine, store, ckpt) = freshEngine()
    val chan = s"contract-${System.nanoTime()}"
    try {
      MemChangeSource.feed(chan, Seq(
        rec(1L, """{"kind":"update","schema":"public","table":"customer",
          "columnnames":["c_custkey","c_acctbal"],"columnvalues":[1,15.0],
          "oldkeys":{"keynames":["c_custkey"],"keyvalues":[1]}}"""),
        rec(2L, """{"kind":"insert","schema":"public","table":"customer",
          "columnnames":["c_custkey","c_name","c_acctbal"],
          "columnvalues":[9,"Niner",5.0]}"""),
        rec(3L, """{"kind":"delete","schema":"public","table":"customer",
          "oldkeys":{"keynames":["c_custkey"],"keyvalues":[2]}}""")))
      val q1 = engine.startSource(MemChangeSource.FORMAT,
        Map("channel" -> chan), ckpt)
      q1.awaitTermination()
      assert(q1.exception.isEmpty, q1.exception.map(_.toString).getOrElse(""))
      assert(state(store) == Seq(
        Row(1L, "Alice", 15.0), Row(3L, "Carol", 30.0), Row(9L, "Niner", 5.0)))

      // resume from the source's checkpointed offset: only the NEW
      // batch applies — re-delivering batch 0 would re-insert key 2's
      // delete as a violation or double-apply the patch
      MemChangeSource.feed(chan, Seq(
        rec(4L, """{"kind":"update","schema":"public","table":"customer",
          "columnnames":["c_custkey","c_acctbal"],"columnvalues":[9,6.0],
          "oldkeys":{"keynames":["c_custkey"],"keyvalues":[9]}}""")))
      val q2 = engine.startSource(MemChangeSource.FORMAT,
        Map("channel" -> chan), ckpt)
      q2.awaitTermination()
      assert(q2.exception.isEmpty, q2.exception.map(_.toString).getOrElse(""))
      assert(state(store) == Seq(
        Row(1L, "Alice", 15.0), Row(3L, "Carol", 30.0), Row(9L, "Niner", 6.0)))
      // two published batches on top of the snapshot commit
      assert(store.manifest()(tid.qualified) == 2L)
    } finally MemChangeSource.clear(chan)
  }

  test("a source missing ChangeRecord columns is refused at start, not mid-batch") {
    val (engine, _, ckpt) = freshEngine()
    val e = intercept[IllegalArgumentException] {
      engine.startSource("rate", Map("rowsPerSecond" -> "1"), ckpt)
    }
    assert(e.getMessage.contains("ChangeRecord column"))
    assert(e.getMessage.contains("payload"))
  }
}
