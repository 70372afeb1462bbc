package graft

import java.nio.file.Files

import graft.model.{SchemaRegistry, TableId, TableMeta}
import graft.sources.SpoolSource
import graft.stream.{CdcStreamEngine, TableStore}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataSourceV2 spool source: round-trip, filter pushdown reaching
  * the scan (plan-audited), filter-tables patterns, column pruning,
  * and the stream engine running end-to-end on the source.
  */
class SpoolSourceSpec extends SparkSpec {

  private val TS = 1700000000000000L // epoch micros

  private def rec(lsn: Long, payload: String, db: String = "srcdb") =
    (TS + lsn, db, lsn, lsn, payload, TS + lsn, "slot1")

  private def ins(table: String, key: Long, schema: String = "public") =
    s"""{"kind":"insert","schema":"$schema","table":"$table",
        "columnnames":["c_custkey","c_name","c_acctbal"],
        "columnvalues":[$key,"N$key",$key.5]}""".replaceAll("\n\\s*", "")

  private def load(dir: String, filterTables: Option[String] = None) = {
    val r = spark.read.format(SpoolSource.FORMAT).option("path", dir)
    filterTables.fold(r)(p => r.option("filterTables", p)).load()
  }

  test("batch round-trip with chg_schema/chg_table extraction") {
    val dir = Files.createTempDirectory("graft-dsv2-").toString
    SpoolSource.append(dir, "000001.jsonl", Seq(
      rec(1, ins("customer", 1)),
      rec(2, ins("orders", 7, schema = "sales"))))
    val rows = load(dir)
      .select("lsn_start", "database", "chg_schema", "chg_table", "source_slotname")
      .orderBy("lsn_start").collect().toSeq
    assert(rows == Seq(
      Row(1L, "srcdb", "public", "customer", "slot1"),
      Row(2L, "srcdb", "sales", "orders", "slot1")))
    // timestamps decode as micros
    val ts = load(dir).select("xid_timestamp").orderBy("lsn_start")
      .collect()(0).getTimestamp(0)
    assert(ts.getTime == (TS + 1) / 1000)
  }

  test("chg_schema/chg_table decode JSON escapes like from_json does") {
    // the extracted column must agree with the downstream from_json
    // value, or an exactly-pushed EqualTo on an escaped name silently
    // drops the row at the source with no second evaluation
    val dir = Files.createTempDirectory("graft-dsv2-esc-").toString
    SpoolSource.append(dir, "000001.jsonl", Seq(
      rec(1, """{"kind":"insert","schema":"a\"b","table":"x\\y","columnnames":["x"],"columnvalues":[1]}""")))
    val got = load(dir).select("chg_schema", "chg_table").collect()(0)
    assert(got.getString(0) == "a\"b", s"schema extracted: ${got.getString(0)}")
    assert(got.getString(1) == "x\\y", s"table extracted: ${got.getString(1)}")
  }

  test("catalyst filters on chg_table / lsn_start push into the scan") {
    val dir = Files.createTempDirectory("graft-dsv2-").toString
    SpoolSource.append(dir, "000001.jsonl", Seq(
      rec(1, ins("customer", 1)), rec(2, ins("orders", 2)),
      rec(3, ins("customer", 3)), rec(4, ins("customer", 4))))
    val df = load(dir)
      .filter(col("chg_table") === "customer" && col("lsn_start") > 1L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(chg_table,customer)"), plan)
    assert(plan.contains("GreaterThan(lsn_start,1)"), plan)
    assert(df.select("lsn_start").orderBy("lsn_start").collect().toSeq ==
      Seq(Row(3L), Row(4L)))
  }

  test("filterTables patterns drop non-matching changes at the source") {
    val dir = Files.createTempDirectory("graft-dsv2-").toString
    SpoolSource.append(dir, "000001.jsonl", Seq(
      rec(1, ins("customer", 1)),                    // public.customer
      rec(2, ins("orders", 2, schema = "sales")),    // sales.orders
      rec(3, ins("log_events", 3, schema = "audit")) // audit.log_events
    ))
    assert(load(dir, Some("public.*")).count() == 1)
    assert(load(dir, Some("public.*,audit.log_*")).count() == 2)
    assert(load(dir, Some("*.orders")).count() == 1)
    assert(load(dir, Some("nope.nothing")).count() == 0)
  }

  test("column pruning reaches the reader") {
    val dir = Files.createTempDirectory("graft-dsv2-").toString
    SpoolSource.append(dir, "000001.jsonl", Seq(rec(1, ins("customer", 1))))
    val df = load(dir).select("lsn_start", "database")
    assert(df.schema.fieldNames.toSeq == Seq("lsn_start", "database"))
    assert(df.collect().toSeq == Seq(Row(1L, "srcdb")))
  }

  test("AvailableNow drains all files under maxFilesPerTrigger admission control") {
    val dir = Files.createTempDirectory("graft-dsv2-").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    (1 to 3).foreach(i =>
      SpoolSource.append(dir, f"00000$i.jsonl", Seq(rec(i.toLong, ins("customer", i.toLong)))))
    val batches = scala.collection.mutable.Buffer.empty[Long]
    val q = spark.readStream.format(SpoolSource.FORMAT)
      .option("path", dir).option("maxFilesPerTrigger", 1).load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
        { batches += b.count(); () })
      .start()
    q.awaitTermination()
    assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    // one file per micro-batch, all three drained in one AvailableNow run
    assert(batches.toSeq == Seq(1L, 1L, 1L))
  }

  test("stream engine replays from the DSv2 source with pushdown, resumes exactly-once") {
    val custSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType)))
    val tid = TableId("srcdb", "public", "customer")
    val root = Files.createTempDirectory("graft-store-").toString
    val spool = Files.createTempDirectory("graft-spool-").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    val registry = new SchemaRegistry
    registry.register(TableMeta(tid, custSchema, Seq("c_custkey")))
    val store = new TableStore(spark, root)
    import spark.implicits._
    store.stage(tid, Seq((1L, "Alice", 10.0), (2L, "Bob", 20.0))
      .toDF("c_custkey", "c_name", "c_acctbal"), 0L)
    store.commit(Map(tid -> 0L))
    val engine = new CdcStreamEngine(spark, registry, store)

    def run(): Unit = {
      val q = engine.startSpool(spool, ckpt, filterTables = Some("public.*"))
      q.awaitTermination()
      assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
    }
    def state(): Seq[Row] = store.read(tid).orderBy("c_custkey").collect().toSeq

    SpoolSource.append(spool, "000001.jsonl", Seq(
      rec(1, """{"kind":"update","schema":"public","table":"customer","columnnames":["c_custkey","c_acctbal"],"columnvalues":[1,11.5],"oldkeys":{"keynames":["c_custkey"],"keyvalues":[1]}}"""),
      // a foreign-schema change the filter-tables pushdown must drop
      rec(2, """{"kind":"insert","schema":"sales","table":"orders","columnnames":["c_custkey"],"columnvalues":[99]}""")))
    run()
    assert(state() == Seq(Row(1L, "Alice", 11.5), Row(2L, "Bob", 20.0)))

    // second file; checkpoint resume must not re-read file 1
    SpoolSource.append(spool, "000002.jsonl", Seq(
      rec(3, """{"kind":"insert","schema":"public","table":"customer","columnnames":["c_custkey","c_name","c_acctbal"],"columnvalues":[9,"Zed",90.0]}""")))
    run()
    assert(state() == Seq(
      Row(1L, "Alice", 11.5), Row(2L, "Bob", 20.0), Row(9L, "Zed", 90.0)))

    // idle re-run: no change
    run()
    assert(state() == Seq(
      Row(1L, "Alice", 11.5), Row(2L, "Bob", 20.0), Row(9L, "Zed", 90.0)))
  }
}
