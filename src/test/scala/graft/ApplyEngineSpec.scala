package graft

import graft.apply.ApplyEngine
import graft.decode.Wal2Json
import graft.model.{TableId, TableMeta}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decode+apply semantics on the FIXTURES.md §2 payloads — verbatim,
  * including unquoted JSON numbers (wal2json emits numbers untyped;
  * the decoder must coerce them to text like PG's `#>>`).
  */
class ApplyEngineSpec extends SparkSpec {
  import spark.implicits._

  private val custSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))
  private val meta = TableMeta(
    TableId("srcdb", "public", "customer"), custSchema, Seq("c_custkey"))

  private def spool(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("lsn_start", "payload")
      .withColumn("xid_timestamp", timestamp_seconds(lit(1700000000L)))

  private def target(rows: (Long, String, Double, String)*): DataFrame =
    rows.toSeq.toDF("c_custkey", "c_name", "c_acctbal", "c_mktsegment")

  private def applied(t: DataFrame, s: DataFrame): Seq[Row] =
    ApplyEngine.applyChanges(t, Wal2Json.decodeEvents(Wal2Json.parse(s), meta), meta)
      .orderBy("c_custkey").collect().toSeq

  test("insert with unquoted JSON numbers (FIXTURES §2)") {
    val s = spool((1L,
      """{"kind":"insert","schema":"public","table":"customer",
         "columnnames":["c_custkey","c_name","c_acctbal","c_mktsegment"],
         "columnvalues":[42,"Customer#42",711.56,"BUILDING"]}"""))
    assert(applied(target(), s) ==
      Seq(Row(42L, "Customer#42", 711.56, "BUILDING")))
  }

  test("partial update leaves omitted (TOAST) columns intact") {
    val s = spool((1L,
      """{"kind":"update","schema":"public","table":"customer",
         "columnnames":["c_custkey","c_acctbal"],
         "columnvalues":[42,"99.99"],
         "oldkeys":{"keynames":["c_custkey"],"keyvalues":[42]}}"""))
    assert(applied(target((42L, "Customer#42", 711.56, "BUILDING")), s) ==
      Seq(Row(42L, "Customer#42", 99.99, "BUILDING")))
  }

  test("update can set a column to explicit NULL (key present, value null)") {
    val s = spool((1L,
      """{"kind":"update","schema":"public","table":"customer",
         "columnnames":["c_custkey","c_mktsegment"],
         "columnvalues":[42,null],
         "oldkeys":{"keynames":["c_custkey"],"keyvalues":[42]}}"""))
    assert(applied(target((42L, "Customer#42", 711.56, "BUILDING")), s) ==
      Seq(Row(42L, "Customer#42", 711.56, null)))
  }

  test("PK-change update becomes delete(old)+insert(new) (FIXTURES §2)") {
    val s = spool((1L,
      """{"kind":"update","schema":"public","table":"customer",
         "columnnames":["c_custkey","c_name","c_acctbal","c_mktsegment"],
         "columnvalues":[43,"Customer#43",1.25,"AUTO"],
         "oldkeys":{"keynames":["c_custkey"],"keyvalues":[42]}}"""))
    assert(applied(target((42L, "Customer#42", 711.56, "BUILDING")), s) ==
      Seq(Row(43L, "Customer#43", 1.25, "AUTO")))
  }

  test("delete removes the row; unrelated rows survive") {
    val s = spool((1L,
      """{"kind":"delete","schema":"public","table":"customer",
         "oldkeys":{"keynames":["c_custkey"],"keyvalues":[42]}}"""))
    assert(applied(target(
      (42L, "Customer#42", 711.56, "BUILDING"),
      (7L, "Customer#7", 0.0, "AUTO")), s) ==
      Seq(Row(7L, "Customer#7", 0.0, "AUTO")))
  }

  test("in-batch chain: insert → patch → delete → insert resurrects") {
    val s = spool(
      (1L, """{"kind":"insert","schema":"public","table":"customer",
         "columnnames":["c_custkey","c_name","c_acctbal","c_mktsegment"],
         "columnvalues":[5,"A",1.0,"X"]}"""),
      (2L, """{"kind":"update","schema":"public","table":"customer",
         "columnnames":["c_custkey","c_acctbal"],"columnvalues":[5,2.0],
         "oldkeys":{"keynames":["c_custkey"],"keyvalues":[5]}}"""),
      (3L, """{"kind":"delete","schema":"public","table":"customer",
         "oldkeys":{"keynames":["c_custkey"],"keyvalues":[5]}}"""),
      (4L, """{"kind":"insert","schema":"public","table":"customer",
         "columnnames":["c_custkey","c_name","c_acctbal","c_mktsegment"],
         "columnvalues":[5,"B",9.0,"Y"]}"""))
    assert(applied(target(), s) == Seq(Row(5L, "B", 9.0, "Y")))
  }

  test("insert missing a column yields NULL, not a stale target value") {
    val s = spool(
      (1L, """{"kind":"delete","schema":"public","table":"customer",
         "oldkeys":{"keynames":["c_custkey"],"keyvalues":[9]}}"""),
      (2L, """{"kind":"insert","schema":"public","table":"customer",
         "columnnames":["c_custkey","c_name"],"columnvalues":[9,"Fresh"]}"""))
    assert(applied(target((9L, "Old", 5.0, "SEG")), s) ==
      Seq(Row(9L, "Fresh", null, null)))
  }

  test("violations: patch without target row, patch after delete") {
    val s = spool(
      (1L, """{"kind":"update","schema":"public","table":"customer",
         "columnnames":["c_custkey","c_acctbal"],"columnvalues":[404,1.0],
         "oldkeys":{"keynames":["c_custkey"],"keyvalues":[404]}}"""),
      (2L, """{"kind":"delete","schema":"public","table":"customer",
         "oldkeys":{"keynames":["c_custkey"],"keyvalues":[42]}}"""),
      (3L, """{"kind":"update","schema":"public","table":"customer",
         "columnnames":["c_custkey","c_acctbal"],"columnvalues":[42,1.0],
         "oldkeys":{"keynames":["c_custkey"],"keyvalues":[42]}}"""))
    val collapsed = ApplyEngine.collapse(
      Wal2Json.decodeEvents(Wal2Json.parse(s), meta))
    val v = ApplyEngine.violations(
      target((42L, "Customer#42", 711.56, "BUILDING")), collapsed, meta)
      .select("violation").as[String].collect().sorted.toSeq
    assert(v == Seq("patch_after_delete", "patch_without_target"))
  }

  test("envelope source decodes end-to-end with intra-txn ordering") {
    val env = Seq(
      """{"xid":100,"timestamp":"2021-01-01 00:00:00+00","change":[
         {"kind":"insert","schema":"public","table":"customer",
          "columnnames":["c_custkey","c_name","c_acctbal","c_mktsegment"],
          "columnvalues":[1,"A",1.0,"X"]},
         {"kind":"update","schema":"public","table":"customer",
          "columnnames":["c_custkey","c_acctbal"],"columnvalues":[1,2.5],
          "oldkeys":{"keynames":["c_custkey"],"keyvalues":[1]}}]}""")
      .toDF("value")
    val exploded = Wal2Json.explodeEnvelope(env)
    val out = ApplyEngine.applyChanges(
      target(), Wal2Json.decodeEvents(exploded, meta), meta).collect().toSeq
    // insert then same-transaction update: order preserved via the
    // synthetic xid<<20|chg_idx lsn
    assert(out == Seq(Row(1L, "A", 2.5, "X")))
  }

  test("reserved-looking column names (st, vals) don't break the merge") {
    val schema2 = StructType(Seq(
      StructField("id", LongType),
      StructField("st", StringType),
      StructField("vals", StringType)))
    val m2 = TableMeta(TableId("srcdb", "public", "weird"), schema2, Seq("id"))
    val t = Seq((1L, "s1", "v1")).toDF("id", "st", "vals")
    val s = spool((1L,
      """{"kind":"update","schema":"public","table":"weird",
         "columnnames":["id","st"],"columnvalues":[1,"s2"],
         "oldkeys":{"keynames":["id"],"keyvalues":[1]}}"""))
    val out = ApplyEngine.applyChanges(
      t, Wal2Json.decodeEvents(Wal2Json.parse(s), m2), m2).collect().toSeq
    assert(out == Seq(Row(1L, "s2", "v1")))
  }

  test("changes to other tables are ignored") {
    val s = spool(
      (1L, """{"kind":"insert","schema":"public","table":"other",
         "columnnames":["c_custkey"],"columnvalues":[1]}"""),
      (2L, """{"kind":"insert","schema":"bi","table":"customer",
         "columnnames":["c_custkey"],"columnvalues":[2]}"""))
    assert(applied(target((7L, "C", 1.0, "X")), s) == Seq(Row(7L, "C", 1.0, "X")))
  }

  test("full PG type breadth: bool/date/timestamp/numeric/bytea decode") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("active", BooleanType),
      StructField("born", DateType),
      StructField("seen", TimestampType),
      StructField("balance", DecimalType(38, 18)),
      StructField("blob", BinaryType)))
    val m = TableMeta(TableId("srcdb", "public", "typed"), schema, Seq("id"))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    val s = spool((1L,
      """{"kind":"insert","schema":"public","table":"typed",
         "columnnames":["id","active","born","seen","balance","blob"],
         "columnvalues":[7,true,"2021-03-17",
           "2021-03-17 10:04:29.123456+01","12345.678900",
           "48656c6c6f"]}"""))
    val out = ApplyEngine.applyChanges(
      empty, Wal2Json.decodeEvents(Wal2Json.parse(s), m), m).collect()(0)
    assert(out.getAs[Boolean]("active"))
    assert(out.getAs[java.sql.Date]("born").toString == "2021-03-17")
    assert(out.getAs[java.sql.Timestamp]("seen").toInstant.toString ==
      "2021-03-17T09:04:29.123456Z") // +01 offset applied, UTC session
    assert(out.getAs[java.math.BigDecimal]("balance")
      .compareTo(new java.math.BigDecimal("12345.6789")) == 0)
    assert(new String(out.getAs[Array[Byte]]("blob")) == "Hello") // hex bytea
  }

  test("collapseSkewResistant ≡ collapse on multi-phase logs") {
    val c = graft.Tables.customer(spark, "/root/testdata/sf0.001")
    val m = graft.model.TableMeta(
      TableId("srcdb", "public", "customer"), c.schema, Seq("c_custkey"))
    val events = Wal2Json.decodeEvents(
      Wal2Json.parse(graft.fixtures.SyntheticCdc.customerLog(spark, "/root/testdata/sf0.001")), m)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("key"), col("st"),
        map_entries(col("vals")).as("ve"), col("viol"))
        .collect()
        .map(r => (r.getSeq[String](0), r.getString(1),
          Option(r.getSeq[Row](2)).map(_.map(e =>
            (e.getString(0), e.getString(1))).sortBy(_._1)).orNull,
          r.getInt(3)))
        .sortBy(_._1.mkString("|")).toSeq
    // phases are 60 s apart → several 30 s buckets; results must be
    // identical to the single-phase fold
    assert(canon(ApplyEngine.collapseSkewResistant(events, 30)) ==
      canon(ApplyEngine.collapse(events)))
    // degenerate bucketing (everything in one bucket) also identical
    assert(canon(ApplyEngine.collapseSkewResistant(events, 100000)) ==
      canon(ApplyEngine.collapse(events)))
  }

  test("hot-key log shards across buckets; skew path ≡ naive end-to-end") {
    val c = graft.Tables.customer(spark, "/root/testdata/sf0.001")
    val m = graft.model.TableMeta(
      TableId("srcdb", "public", "customer"), c.schema, Seq("c_custkey"))
    val events = Wal2Json.decodeEvents(Wal2Json.parse(
      graft.fixtures.SyntheticCdc.hotKeyLog(spark, "/root/testdata/sf0.001")), m)

    // the straggler audit: the hot key's events must spread over MANY
    // (key, 30 s bucket) phase-1 shards — that spread IS what keeps
    // the fold off a single task
    val hotBuckets = events
      .filter(element_at(col("key"), 1) === "1")
      .select((unix_timestamp(col("ord.ts")) / 30).cast("long"))
      .distinct().count()
    assert(hotBuckets >= 16, s"hot key folded into only $hotBuckets shards")

    // and the sharded fold must be indistinguishable from the naive
    // one after the merge
    val viaSkew = ApplyEngine.merge(
      c, ApplyEngine.collapseSkewResistant(events), m)
      .orderBy("c_custkey").collect().toSeq
    val viaNaive = ApplyEngine.applyChanges(c, events, m)
      .orderBy("c_custkey").collect().toSeq
    assert(viaSkew == viaNaive)
  }

  test("collapseSkewResistant: cross-bucket patch-after-delete violations") {
    // del in bucket 0, TWO patches in bucket 1, then a patch-leading
    // bucket ending in row: viol must count per patch EVENT (3), not
    // per bucket, exactly like the sequential fold
    val s = spool(
      (1L, """{"kind":"delete","schema":"public","table":"customer",
              "oldkeys":{"keynames":["c_custkey"],"keyvalues":[7]}}"""),
      (2L, """{"kind":"update","schema":"public","table":"customer",
              "columnnames":["c_custkey","c_name"],"columnvalues":[7,"a"],
              "oldkeys":{"keynames":["c_custkey"],"keyvalues":[7]}}"""),
      (3L, """{"kind":"update","schema":"public","table":"customer",
              "columnnames":["c_custkey","c_name"],"columnvalues":[7,"b"],
              "oldkeys":{"keynames":["c_custkey"],"keyvalues":[7]}}"""),
      (4L, """{"kind":"update","schema":"public","table":"customer",
              "columnnames":["c_custkey","c_name"],"columnvalues":[7,"c"],
              "oldkeys":{"keynames":["c_custkey"],"keyvalues":[7]}}"""),
      (5L, """{"kind":"insert","schema":"public","table":"customer",
              "columnnames":["c_custkey","c_name","c_acctbal","c_mktsegment"],
              "columnvalues":[7,"fresh",1.0,"S"]}"""))
      // spread events across 30s buckets via distinct timestamps
      .withColumn("xid_timestamp",
        timestamp_seconds(lit(1700000000L) + col("lsn_start") * 31))
    val events = Wal2Json.decodeEvents(Wal2Json.parse(s), meta)
    def violOf(df: org.apache.spark.sql.DataFrame): Int =
      df.select("viol").collect().map(_.getInt(0)).sum
    assert(violOf(ApplyEngine.collapse(events)) == 3)
    assert(violOf(ApplyEngine.collapseSkewResistant(events, 30)) == 3)
    assert(violOf(ApplyEngine.collapseSkewResistant(events, 1)) == 3)
    assert(violOf(ApplyEngine.collapseSkewResistant(events, 100000)) == 3)
  }

  test("composite PK: lineitem-style two-column key") {
    val liSchema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType)))
    val liMeta = TableMeta(TableId("srcdb", "public", "lineitem"), liSchema,
      Seq("l_orderkey", "l_linenumber"))
    val t = Seq((1L, 1, 10.0), (1L, 2, 20.0)).toDF("l_orderkey", "l_linenumber", "l_quantity")
    val s = spool(
      (1L, """{"kind":"update","schema":"public","table":"lineitem",
         "columnnames":["l_orderkey","l_linenumber","l_quantity"],
         "columnvalues":[1,2,99.0],
         "oldkeys":{"keynames":["l_orderkey","l_linenumber"],"keyvalues":[1,2]}}"""),
      (2L, """{"kind":"delete","schema":"public","table":"lineitem",
         "oldkeys":{"keynames":["l_orderkey","l_linenumber"],"keyvalues":[1,1]}}"""))
    val out = ApplyEngine.applyChanges(
      t, Wal2Json.decodeEvents(Wal2Json.parse(s), liMeta), liMeta)
      .orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(out == Seq(Row(1L, 2, 99.0)))
  }

  test("partitionValid: corrupt payloads quarantine with raw text intact") {
    val s = spool(
      (1L, """{"kind":"insert","schema":"public","table":"customer",
              "columnnames":["c_custkey"],"columnvalues":[1]}"""),
      (2L, """{this is not json at all"""),
      (3L, """{"schema":"public"}"""))   // parses but has no kind/table
    val (valid, quarantine) = Wal2Json.partitionValid(Wal2Json.parse(s))
    assert(valid.count() == 1L)
    val bad = quarantine.select("lsn_start", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bad.keySet == Set(2L, 3L))
    assert(bad(2L).startsWith("{this is not json")) // raw kept for repair
  }

  test("wal2json v2 payloads decode to the same events as v1") {
    // the same logical history expressed in both framings: insert 42,
    // partial (TOASTed) update, PK-change update 42→43, delete 7
    val v1 = spool(
      (1L, """{"kind":"insert","schema":"public","table":"customer",
              "columnnames":["c_custkey","c_name","c_acctbal","c_mktsegment"],
              "columnvalues":[42,"Customer#42",711.56,"BUILDING"]}"""),
      (2L, """{"kind":"update","schema":"public","table":"customer",
              "columnnames":["c_custkey","c_acctbal"],
              "columnvalues":[42,99.99],
              "oldkeys":{"keynames":["c_custkey"],"keyvalues":[42]}}"""),
      (3L, """{"kind":"update","schema":"public","table":"customer",
              "columnnames":["c_custkey","c_name","c_acctbal","c_mktsegment"],
              "columnvalues":[43,"Customer#43",1.25,"AUTO"],
              "oldkeys":{"keynames":["c_custkey"],"keyvalues":[42]}}"""),
      (4L, """{"kind":"delete","schema":"public","table":"customer",
              "oldkeys":{"keynames":["c_custkey"],"keyvalues":[7]}}"""))
    val v2 = spool(
      (1L, """{"action":"I","schema":"public","table":"customer",
              "columns":[{"name":"c_custkey","value":42},{"name":"c_name","value":"Customer#42"},
                         {"name":"c_acctbal","value":711.56},{"name":"c_mktsegment","value":"BUILDING"}]}"""),
      (2L, """{"action":"U","schema":"public","table":"customer",
              "columns":[{"name":"c_custkey","value":42},{"name":"c_acctbal","value":99.99}],
              "identity":[{"name":"c_custkey","value":42}]}"""),
      (3L, """{"action":"U","schema":"public","table":"customer",
              "columns":[{"name":"c_custkey","value":43},{"name":"c_name","value":"Customer#43"},
                         {"name":"c_acctbal","value":1.25},{"name":"c_mktsegment","value":"AUTO"}],
              "identity":[{"name":"c_custkey","value":42}]}"""),
      (4L, """{"action":"D","schema":"public","table":"customer",
              "identity":[{"name":"c_custkey","value":7}]}"""))
    val dump = (df: DataFrame) =>
      Wal2Json.decodeEvents(df, meta)
        .select(col("ord.lsn"), col("ord.sub"), col("op"), col("key"), col("vals"))
        .orderBy("lsn", "sub").collect().toSeq
    val (ev1, ev2) = (dump(Wal2Json.parse(v1)),
      dump(Wal2Json.parse(v2, graft.decode.Framing.V2)))
    assert(ev1.nonEmpty && ev1 == ev2)
    // and the applied end-state matches too
    val t = target((7L, "Customer#7", 0.0, "AUTO"))
    val a2 = ApplyEngine.applyChanges(
      t, Wal2Json.decodeEvents(Wal2Json.parse(v2, graft.decode.Framing.V2), meta), meta)
      .orderBy("c_custkey").collect().toSeq
    assert(a2 == Seq(Row(43L, "Customer#43", 1.25, "AUTO")))
  }
}
