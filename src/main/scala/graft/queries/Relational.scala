package graft.queries

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface: the scan / filter / join / aggregate /
  * sort / set-op shapes the reference issues (SURVEY §2.1, §2.3–2.7),
  * expressed over the TPC-H-ish fixtures so the DuckDB oracle can
  * check them value-for-value.
  *
  * Reference query shapes covered here:
  *  - GROUP BY + aggregates (G1): `replayer/connemara_replay.pl:474-478`
  *  - equi-joins on keys (J1): `replayer/connemara_replay.pl:207-208`
  *  - anti-joins / NOT EXISTS (J4, J6): `replayer/connemara_reindex.sh:14-18,35-45`
  *  - ORDER BY + LIMIT top-k (O1, O2): `replayer/connemara_fixer.pl:101-102`
  *  - DISTINCT (G4): `connemara_python/connemara/schema_dump.py:46-59`
  *  - scalar MIN subquery + interval window (G3, F6): `replayer/connemara_fixer.pl:99`
  *  - IN-list membership (E3): `replayer/connemara_replay.pl:798`
  */
object Relational {

  // Exact-arithmetic casts (see QueryRegistry determinism contract).
  private val D = "decimal(18,6)"
  // scale-4 variant for whole-table o_totalprice sums: keeps the
  // int-scaled magnitude well under 2^53 at larger scale factors
  private val D4 = "decimal(18,4)"

  val q1_agg = GraftQuery(
    "q1_agg",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(D)).cast("double").as("sum_base_price"),
          // product scale is 12 but true data scale is 4; reduce to
          // scale 6 (exact) before the double cast — DuckDB's
          // decimal→double is only correctly rounded when the
          // int-scaled magnitude fits in 2^53.
          sum((col("l_extendedprice").cast(D) * (lit(1).cast(D) - col("l_discount").cast(D)))
            .cast("decimal(38,12)")).cast("decimal(30,6)").cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,12))) AS DECIMAL(30,6)) AS DOUBLE) AS sum_disc_price,
      COUNT(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Equi-join + group-by: revenue per market segment (J1 + G1 shape). */
  val q2_join_agg = GraftQuery(
    "q2_join_agg",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D)).cast("double").as("revenue"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Three-way join through nation/region with an IN-list filter (E3). */
  val q3_multi_join = GraftQuery(
    "q3_multi_join",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .filter(col("r_name").isin("ASIA", "EUROPE"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast(D)).cast("double").as("total_acctbal"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name,
      COUNT(*) AS n_customers,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name IN ('ASIA','EUROPE')
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  /** Top-k after total sort with key-complete tiebreak (O1+O2 shape —
    * `… ORDER BY … LIMIT 1` at `replayer/connemara_fixer.pl:102`). */
  val q4_topk = GraftQuery(
    "q4_topk",
    (s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""))

  /** DISTINCT projection (G4 — `SELECT DISTINCT objid::regproc`). */
  val q5_distinct = GraftQuery(
    "q5_distinct",
    (s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderstatus"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    },
    Some("""SELECT DISTINCT o_orderstatus, o_orderpriority
      FROM orders ORDER BY o_orderstatus, o_orderpriority"""))

  /** Anti-join: customers without orders (J4/J6 NOT EXISTS shape). */
  val q6_anti_join = GraftQuery(
    "q6_anti_join",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey"""))

  /** Semi-join: parts that appear in lineitem (EXISTS shape). */
  val q7_semi_join = GraftQuery(
    "q7_semi_join",
    (s, dir) => {
      val p = Tables.part(s, dir)
      val li = Tables.lineitem(s, dir)
      p.join(li, p("p_partkey") === li("l_partkey"), "left_semi")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand, COUNT(*) AS n_parts FROM part p
      WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
      GROUP BY p_brand ORDER BY p_brand"""))

  /** Scalar-MIN subquery + 30s interval horizon over the events stream
    * table (G3 + F6 — `insert_timestamp < min(insert_timestamp) +
    * '30s'::interval`, `replayer/connemara_fixer.pl:99`). */
  val q8_min_window = GraftQuery(
    "q8_min_window",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val horizon = e.agg(min(col("ts")).as("min_ts"))
      e.crossJoin(broadcast(horizon))
        .filter(col("ts") < col("min_ts") + expr("INTERVAL 30 SECONDS"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, COUNT(*) AS n_events FROM events
      WHERE ts < (SELECT MIN(ts) + INTERVAL 30 SECOND FROM events)
      GROUP BY event_type ORDER BY event_type"""))

  /** Event-time tumbling 30 s batch key (G7/A2 — `floor(epoch/30)` batch
    * boundary, `replayer/connemara_replay.pl:846-857`). */
  val q9_event_batches = GraftQuery(
    "q9_event_batches",
    (s, dir) => {
      Tables.events(s, dir)
        .withColumn("batch_id", floor(unix_timestamp(col("ts")) / 30))
        .groupBy(col("batch_id"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(D)).cast("double").as("total_value"))
        .orderBy(col("batch_id"))
    },
    Some("""SELECT CAST(FLOOR(EPOCH(ts) / 30) AS BIGINT) AS batch_id,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1 ORDER BY batch_id"""))

  /** F1: the md5-modulo routing partitioner, bit-for-bit vs the
    * oracle (`unpack('N', md5(…)) % n` parity). */
  val q10_md5_route = GraftQuery(
    "q10_md5_route",
    (s, dir) => {
      Tables.customer(s, dir)
        .withColumn("route", graft.functions.Routing.md5Route(
          4, lit("srcdb"), lit("public"), lit("customer"),
          col("c_custkey").cast("string")))
        .groupBy(col("route")).agg(count(lit(1)).as("n"))
        .orderBy(col("route"))
    },
    Some("""SELECT route, COUNT(*) AS n FROM (
      SELECT CAST(('0x' || substring(
          md5('srcdb|public|customer|' || CAST(c_custkey AS VARCHAR)),
          1, 8)) AS BIGINT) % 4 AS route
      FROM customer)
      GROUP BY route ORDER BY route"""))

  /** P5: the db/slot restriction predicate over a synthetic
    * multi-source spool shape. */
  val q11_db_slot = GraftQuery(
    "q11_db_slot",
    (s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("database", concat(lit("db"), pmod(col("user_id"), lit(3))))
        .withColumn("slot", concat(lit("slot"), pmod(col("event_id"), lit(2))))
      e.filter(graft.functions.Routing.dbSlotRestriction(
        Map("db0" -> "slot0", "db1" -> "slot1"),
        col("database"), col("slot")))
        .groupBy(col("database")).agg(count(lit(1)).as("n"))
        .orderBy(col("database"))
    },
    Some("""SELECT database, COUNT(*) AS n FROM (
      SELECT 'db' || CAST(user_id % 3 AS VARCHAR) AS database,
             'slot' || CAST(event_id % 2 AS VARCHAR) AS slot
      FROM events)
      WHERE database NOT IN ('db0','db1')
         OR (database = 'db0' AND slot = 'slot0')
         OR (database = 'db1' AND slot = 'slot1')
      GROUP BY database ORDER BY database"""))

  /** W2-style analytic windows: per-customer order sequencing with
    * row_number + lag — the ranking form of the per-key ordered
    * collapse the CDC engine does internally. */
  val q12_window = GraftQuery(
    "q12_window",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("seq"),
        lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"))
        .filter(col("seq") <= 3)
        .orderBy(col("o_custkey"), col("seq"))
    },
    Some("""SELECT o_custkey, o_orderkey, CAST(seq AS INTEGER) AS seq, prev_orderkey
      FROM (
        SELECT o_custkey, o_orderkey,
          row_number() OVER w AS seq,
          lag(o_orderkey, 1) OVER w AS prev_orderkey
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      WHERE seq <= 3 ORDER BY o_custkey, seq"""))

  /** E1: set difference — nations with customers but no suppliers. */
  val q13_except = GraftQuery(
    "q13_except",
    (s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      val su = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
      c.except(su).orderBy(col("nationkey"))
    },
    Some("""SELECT nationkey FROM (
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
      ORDER BY nationkey"""))

  /** G2 on business data: ordered string_agg — nation list per
    * region, alphabetical (`string_agg(… ORDER BY …)` parity). */
  val q14_string_agg = GraftQuery(
    "q14_string_agg",
    (s, dir) => {
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      n.join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws(",",
          array_sort(collect_list(col("n_name")))).as("nations"))
        .orderBy(col("r_name"))
    },
    Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** Gap-based sessionization in batch form — the oracle-checked twin
    * of the streaming `flatMapGroupsWithState` sessionizer: session
    * boundaries = gaps > 30 s, session id = running sum of boundary
    * flags (lag + cumulative sum over the per-user event-time
    * window). */
  val q15_sessions = GraftQuery(
    "q15_sessions",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, dir)
      val wOrder = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      // gaps compared in exact microseconds — second-truncation here
      // vs fractional epochs in the oracle would flag different pairs
      val flagged = e.withColumn("new_session",
        when(unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(wOrder)) > 30000000L, 1)
          .otherwise(0))
      val withSid = flagged.withColumn("session_id",
        sum(col("new_session")).over(
          wOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      withSid.groupBy(col("user_id"))
        .agg(
          (max(col("session_id")) + 1).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },
    Some("""WITH flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN EPOCH_US(ts) - EPOCH_US(lag(ts, 1) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id)) > 30000000
               THEN 1 ELSE 0 END AS new_session
        FROM events),
      sess AS (
        SELECT user_id,
          SUM(new_session) OVER (PARTITION BY user_id
            ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged)
      SELECT user_id, CAST(MAX(session_id) + 1 AS BIGINT) AS n_sessions,
             COUNT(*) AS n_events
      FROM sess GROUP BY user_id ORDER BY user_id"""))

  /** jsonb-column handling (§1.2): JSON path extraction + typed cast
    * over the events `props` payload — the engine-side analog of the
    * reference's `payload->>…` projections (P1). */
  val q16_json = GraftQuery(
    "q16_json",
    (s, dir) => {
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          sum(when(col("k") > 50, 1).otherwise(0)).as("n_high"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Temporal aggregation: orders per calendar month (`date_trunc`)
    * with decimal-exact revenue. */
  val q17_monthly = GraftQuery(
    "q17_monthly",
    (s, dir) => {
      Tables.orders(s, dir)
        // cast to DATE: DuckDB's month-granularity date_trunc returns
        // DATE while Spark's returns timestamp
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D)).cast("double").as("revenue"))
        .orderBy(col("month"))
    },
    Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1 ORDER BY month"""))

  /** Salted skew join (A4's hash-partitioning pushed one level
    * further): result must be IDENTICAL to the plain join — the
    * oracle runs the unsalted SQL. */
  val q18_salted_join = GraftQuery(
    "q18_salted_join",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_partkey"), col("l_quantity"))
      val p = Tables.part(s, dir)
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      graft.ops.SkewJoin.saltedJoin(li, p, Seq("l_partkey"), salt = 8)
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand, COUNT(*) AS n_rows,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p_brand ORDER BY p_brand"""))

  /** Bucketed co-located join: both sides written bucketed+sorted on
    * the join key (one file per bucket), so the join plans with NO
    * exchange and NO sort — the layout IS the shuffle, paid once at
    * write time (asserted in BucketingSpec; values oracled here
    * against the plain join). */
  val q19_bucketed_join = GraftQuery(
    "q19_bucketed_join",
    (s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice"))
      val c = Tables.customer(s, dir)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      // table names keyed by session + data dir: two JVMs sharing the
      // warehouse (or two scale factors in one session) must not race
      // on one staging table (the q20 staging-dir hazard)
      val key = (s.sparkContext.applicationId + "_" +
        Integer.toHexString(dir.hashCode)).replaceAll("[^A-Za-z0-9_]", "_")
      val bo = graft.ops.Bucketing.writeBucketed(
        s, o, s"graft_bkt_orders_$key", 8, "o_custkey")
      val bc = graft.ops.Bucketing.writeBucketed(
        s, c, s"graft_bkt_customer_$key", 8, "o_custkey")
      bo.join(bc, Seq("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D4)).cast("double").as("revenue"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Partition-pruned scan: orders staged partitioned by priority; the
    * filter prunes directories at planning time (PartitionFilters in
    * the scan — BucketingSpec asserts only one partition is read). */
  val q20_partition_prune = GraftQuery(
    "q20_partition_prune",
    (s, dir) => {
      // keyed by applicationId so concurrent sessions never race on
      // one staging dir (overwrite-while-read), and by the data dir
      // so scale factors don't collide within a session
      val stage = s"${System.getProperty("java.io.tmpdir")}/graft_pp_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val part = graft.ops.Bucketing.writePartitioned(
        s, Tables.orders(s, dir), stage, "o_orderpriority")
      part.filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D4)).cast("double").as("revenue"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Point-in-time as-of join: each purchase gets the latest view at
    * or before it, per user — one union + keyed window scan (see
    * [[graft.ops.AsOfJoin]]), never a θ-join blowup. */
  val q21_asof_join = GraftQuery(
    "q21_asof_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .drop("event_type")
      val views = ev.filter(col("event_type") === "view")
        .drop("event_type")
      graft.ops.AsOfJoin.asOf(purchases, views,
        keys = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
        rightVals = Seq("event_id", "value"))
        .select(
          col("event_id"), col("user_id"),
          col("event_id_asof"), col("value_asof"))
        .orderBy(col("event_id"))
    },
    Some("""WITH l AS (
        SELECT event_id, ts, user_id, value FROM events
        WHERE event_type = 'purchase'),
      r AS (
        SELECT event_id AS r_event_id, ts AS r_ts, user_id, value AS r_value
        FROM events WHERE event_type = 'view'),
      j AS (
        SELECT l.event_id, l.user_id, r.r_event_id, r.r_value,
          row_number() OVER (PARTITION BY l.event_id
            ORDER BY r.r_ts DESC, r.r_event_id DESC) AS rn
        FROM l LEFT JOIN r
          ON l.user_id = r.user_id AND r.r_ts <= l.ts)
      SELECT event_id, user_id, r_event_id AS event_id_asof,
        r_value AS value_asof
      FROM j WHERE rn = 1 ORDER BY event_id"""))

  /** Bucketed range join: clicks inside a ±30 min window around each
    * error event, per user — equi-join on (user, minute-bucket) + a
    * residual containment filter (see [[graft.ops.RangeJoin]]), never
    * a nested-loop θ-join. */
  val q22_range_join = GraftQuery(
    "q22_range_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          (col("ts") - expr("INTERVAL 30 MINUTES")).as("win_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("win_end"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      graft.ops.RangeJoin.byBucket(errors, clicks, Seq("user_id"),
        "win_start", "win_end", "ts", bucketSeconds = 3600)
        .groupBy(col("err_id"))
        .agg(count(lit(1)).as("n_clicks"), min(col("click_id")).as("first_click"))
        .orderBy(col("err_id"))
    },
    Some("""WITH e AS (
        SELECT event_id AS err_id, user_id,
          ts - INTERVAL 30 MINUTE AS st, ts + INTERVAL 30 MINUTE AS en
        FROM events WHERE event_type = 'error'),
      c AS (
        SELECT user_id, ts, event_id AS click_id
        FROM events WHERE event_type = 'click')
      SELECT err_id, COUNT(*) AS n_clicks, MIN(click_id) AS first_click
      FROM e JOIN c ON e.user_id = c.user_id
        AND c.ts >= e.st AND c.ts <= e.en
      GROUP BY err_id ORDER BY err_id"""))

  /** ROLLUP subtotals: (priority, status) with per-priority and grand
    * totals; rollup NULLs labeled 'ALL' so the hash compare can't
    * confuse them with data NULLs. */
  val q23_rollup = GraftQuery(
    "q23_rollup",
    (s, dir) => {
      Tables.orders(s, dir)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("revenue"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n_orders"), col("revenue"))
        .orderBy(col("priority"), col("status"))
    },
    Some("""SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        COALESCE(o_orderstatus, 'ALL') AS status,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      ORDER BY priority, status"""))

  /** Pivot: order counts status × priority (conditional-aggregation
    * form in the oracle — the relational identity of pivot). */
  val q24_pivot = GraftQuery(
    "q24_pivot",
    (s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(
          col("o_orderstatus") +:
            Seq("1-URGENT" -> "p1", "2-HIGH" -> "p2", "3-MEDIUM" -> "p3",
              "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5").map {
              // pivot yields NULL for empty cells; conditional COUNT
              // yields 0 — align on 0
              case (c, a) => coalesce(col(s"`$c`"), lit(0L)).as(a)
            }: _*)
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus,
        COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1,
        COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2,
        COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3,
        COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4,
        COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Trailing event-time range window: per user, events in the
    * preceding hour (RANGE frame on epoch seconds — count is
    * integer-exact, unlike a rolling mean). */
  val q25_rolling = GraftQuery(
    "q25_rolling",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("epoch_s"))
        .rangeBetween(-3600L, 0L)
      Tables.events(s, dir)
        .withColumn("epoch_s", unix_timestamp(col("ts")))
        .withColumn("n_last_hour", count(lit(1)).over(w))
        .select(col("event_id"), col("user_id"), col("n_last_hour"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id,
        COUNT(*) OVER (PARTITION BY user_id ORDER BY EPOCH_US(ts) // 1000000
                       RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
          AS n_last_hour
      FROM events ORDER BY event_id"""))

  /** CUBE marginals: all four grouping combinations of
    * (status, priority) — ROLLUP's hierarchy plus the cross-marginal
    * per-priority totals. NULL group labels coalesced to 'ALL' so the
    * hash compare can't confuse them with data NULLs. */
  val q26_cube = GraftQuery(
    "q26_cube",
    (s, dir) => {
      Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("revenue"))
        .orderBy(col("status"), col("priority"))
    },
    Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority"""))

  /** Set intersection — nations with BOTH customers and suppliers
    * (the E1 family's other half next to q13's EXCEPT). */
  val q27_intersect = GraftQuery(
    "q27_intersect",
    (s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      val su = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
      c.intersect(su).orderBy(col("nationkey"))
    },
    Some("""SELECT nationkey FROM (
      SELECT DISTINCT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
      ORDER BY nationkey"""))

  /** Analytic-window breadth: lag/lead/ntile/percent_rank per
    * customer order history — the W2 family beyond running
    * aggregates. percent_rank is an exact int/int division, ntile an
    * integer — deterministic cross-engine; lag/lead carry values
    * unchanged (no float arithmetic). One shuffle on the partition
    * key; partitions are per-customer, naturally small. */
  val q28_window_funcs = GraftQuery(
    "q28_window_funcs",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir).filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
        lag(o_totalprice, 1) OVER w AS prev_price,
        lead(o_totalprice, 1) OVER w AS next_price,
        CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        percent_rank() OVER w AS pct_rank
      FROM orders WHERE o_custkey < 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""))

  /** Data-expectation report ([[graft.ops.Validation]]): five
    * row-level checks in ONE partial-aggregable scan plus a
    * key-uniqueness row (one keyed shuffle) — the pre-publish sanity
    * gate of any ingest path, N checks ≠ N scans. The uniqueness
    * check counts both the planted duplicate rows AND the fixture's
    * own (l_orderkey, l_linenumber) collisions — exactly the kind of
    * silent assumption-breaker the report exists to surface. */
  val q38_validate = GraftQuery(
    "q38_validate",
    (s, dir) => {
      import graft.ops.Validation
      import graft.ops.Validation.Check
      val li = Tables.lineitem(s, dir)
      // plant duplicates so the uniqueness row is non-trivial
      val corpus = graft.fixtures.Planted.corpus(li,
        (pmod(col("l_orderkey"), lit(100)) === 0) -> Seq.empty)
      val checks = Seq(
        Check("discount_max_5pct", col("l_discount") <= 0.05),
        Check("quantity_in_range", col("l_quantity").between(1, 50)),
        Check("quantity_under_25", col("l_quantity") <= 25),
        Check("returnflag_domain", col("l_returnflag").isin("A", "N", "R")),
        Check("shipdate_not_null", col("l_shipdate").isNotNull))
      Validation.report(corpus, checks)
        .unionByName(Validation.duplicateSurplus(corpus,
          Seq("l_orderkey", "l_linenumber"), "pk_unique"))
        .orderBy(col("check_name"))
    },
    Some("""WITH corpus AS (
        SELECT * FROM lineitem
        UNION ALL
        SELECT * FROM lineitem WHERE l_orderkey % 100 = 0),
      rowchecks AS (
        SELECT 'discount_max_5pct' AS check_name, SUM(CASE WHEN NOT COALESCE(l_discount <= 0.05, FALSE) THEN 1 ELSE 0 END) AS n_violations, COUNT(*) AS n_rows FROM corpus
        UNION ALL
        SELECT 'quantity_in_range', SUM(CASE WHEN NOT COALESCE(l_quantity BETWEEN 1 AND 50, FALSE) THEN 1 ELSE 0 END), COUNT(*) FROM corpus
        UNION ALL
        SELECT 'quantity_under_25', SUM(CASE WHEN NOT COALESCE(l_quantity <= 25, FALSE) THEN 1 ELSE 0 END), COUNT(*) FROM corpus
        UNION ALL
        SELECT 'returnflag_domain', SUM(CASE WHEN NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE) THEN 1 ELSE 0 END), COUNT(*) FROM corpus
        UNION ALL
        SELECT 'shipdate_not_null', SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END), COUNT(*) FROM corpus),
      grouped AS (
        SELECT l_orderkey, l_linenumber, COUNT(*) AS k FROM corpus GROUP BY 1, 2),
      pk AS (
        SELECT 'pk_unique' AS check_name,
          COALESCE(SUM(k - 1), 0) AS n_violations,
          COALESCE(SUM(k), 0) AS n_rows
        FROM grouped)
      SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
             CAST(n_rows AS BIGINT) AS n_rows
      FROM (SELECT * FROM rowchecks UNION ALL SELECT * FROM pk)
      ORDER BY check_name"""))

  /** Correlated-subquery surface, run through `spark.sql` so Catalyst's
    * subquery decorrelation does the planning: EXISTS and NOT EXISTS
    * (rewritten to semi/anti joins) plus a correlated scalar COUNT
    * (rewritten to an aggregate + left outer join — note the
    * classic COUNT bug guard: a customer with no urgent orders must
    * read 0, not NULL). The same SQL text is the oracle. */
  val q29_exists = GraftQuery(
    "q29_exists",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("graft_customer")
      Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
      s.sql("""
        SELECT c.c_custkey, c.c_name,
          (SELECT COUNT(*) FROM graft_orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT') AS n_urgent
        FROM graft_customer c
        WHERE EXISTS (SELECT 1 FROM graft_orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM graft_orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderstatus = 'F')
        ORDER BY c_custkey""")
    },
    Some("""SELECT c.c_custkey, c.c_name,
        (SELECT COUNT(*) FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority = '1-URGENT') AS n_urgent
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
        AND NOT EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderstatus = 'F')
      ORDER BY c_custkey"""))

  /** GROUPING SETS with per-column GROUPING() markers — the general
    * form next to q23 ROLLUP / q26 CUBE. Decimal-cast sum keeps the
    * aggregate exact cross-engine (q26's disposition). */
  val q30_grouping_sets = GraftQuery(
    "q30_grouping_sets",
    (s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("graft_lineitem")
      s.sql("""
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM graft_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY rf, ls""")
    },
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             COALESCE(l_linestatus, 'ALL') AS ls,
             CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
             CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
             COUNT(*) AS n_rows,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY rf, ls"""))

  /** Correlated LATERAL derived table with a per-row ORDER BY/LIMIT —
    * top-2 orders per customer. Catalyst plans the correlated limit
    * as a ranked window over the join (the J5 lateral family on
    * business data, beyond posexplode ordinality). */
  val q31_lateral = GraftQuery(
    "q31_lateral",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("graft_customer")
      Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM graft_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM graft_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey < 100
        ORDER BY c_custkey, o_totalprice DESC, o_orderkey""")
    },
    Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c.c_custkey < 100
      ORDER BY c_custkey, o_totalprice DESC, o_orderkey"""))

  /** Exact quartiles per group (`percentile` ≡ DuckDB
    * `quantile_cont`). Deterministic cross-engine because every
    * interpolation input is exact: p ∈ {.25, .5, .75} are dyadic
    * rationals, ranks (n−1)·p and the integer-valued gaps multiply
    * exactly in doubles. Exact percentile sorts per group — at full
    * scale use approx_percentile (t-digest) instead; this is the
    * correctness anchor for it. */
  val q32_percentiles = GraftQuery(
    "q32_percentiles",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("median"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
        quantile_cont(l_quantity, 0.25) AS q25,
        quantile_cont(l_quantity, 0.5) AS median,
        quantile_cont(l_quantity, 0.75) AS q75,
        COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Recursive CTE (Spark 4's WITH RECURSIVE): binary-tree ancestor
    * chains derived from doc ids — each iteration is a set-based
    * step (project + filter over the previous frontier), so the
    * recursion parallelizes per row with no driver loop; depth is
    * bounded by log2(maxId). DuckDB oracle runs the same recursion
    * (`//` is its integer division; Spark spells it DIV). */
  val q33_recursive = GraftQuery(
    "q33_recursive",
    (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("graft_documents")
      s.sql("""
        WITH RECURSIVE anc AS (
          SELECT doc_id AS node, doc_id AS anc, 0 AS depth FROM graft_documents
          WHERE doc_id BETWEEN 1 AND 63
          UNION ALL
          SELECT node, anc DIV 2, depth + 1 FROM anc WHERE anc > 1
        )
        SELECT node, CAST(MAX(depth) AS INT) AS depth,
               COUNT(*) AS chain_len, CAST(SUM(anc) AS BIGINT) AS anc_sum
        FROM anc GROUP BY node ORDER BY node""")
    },
    Some("""WITH RECURSIVE anc AS (
        SELECT doc_id AS node, doc_id AS anc, 0 AS depth FROM documents
        WHERE doc_id BETWEEN 1 AND 63
        UNION ALL
        SELECT node, anc // 2, depth + 1 FROM anc WHERE anc > 1
      )
      SELECT node, CAST(MAX(depth) AS INT) AS depth,
             COUNT(*) AS chain_len, CAST(SUM(anc) AS BIGINT) AS anc_sum
      FROM anc GROUP BY node ORDER BY node"""))

  /** Z-order (Morton) 2-D clustered layout: part staged into z-prefix
    * cell directories over (p_size, p_retailprice) rank buckets, then
    * a 2-D box query reads ONLY the intersecting cells (dir pruning at
    * planning time, asserted in BucketingSpec) with the exact
    * predicate as residual. Linear layouts prune one dimension and
    * scan the other's full stripe — at 100 TB this cell-count
    * difference is the read-amplification story of Delta/Iceberg
    * OPTIMIZE ZORDER, built here from partitioned dirs + range sort.
    */
  val q34_zorder = GraftQuery(
    "q34_zorder",
    (s, dir) => {
      val stage = s"${System.getProperty("java.io.tmpdir")}/graft_zo_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val bits = 5; val prefix = 2
      val zdf = graft.ops.Bucketing.writeZOrdered(
        s, Tables.part(s, dir), stage,
        graft.ops.Bucketing.rangeBucket(col("p_size"), 1, 50, bits),
        graft.ops.Bucketing.rangeBucket(col("p_retailprice"), 900, 1000, bits),
        bits, prefix)
      def xb(v: Double) = graft.ops.Bucketing.rangeBucketValue(v, 1, 50, bits)
      def yb(v: Double) = graft.ops.Bucketing.rangeBucketValue(v, 900, 1000, bits)
      val cells = graft.ops.Bucketing.zCellsForBox(
        (xb(10), xb(20)), (yb(920), yb(960)), bits, prefix)
      zdf
        .filter(col("z_cell").isin(cells: _*)) // dir pruning (superset)
        .filter(col("p_size").between(10, 20) &&
          col("p_retailprice") >= 920 && col("p_retailprice") < 960)
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_parts"),
          sum(col("p_retailprice").cast(D4)).cast("double").as("total_price"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand, COUNT(*) AS n_parts,
      CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
      FROM part
      WHERE p_size BETWEEN 10 AND 20
        AND p_retailprice >= 920 AND p_retailprice < 960
      GROUP BY p_brand ORDER BY p_brand"""))

  /** Forward as-of join with tolerance (the other half of pandas
    * merge_asof): each purchase gets the EARLIEST view at-or-after it
    * within 1 hour, per user — same single keyed window merge-scan as
    * q21, mirrored, with the tolerance applied as a post-mask on the
    * nearest match (correct because the carried row is the nearest:
    * if it is out of tolerance, nothing in tolerance exists). */
  val q35_asof_forward = GraftQuery(
    "q35_asof_forward",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .drop("event_type")
      val views = ev.filter(col("event_type") === "view")
        .drop("event_type")
      graft.ops.AsOfJoin.asOf(purchases, views,
        keys = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
        rightVals = Seq("event_id", "value"), suffix = "_next",
        forward = true,
        tolerance = Some((l, r) =>
          unix_micros(r) - unix_micros(l) <= 3600L * 1000000L))
        .select(
          col("event_id"), col("user_id"),
          col("event_id_next"), col("value_next"))
        .orderBy(col("event_id"))
    },
    Some("""WITH l AS (
        SELECT event_id, ts, user_id, value FROM events
        WHERE event_type = 'purchase'),
      r AS (
        SELECT event_id AS r_event_id, ts AS r_ts, user_id, value AS r_value
        FROM events WHERE event_type = 'view'),
      j AS (
        SELECT l.event_id, l.user_id, r.r_event_id, r.r_value,
          row_number() OVER (PARTITION BY l.event_id
            ORDER BY r.r_ts ASC, r.r_event_id DESC) AS rn
        FROM l LEFT JOIN r
          ON l.user_id = r.user_id AND r.r_ts >= l.ts
            AND r.r_ts - l.ts <= INTERVAL 1 HOUR)
      SELECT event_id, user_id, r_event_id AS event_id_next,
        r_value AS value_next
      FROM j WHERE rn = 1 ORDER BY event_id"""))

  /** Interval-overlap join ([[graft.ops.RangeJoin.overlapByBucket]]):
    * error windows (±30 min) × purchase windows (±10 min) per user —
    * both sides bucket-replicate, pairs emit once in their first
    * shared bucket, never a nested-loop θ-join. */
  val q36_overlap_join = GraftQuery(
    "q36_overlap_join",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"),
          (col("ts") - expr("INTERVAL 30 MINUTES")).as("a_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("a_end"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("buy_id"), col("user_id"),
          (col("ts") - expr("INTERVAL 10 MINUTES")).as("b_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("b_end"))
      graft.ops.RangeJoin.overlapByBucket(errors, buys, Seq("user_id"),
        "a_start", "a_end", "b_start", "b_end", bucketSeconds = 3600)
        .groupBy(col("err_id"))
        .agg(count(lit(1)).as("n_overlaps"), min(col("buy_id")).as("first_buy"))
        .orderBy(col("err_id"))
    },
    Some("""WITH e AS (
        SELECT event_id AS err_id, user_id,
          ts - INTERVAL 30 MINUTE AS a_start,
          ts + INTERVAL 30 MINUTE AS a_end
        FROM events WHERE event_type = 'error'),
      p AS (
        SELECT event_id AS buy_id, user_id,
          ts - INTERVAL 10 MINUTE AS b_start,
          ts + INTERVAL 10 MINUTE AS b_end
        FROM events WHERE event_type = 'purchase')
      SELECT err_id, COUNT(*) AS n_overlaps, MIN(buy_id) AS first_buy
      FROM e JOIN p ON e.user_id = p.user_id
        AND e.a_start <= p.b_end AND p.b_start <= e.a_end
      GROUP BY err_id ORDER BY err_id"""))

  /** File-level min/max data skipping: orders staged range-clustered
    * on o_orderdate with a footer-stats manifest; a one-year predicate
    * then opens only the files whose [min,max] intersects the range
    * (DataSkippingSpec asserts the file count). The exact filter stays
    * on top — pruning is a superset guarantee, so semantics never
    * depend on the manifest ([[graft.ops.DataSkipping]]). */
  val q37_skip_scan = GraftQuery(
    "q37_skip_scan",
    (s, dir) => {
      val stage = s"${System.getProperty("java.io.tmpdir")}/graft_ds_" +
        s"${s.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}"
      val lo = java.sql.Timestamp.from(
        java.time.Instant.parse("1996-01-01T00:00:00Z"))
      val hi = java.sql.Timestamp.from(
        java.time.Instant.parse("1996-12-31T23:59:59Z"))
      graft.ops.DataSkipping.writeWithStats(s, Tables.orders(s, dir),
        stage, nFiles = 12, layoutCols = Seq("o_orderdate"),
        statsCols = Seq("o_orderdate"))
      graft.ops.DataSkipping.prunedRead(s, stage, "o_orderdate",
        Some(lo), Some(hi))
        .filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") <= lit(hi))
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D4)).cast("double").as("revenue"))
        .orderBy(col("month"))
    },
    Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <= TIMESTAMP '1996-12-31 23:59:59'
      GROUP BY 1 ORDER BY 1"""))

  def all: Seq[GraftQuery] = Seq(
    q1_agg, q2_join_agg, q3_multi_join, q4_topk, q5_distinct,
    q6_anti_join, q7_semi_join, q8_min_window, q9_event_batches,
    q10_md5_route, q11_db_slot, q12_window, q13_except, q14_string_agg,
    q15_sessions, q16_json, q17_monthly, q18_salted_join,
    q19_bucketed_join, q20_partition_prune, q21_asof_join,
    q22_range_join, q23_rollup, q24_pivot, q25_rolling, q26_cube,
    q27_intersect, q28_window_funcs, q29_exists, q30_grouping_sets,
    q31_lateral, q32_percentiles, q33_recursive, q34_zorder,
    q35_asof_forward, q36_overlap_join, q37_skip_scan, q38_validate)
}
