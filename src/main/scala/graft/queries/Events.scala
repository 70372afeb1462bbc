package graft.queries

import graft.{GraftQuery, Tables}
import graft.ops.EventAnalytics
import org.apache.spark.sql.functions._

/** Event-log analytics queries over the `events` fixture: funnel
  * progression, cohort retention, gap-filled time series
  * ([[graft.ops.EventAnalytics]]). Timestamps are compared as epoch
  * microseconds (BIGINT) — the engines agree on integer µs (Spark
  * truncates the fixture's nanos, DuckDB's EPOCH_US does the same),
  * so no float or sub-µs representation can split the hash. */
object Events {

  private val funnelSteps = Seq("view", "click", "purchase")

  /** Ordered funnel per user: earliest view → first click strictly
    * after it → first purchase strictly after that, the purchase
    * bounded to 7 days from the view (conversion window). One window
    * Exchange total; see [[EventAnalytics.funnel]]. */
  val ev_funnel = GraftQuery(
    "ev_funnel",
    (s, dir) => {
      EventAnalytics.funnel(Tables.events(s, dir), "user_id", "ts",
        "event_type", funnelSteps, windowSec = Some(7L * 86400))
        .select(col("user_id"),
          unix_micros(col("step_1_ts")).as("step_1_us"),
          unix_micros(col("step_2_ts")).as("step_2_us"),
          unix_micros(col("step_3_ts")).as("step_3_us"))
        .orderBy(col("user_id"))
    },
    Some("""WITH f AS (
        SELECT user_id, ts, event_type FROM events
        WHERE event_type IN ('view', 'click', 'purchase')),
      s1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
          OVER (PARTITION BY user_id) AS t1 FROM f),
      s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1
            AND EPOCH_US(ts) <= EPOCH_US(t1) + 604800000000 THEN ts END)
          OVER (PARTITION BY user_id) AS t2 FROM s1),
      s3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2
            AND EPOCH_US(ts) <= EPOCH_US(t1) + 604800000000 THEN ts END)
          OVER (PARTITION BY user_id) AS t3 FROM s2)
      SELECT DISTINCT user_id,
        EPOCH_US(t1) AS step_1_us, EPOCH_US(t2) AS step_2_us,
        EPOCH_US(t3) AS step_3_us
      FROM s3 WHERE t1 IS NOT NULL ORDER BY user_id"""))

  /** Funnel conversion summary — one row per step with the count of
    * users whose progression reached it. */
  val ev_funnel_counts = GraftQuery(
    "ev_funnel_counts",
    (s, dir) => {
      EventAnalytics.funnelCounts(Tables.events(s, dir), "user_id", "ts",
        "event_type", funnelSteps, windowSec = Some(7L * 86400))
        .orderBy(col("step"))
    },
    Some("""WITH f AS (
        SELECT user_id, ts, event_type FROM events
        WHERE event_type IN ('view', 'click', 'purchase')),
      s1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
          OVER (PARTITION BY user_id) AS t1 FROM f),
      s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1
            AND EPOCH_US(ts) <= EPOCH_US(t1) + 604800000000 THEN ts END)
          OVER (PARTITION BY user_id) AS t2 FROM s1),
      s3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2
            AND EPOCH_US(ts) <= EPOCH_US(t1) + 604800000000 THEN ts END)
          OVER (PARTITION BY user_id) AS t3 FROM s2),
      per AS (
        SELECT DISTINCT user_id, t1, t2, t3 FROM s3 WHERE t1 IS NOT NULL)
      SELECT 1 AS step, 'view' AS step_name, COUNT(t1) AS n_users FROM per
      UNION ALL
      SELECT 2, 'click', COUNT(t2) FROM per
      UNION ALL
      SELECT 3, 'purchase', COUNT(t3) FROM per
      ORDER BY step"""))

  /** Weekly cohort retention: users bucketed by the week (exact
    * 7-day epoch buckets) of their first event, counted distinct in
    * each later week of activity. */
  val ev_retention = GraftQuery(
    "ev_retention",
    (s, dir) => {
      EventAnalytics.retentionCohorts(Tables.events(s, dir), "user_id",
        "ts", periodSec = 7L * 86400)
        .orderBy(col("cohort_period"), col("period_offset"))
    },
    Some("""WITH fb AS (
        SELECT user_id,
          MIN(EPOCH_US(ts) // 604800000000) AS cohort_period
        FROM events GROUP BY user_id),
      act AS (
        SELECT e.user_id, fb.cohort_period,
          EPOCH_US(e.ts) // 604800000000 AS p
        FROM events e JOIN fb USING (user_id))
      SELECT cohort_period, p - cohort_period AS period_offset,
        COUNT(DISTINCT user_id) AS n_users
      FROM act GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** 6-hour-grid gap fill per user with forward-filled last observed
    * value (ties on event time broken by event_id — both engines
    * compare at integer µs). */
  val ev_gapfill = GraftQuery(
    "ev_gapfill",
    (s, dir) => {
      EventAnalytics.gapFillForwardFill(Tables.events(s, dir), "user_id",
        "ts", "value", "event_id", stepSec = 6L * 3600)
        .select(col("user_id"), unix_micros(col("slot_start")).as("slot_us"),
          col("n_events"), col("fill"))
        .orderBy(col("user_id"), col("slot_us"))
    },
    Some("""WITH ranked AS (
        SELECT user_id, EPOCH_US(ts) // 21600000000 AS slot, value,
          row_number() OVER (
            PARTITION BY user_id, EPOCH_US(ts) // 21600000000
            ORDER BY EPOCH_US(ts) DESC, event_id DESC) AS rn
        FROM events),
      obs AS (
        SELECT user_id, slot, COUNT(*) AS n_events,
          MAX(CASE WHEN rn = 1 THEN value END) AS slot_last
        FROM ranked GROUP BY 1, 2),
      bounds AS (
        SELECT user_id, MIN(slot) AS s0, MAX(slot) AS s1
        FROM obs GROUP BY user_id),
      grid AS (
        SELECT user_id, unnest(generate_series(s0, s1)) AS slot
        FROM bounds)
      SELECT g.user_id, g.slot * 21600000000 AS slot_us,
        COALESCE(o.n_events, 0) AS n_events,
        last_value(o.slot_last IGNORE NULLS) OVER (
          PARTITION BY g.user_id ORDER BY g.slot
          ROWS UNBOUNDED PRECEDING) AS fill
      FROM grid g LEFT JOIN obs o
        ON g.user_id = o.user_id AND g.slot = o.slot
      ORDER BY g.user_id, slot_us"""))

  /** Funnel WITHIN gap-based sessions — the two operators composed:
    * sessions assigned over the user's FULL activity (2-hour
    * gaps, q15's lag+cumsum shape), then the ordered
    * view→click→purchase progression evaluated per (user, session)
    * by the same cascaded-window funnel. Output: sessions per funnel
    * depth. One user-keyed exchange drives both the session
    * numbering and (after re-keying by session) the funnel windows. */
  val ev_session_funnel = GraftQuery(
    "ev_session_funnel",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wOrder = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sess = Tables.events(s, dir)
        .withColumn("new_session",
          when(unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(wOrder)) > 7200000000L, 1)
            .otherwise(0))
        .withColumn("sk",
          concat(col("user_id").cast("string"), lit("#"),
            sum(col("new_session")).over(
              wOrder.rowsBetween(Window.unboundedPreceding,
                Window.currentRow)).cast("string")))
      val per = EventAnalytics.funnel(sess, "sk", "ts", "event_type",
        funnelSteps)
      per.select(
        when(col("step_3_ts").isNotNull, 3)
          .when(col("step_2_ts").isNotNull, 2).otherwise(1).as("depth"))
        .groupBy(col("depth"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("depth"))
    },
    Some("""WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
          CASE WHEN EPOCH_US(ts) - EPOCH_US(lag(ts, 1) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id)) > 7200000000
               THEN 1 ELSE 0 END AS new_session
        FROM events),
      sess AS (
        SELECT user_id, ts, event_type,
          CAST(user_id AS VARCHAR) || '#' || CAST(
            SUM(new_session) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS VARCHAR)
            AS sk
        FROM flagged),
      f AS (SELECT * FROM sess
            WHERE event_type IN ('view', 'click', 'purchase')),
      s1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
          OVER (PARTITION BY sk) AS t1 FROM f),
      s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
          OVER (PARTITION BY sk) AS t2 FROM s1),
      s3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
          OVER (PARTITION BY sk) AS t3 FROM s2),
      per AS (
        SELECT DISTINCT sk, t1, t2, t3 FROM s3 WHERE t1 IS NOT NULL)
      SELECT CASE WHEN t3 IS NOT NULL THEN 3
                  WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS depth,
        COUNT(*) AS n_sessions
      FROM per GROUP BY 1 ORDER BY depth"""))

  /** Rolling 7-day distinct users per day, EXACT
    * ([[EventAnalytics.rollingDistinct]]): distinct (day, user)
    * pairs fan out to the window-ends they cover — never a
    * per-window rescan of the events. */
  val ev_rolling_distinct = GraftQuery(
    "ev_rolling_distinct",
    (s, dir) => {
      EventAnalytics.rollingDistinct(Tables.events(s, dir), "user_id",
        "ts", periodSec = 86400L, windowPeriods = 7)
        .orderBy(col("period"))
    },
    Some("""WITH pairs AS (
        SELECT DISTINCT EPOCH_US(ts) // 86400000000 AS p, user_id
        FROM events),
      present AS (SELECT DISTINCT p FROM pairs),
      fanned AS (
        SELECT p + x AS period, user_id
        FROM pairs CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS x))
      SELECT f.period, COUNT(DISTINCT f.user_id) AS n_distinct
      FROM fanned f JOIN present ON f.period = present.p
      GROUP BY 1 ORDER BY 1"""))

  /** The same rolling window as mergeable HLL state
    * ([[EventAnalytics.rollingDistinctHll]], p=6): per-day register
    * tables merged by element-wise max across the trailing week —
    * O(days·2^p) state instead of O(days·users). The register table
    * itself is deterministic and hash-matched cross-engine; the
    * approximate part (the cardinality readout) is spec-bounded. */
  val ev_rolling_distinct_hll = GraftQuery(
    "ev_rolling_distinct_hll",
    (s, dir) => {
      EventAnalytics.rollingDistinctHll(Tables.events(s, dir), "user_id",
        "ts", periodSec = 86400L, windowPeriods = 7, p = 6)
        .orderBy(col("period"), col("j"))
    },
    Some("""WITH d AS (
        SELECT EPOCH_US(ts) // 86400000000 AS p,
          ('0x'||substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT AS h
        FROM events),
      regs AS (
        SELECT p, h >> 54 AS j,
          MAX(CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0 THEN 55
                ELSE 55 - length(ltrim(bin(h & ((1::BIGINT << 54) - 1)),
                  '0')) END) AS rank
        FROM d GROUP BY 1, 2),
      present AS (SELECT DISTINCT p FROM regs),
      fanned AS (
        SELECT p + x AS period, j, rank
        FROM regs CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS x))
      SELECT f.period, f.j, MAX(f.rank) AS rank
      FROM fanned f JOIN present ON f.period = present.p
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Last-touch attribution: each purchase is credited to the latest
    * view/click by the same user within a 3-day lookback — the as-of
    * join ([[graft.ops.AsOfJoin]], one union + keyed window scan, no
    * θ-join blowup) with its tolerance mask doing the lookback;
    * purchases with no in-window touch land in channel 'none'.
    * Tolerance-as-post-mask is exact here because lookback eligibility
    * is monotone in the touch timestamp: if the NEAREST touch is
    * outside the window, every older one is too. Output per channel:
    * conversions, exact-decimal revenue, and total touch→purchase lag
    * (integer µs, so the hash can't split on float formatting). */
  val ev_attribution = GraftQuery(
    "ev_attribution",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val conv = ev.filter(col("event_type") === "purchase")
        .drop("event_type")
      val touch = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
      val lookbackUs = 3L * 86400 * 1000000
      graft.ops.AsOfJoin.asOf(conv, touch,
        keys = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
        rightVals = Seq("event_type", "ts"),
        tolerance = Some((l, r) =>
          unix_micros(l) - unix_micros(r) <= lookbackUs))
        .select(
          coalesce(col("event_type_asof"), lit("none")).as("channel"),
          col("value"),
          (unix_micros(col("ts")) - unix_micros(col("ts_asof")))
            .as("lag_us"))
        .groupBy(col("channel"))
        .agg(
          count(lit(1)).as("conversions"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("revenue"),
          sum(col("lag_us")).as("total_lag_us"))
        .orderBy(col("channel"))
    },
    Some("""WITH c AS (
        SELECT event_id, ts, user_id, value FROM events
        WHERE event_type = 'purchase'),
      t AS (
        SELECT user_id, ts AS t_ts, event_id AS t_id,
          event_type AS t_type
        FROM events WHERE event_type IN ('view', 'click')),
      j AS (
        SELECT c.event_id, c.value, c.ts, t.t_type, t.t_ts,
          row_number() OVER (PARTITION BY c.event_id
            ORDER BY t.t_ts DESC, t.t_id DESC) AS rn
        FROM c LEFT JOIN t
          ON c.user_id = t.user_id AND t.t_ts <= c.ts
          AND EPOCH_US(c.ts) - EPOCH_US(t.t_ts) <= 259200000000)
      SELECT COALESCE(t_type, 'none') AS channel,
        COUNT(*) AS conversions,
        CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        CAST(SUM(EPOCH_US(ts) - EPOCH_US(t_ts)) AS BIGINT) AS total_lag_us
      FROM j WHERE rn = 1 GROUP BY 1 ORDER BY 1"""))

  /** Top 3-step event paths ([[EventAnalytics.topPaths]]) — which
    * consecutive event-type sequences actually occur, the discovery
    * complement of the fixed-sequence funnel. Ties on event_id keep
    * the per-user ordering deterministic at equal timestamps. */
  val ev_paths = GraftQuery(
    "ev_paths",
    (s, dir) => {
      EventAnalytics.topPaths(Tables.events(s, dir), "user_id", "ts",
        "event_type", "event_id", n = 3, k = 10)
        .orderBy(col("n_paths").desc, col("path"))
    },
    Some("""WITH seq AS (
        SELECT event_type || ' > ' ||
            lead(event_type, 1) OVER w || ' > ' ||
            lead(event_type, 2) OVER w AS path,
          lead(event_type, 2) OVER w AS last2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT path, COUNT(*) AS n_paths FROM seq
      WHERE last2 IS NOT NULL
      GROUP BY path ORDER BY n_paths DESC, path LIMIT 10"""))

  /** Daily event-rate anomaly flags per event type: integer z-test
    * (n·x − S)² > k²·(n·Q − S²) over per-day counts — no float mean,
    * no sqrt, so the flag hash-matches any engine. Days with zero
    * events inside a type's observed span are gap-filled as cnt = 0
    * BEFORE the stats (a stopped producer emits no row — the fill is
    * what lets the rate-collapse flag fire at all). One shuffle to
    * (type, day) counts; the per-type stats broadcast back. */
  val ev_anomaly = GraftQuery(
    "ev_anomaly",
    (s, dir) => {
      EventAnalytics.rateAnomaly(Tables.events(s, dir), "event_type", "ts",
        periodSec = 86400L, kSigma = 2)
        .orderBy(col("event_type"), col("period"))
    },
    Some("""WITH d AS (
        SELECT event_type, EPOCH_US(ts) // 86400000000 AS period,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, MIN(period) AS pmin, MAX(period) AS pmax
        FROM d GROUP BY 1),
      grid AS (
        SELECT event_type, unnest(range(pmin, pmax + 1)) AS period
        FROM span),
      f AS (
        SELECT g.event_type, g.period, COALESCE(d.cnt, 0) AS cnt
        FROM grid g LEFT JOIN d
          ON d.event_type = g.event_type AND d.period = g.period),
      s AS (
        SELECT event_type, COUNT(*) AS n, SUM(cnt) AS s, SUM(cnt*cnt) AS q
        FROM f GROUP BY 1)
      SELECT f.event_type, f.period, CAST(f.cnt AS BIGINT) AS cnt,
        CASE WHEN (s.n*f.cnt - s.s)*(s.n*f.cnt - s.s) >
                  4*(s.n*s.q - s.s*s.s) THEN 1 ELSE 0 END AS anomalous
      FROM f JOIN s USING (event_type)
      ORDER BY event_type, period"""))

  /** [[ev_anomaly]] with an EXTERNAL-CLOCK horizon (2024-02-04, a
    * literal epoch) — the trailing-silence form: every producer in
    * the fixture is "dead" after 2024-01-30, so the horizon extends
    * each type's grid five zero-filled days past its last event and
    * the z-test flags the collapse the in-data grid cannot see (the
    * zeros also enter the mean/variance, exactly as a mid-span gap
    * does). In production the horizon is the trigger time; a literal
    * here keeps the query oracle-checkable. */
  val ev_anomaly_horizon = GraftQuery(
    "ev_anomaly_horizon",
    (s, dir) => {
      EventAnalytics.rateAnomaly(Tables.events(s, dir), "event_type", "ts",
        periodSec = 86400L, kSigma = 2, horizonSec = Some(1707004800L))
        .orderBy(col("event_type"), col("period"))
    },
    Some("""WITH d AS (
        SELECT event_type, EPOCH_US(ts) // 86400000000 AS period,
               COUNT(*) AS cnt
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      span AS (
        SELECT event_type, MIN(period) AS pmin,
               GREATEST(MAX(period), 1707004800 // 86400) AS pmax
        FROM d GROUP BY 1),
      grid AS (
        SELECT event_type, unnest(range(pmin, pmax + 1)) AS period
        FROM span),
      f AS (
        SELECT g.event_type, g.period, COALESCE(d.cnt, 0) AS cnt
        FROM grid g LEFT JOIN d
          ON d.event_type = g.event_type AND d.period = g.period),
      s AS (
        SELECT event_type, COUNT(*) AS n, SUM(cnt) AS s, SUM(cnt*cnt) AS q
        FROM f GROUP BY 1)
      SELECT f.event_type, f.period, CAST(f.cnt AS BIGINT) AS cnt,
        CASE WHEN (s.n*f.cnt - s.s)*(s.n*f.cnt - s.s) >
                  4*(s.n*s.q - s.s*s.s) THEN 1 ELSE 0 END AS anomalous
      FROM f JOIN s USING (event_type)
      ORDER BY event_type, period"""))

  /** Per-type CUSUM changepoint over daily counts
    * ([[graft.ops.EventAnalytics.changepoint]]): the level-shift
    * detector complementing [[ev_anomaly]]'s pointwise z-test —
    * n-scaled exact-integer cumulative deviation over the gap-filled
    * day grid, argmax with earliest-period tie-break, before/after
    * means as exact ppm. */
  val ev_changepoint = GraftQuery(
    "ev_changepoint",
    (s, dir) => {
      EventAnalytics.changepoint(Tables.events(s, dir), "event_type", "ts",
        periodSec = 86400L)
        .orderBy(col("event_type"))
    },
    Some("""WITH d AS (
        SELECT event_type, EPOCH_US(ts) // 86400000000 AS period,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2),
      span AS (
        SELECT event_type, MIN(period) AS pmin, MAX(period) AS pmax
        FROM d GROUP BY 1),
      grid AS (
        SELECT event_type, unnest(range(pmin, pmax + 1)) AS period
        FROM span),
      f AS (
        SELECT g.event_type, g.period, COALESCE(d.cnt, 0) AS cnt
        FROM grid g LEFT JOIN d
          ON d.event_type = g.event_type AND d.period = g.period),
      c AS (
        SELECT event_type, period,
          SUM(cnt) OVER (PARTITION BY event_type ORDER BY period) AS csum,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY period) AS idx,
          COUNT(*) OVER (PARTITION BY event_type) AS n,
          SUM(cnt) OVER (PARTITION BY event_type) AS s
        FROM f),
      sc AS (
        SELECT event_type, period, csum, idx, n, s,
          abs(n * csum - idx * s) AS dev,
          ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY abs(n * csum - idx * s) DESC, period) AS rk
        FROM c)
      SELECT event_type, period AS cp_period, CAST(dev AS BIGINT) AS dev,
        CAST(1000000 * csum // idx AS BIGINT) AS mean_before_ppm,
        CASE WHEN idx < n
          THEN CAST(1000000 * (s - csum) // (n - idx) AS BIGINT)
        END AS mean_after_ppm
      FROM sc WHERE rk = 1 ORDER BY event_type"""))

  /** [[ev_changepoint]] with the same external-clock horizon as
    * [[ev_anomaly_horizon]]: the five trailing zero-filled days pull
    * every type's maximum cumulative deviation to the end of the
    * observed data — the level shift IS the death of the producer,
    * and the cut lands at the silence onset instead of wherever the
    * in-data counts happened to wobble. */
  val ev_changepoint_horizon = GraftQuery(
    "ev_changepoint_horizon",
    (s, dir) => {
      EventAnalytics.changepoint(Tables.events(s, dir), "event_type", "ts",
        periodSec = 86400L, horizonSec = Some(1707004800L))
        .orderBy(col("event_type"))
    },
    Some("""WITH d AS (
        SELECT event_type, EPOCH_US(ts) // 86400000000 AS period,
               COUNT(*) AS cnt
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      span AS (
        SELECT event_type, MIN(period) AS pmin,
               GREATEST(MAX(period), 1707004800 // 86400) AS pmax
        FROM d GROUP BY 1),
      grid AS (
        SELECT event_type, unnest(range(pmin, pmax + 1)) AS period
        FROM span),
      f AS (
        SELECT g.event_type, g.period, COALESCE(d.cnt, 0) AS cnt
        FROM grid g LEFT JOIN d
          ON d.event_type = g.event_type AND d.period = g.period),
      c AS (
        SELECT event_type, period,
          SUM(cnt) OVER (PARTITION BY event_type ORDER BY period) AS csum,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY period) AS idx,
          COUNT(*) OVER (PARTITION BY event_type) AS n,
          SUM(cnt) OVER (PARTITION BY event_type) AS s
        FROM f),
      sc AS (
        SELECT event_type, period, csum, idx, n, s,
          abs(n * csum - idx * s) AS dev,
          ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY abs(n * csum - idx * s) DESC, period) AS rk
        FROM c)
      SELECT event_type, period AS cp_period, CAST(dev AS BIGINT) AS dev,
        CAST(1000000 * csum // idx AS BIGINT) AS mean_before_ppm,
        CASE WHEN idx < n
          THEN CAST(1000000 * (s - csum) // (n - idx) AS BIGINT)
        END AS mean_after_ppm
      FROM sc WHERE rk = 1 ORDER BY event_type"""))

  /** Weekly-seasonal rate anomaly
    * ([[graft.ops.EventAnalytics.seasonalAnomaly]]): per-type daily
    * counts differenced against the same weekday one week back, the
    * exact-integer z-test over the residuals — the detector for
    * cadenced load where the global test either false-flags every
    * weekend or hides a weekday collapse inside the inflated global
    * variance. First week per type reports NULL residuals (warm-up). */
  val ev_seasonal_anomaly = GraftQuery(
    "ev_seasonal_anomaly",
    (s, dir) => {
      EventAnalytics.seasonalAnomaly(Tables.events(s, dir), "event_type",
        "ts", periodSec = 86400L, seasonPeriods = 7, kSigma = 2)
        .orderBy(col("event_type"), col("period"))
    },
    Some("""WITH d AS (
        SELECT event_type, EPOCH_US(ts) // 86400000000 AS period,
               COUNT(*) AS cnt
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      span AS (
        SELECT event_type, MIN(period) AS pmin, MAX(period) AS pmax
        FROM d GROUP BY 1),
      grid AS (
        SELECT event_type, unnest(range(pmin, pmax + 1)) AS period
        FROM span),
      f AS (
        SELECT g.event_type, g.period, COALESCE(d.cnt, 0) AS cnt
        FROM grid g LEFT JOIN d
          ON d.event_type = g.event_type AND d.period = g.period),
      r AS (
        SELECT event_type, period, cnt,
          cnt - LAG(cnt, 7) OVER (
            PARTITION BY event_type ORDER BY period) AS residual
        FROM f),
      s AS (
        SELECT event_type, COUNT(*) AS n, SUM(residual) AS s,
               SUM(residual * residual) AS q
        FROM r WHERE residual IS NOT NULL GROUP BY 1)
      SELECT r.event_type, r.period, CAST(r.cnt AS BIGINT) AS cnt,
        CAST(r.residual AS BIGINT) AS residual,
        CASE WHEN r.residual IS NOT NULL AND
          (s.n*r.residual - s.s)*(s.n*r.residual - s.s) >
            4*(s.n*s.q - s.s*s.s) THEN 1 ELSE 0 END AS anomalous
      FROM r LEFT JOIN s USING (event_type)
      ORDER BY event_type, period"""))

  /** Nested-cadence anomaly
    * ([[graft.ops.EventAnalytics.multiSeasonalAnomaly]]): composed
    * seasonal differencing (1−B)(1−B⁷) over per-type daily counts —
    * first the day-over-day difference, then that residual against
    * itself one week back — z-tested exactly. The detector for load
    * with BOTH a daily trend and a weekly cadence, where any single
    * lag leaves the other cadence in the residuals inflating the
    * variance. First 8 periods per type are compound warm-up (NULL
    * residuals). */
  val ev_multi_seasonal = GraftQuery(
    "ev_multi_seasonal",
    (s, dir) => {
      EventAnalytics.multiSeasonalAnomaly(Tables.events(s, dir),
        "event_type", "ts", periodSec = 86400L,
        seasonPeriods = Seq(1, 7), kSigma = 2)
        .orderBy(col("event_type"), col("period"))
    },
    Some("""WITH d AS (
        SELECT event_type, EPOCH_US(ts) // 86400000000 AS period,
               COUNT(*) AS cnt
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      span AS (
        SELECT event_type, MIN(period) AS pmin, MAX(period) AS pmax
        FROM d GROUP BY 1),
      grid AS (
        SELECT event_type, unnest(range(pmin, pmax + 1)) AS period
        FROM span),
      f AS (
        SELECT g.event_type, g.period, COALESCE(d.cnt, 0) AS cnt
        FROM grid g LEFT JOIN d
          ON d.event_type = g.event_type AND d.period = g.period),
      r1 AS (
        SELECT event_type, period, cnt,
          cnt - LAG(cnt, 1) OVER (
            PARTITION BY event_type ORDER BY period) AS res1
        FROM f),
      r AS (
        SELECT event_type, period, cnt,
          res1 - LAG(res1, 7) OVER (
            PARTITION BY event_type ORDER BY period) AS residual
        FROM r1),
      s AS (
        SELECT event_type, COUNT(*) AS n, SUM(residual) AS s,
               SUM(residual * residual) AS q
        FROM r WHERE residual IS NOT NULL GROUP BY 1)
      SELECT r.event_type, r.period, CAST(r.cnt AS BIGINT) AS cnt,
        CAST(r.residual AS BIGINT) AS residual,
        CASE WHEN r.residual IS NOT NULL AND
          (s.n*r.residual - s.s)*(s.n*r.residual - s.s) >
            4*(s.n*s.q - s.s*s.s) THEN 1 ELSE 0 END AS anomalous
      FROM r LEFT JOIN s USING (event_type)
      ORDER BY event_type, period"""))

  /** Robust (median/MAD) rate anomaly
    * ([[graft.ops.EventAnalytics.robustAnomaly]]): percentile-disc
    * median and median-absolute-deviation over per-type daily counts,
    * flag |cnt − med| > k·MAD — the 50%-breakdown-point detector for
    * the masking failure of moment-based tests (one extreme spike
    * inflates σ until a simultaneous collapse never flags). Exact
    * integer end to end: both medians are rank-⌈n/2⌉ picks in
    * (value, period) order, the flag an integer compare. */
  val ev_robust_anomaly = GraftQuery(
    "ev_robust_anomaly",
    (s, dir) => {
      EventAnalytics.robustAnomaly(Tables.events(s, dir), "event_type",
        "ts", periodSec = 86400L, k = 2)
        .orderBy(col("event_type"), col("period"))
    },
    Some("""WITH d AS (
        SELECT event_type, EPOCH_US(ts) // 86400000000 AS period,
               COUNT(*) AS cnt
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
      span AS (
        SELECT event_type, MIN(period) AS pmin, MAX(period) AS pmax
        FROM d GROUP BY 1),
      grid AS (
        SELECT event_type, unnest(range(pmin, pmax + 1)) AS period
        FROM span),
      f AS (
        SELECT g.event_type, g.period, COALESCE(d.cnt, 0) AS cnt
        FROM grid g LEFT JOIN d
          ON d.event_type = g.event_type AND d.period = g.period),
      n AS (SELECT event_type, COUNT(*) AS n FROM f GROUP BY 1),
      rmed AS (
        SELECT event_type, period, cnt, ROW_NUMBER() OVER (
          PARTITION BY event_type ORDER BY cnt, period) AS rn
        FROM f),
      med AS (
        SELECT r.event_type, r.cnt AS med
        FROM rmed r JOIN n USING (event_type)
        WHERE r.rn = CEIL(n.n * 0.5)),
      ad AS (
        SELECT f.event_type, f.period, f.cnt, med.med,
          ABS(f.cnt - med.med) AS adv
        FROM f JOIN med USING (event_type)),
      rmad AS (
        SELECT event_type, period, adv, ROW_NUMBER() OVER (
          PARTITION BY event_type ORDER BY adv, period) AS rn
        FROM ad),
      mad AS (
        SELECT r.event_type, r.adv AS mad
        FROM rmad r JOIN n USING (event_type)
        WHERE r.rn = CEIL(n.n * 0.5))
      SELECT ad.event_type, ad.period, CAST(ad.cnt AS BIGINT) AS cnt,
        CAST(ad.med AS BIGINT) AS med, CAST(mad.mad AS BIGINT) AS mad,
        CASE WHEN ad.adv > 2 * mad.mad THEN 1 ELSE 0 END AS anomalous
      FROM ad JOIN mad USING (event_type)
      ORDER BY event_type, period"""))

  /** First-order Markov transition matrix over per-user event
    * sequences, probabilities as exact-integer PPM of each from-type's
    * outgoing total (`1 000 000·n div total` — hash-identical in any
    * engine). One entity-keyed exchange; the matrix itself is
    * ≤ |types|² rows. */
  val ev_markov = GraftQuery(
    "ev_markov",
    (s, dir) => {
      EventAnalytics.transitionMatrix(Tables.events(s, dir),
        "user_id", "ts", "event_type", "event_id")
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events),
      t AS (
        SELECT from_type, to_type, COUNT(*) AS n FROM seq
        WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        CAST(1000000 * n // SUM(n) OVER (PARTITION BY from_type)
             AS BIGINT) AS ppm
      FROM t ORDER BY from_type, to_type"""))

  /** Inter-arrival time profile
    * ([[graft.ops.EventAnalytics.interArrival]]): log₂ histogram of
    * same-user gaps per event type with exact-ppm shares — the
    * cadence fingerprint (bots spike in the 0–1 s buckets, humans in
    * the minutes decades) that picks session timeouts. One
    * entity-keyed exchange, map-side histogram collapse. */
  val ev_interarrival = GraftQuery(
    "ev_interarrival",
    (s, dir) => {
      graft.ops.EventAnalytics.interArrival(
          Tables.events(s, dir), "user_id", "ts", "event_type", "event_id")
        .orderBy(col("event_type"), col("bucket_s"))
    },
    Some("""WITH e AS (
        SELECT event_type, EPOCH_US(ts) AS us, user_id, event_id
        FROM events),
      g AS (
        SELECT event_type,
          (us - lag(us) OVER (
            PARTITION BY user_id ORDER BY us, event_id)) // 1000000
            AS gap
        FROM e),
      b AS (
        SELECT event_type,
          CASE WHEN gap <= 0 THEN 0 WHEN gap = 1 THEN 1
               ELSE CAST(1 AS BIGINT)
                 << length(bin(CAST(gap - 1 AS BIGINT))) END AS bucket_s
        FROM g WHERE gap IS NOT NULL),
      h AS (SELECT event_type, bucket_s, COUNT(*) AS n FROM b GROUP BY 1, 2),
      t AS (SELECT event_type, SUM(n) AS tot FROM h GROUP BY 1)
      SELECT h.event_type, CAST(h.bucket_s AS BIGINT) AS bucket_s, h.n,
        CAST(h.n * 1000000 // t.tot AS BIGINT) AS share_ppm
      FROM h JOIN t USING (event_type) ORDER BY event_type, bucket_s"""))

  def all: Seq[GraftQuery] = Seq(
    ev_funnel, ev_funnel_counts, ev_retention, ev_gapfill,
    ev_session_funnel, ev_rolling_distinct, ev_rolling_distinct_hll,
    ev_attribution, ev_paths, ev_anomaly, ev_anomaly_horizon,
    ev_changepoint, ev_changepoint_horizon, ev_seasonal_anomaly,
    ev_multi_seasonal, ev_robust_anomaly, ev_markov, ev_interarrival)
}
