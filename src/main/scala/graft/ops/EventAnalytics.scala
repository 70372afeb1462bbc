package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics beyond sessionization: ordered-funnel
  * progression, cohort retention, and time-grid gap filling — the
  * query shapes a user points an analytics engine at an append-only
  * event table for (the reference's events surface is its 30 s
  * replay cadence, `replayer/connemara_replay.pl:474-478`; these are
  * the reader-side analytics that table exists to serve).
  *
  * Scale discipline shared by all three: every op shuffles on the
  * entity key exactly once (funnel and gap-fill: one window
  * partition; retention: one agg + one keyed join), per-key state is
  * bounded by that key's own history, and nothing ever collects to
  * the driver.
  */
object EventAnalytics {

  /** Earliest strictly-ordered progression through `steps` per user:
    * step k's timestamp is the MIN event time of `steps(k)` that is
    * strictly after the user's step k-1 timestamp (greedy earliest
    * matching — the standard funnel semantics: matching the earliest
    * occurrence of each step never excludes a user that any other
    * matching would admit). A `windowSec` bound drops progressions
    * whose step-k time exceeds step-1 time + window (conversion
    * window).
    *
    * Plan shape: all step columns are unordered aggregates over ONE
    * window partitioned by `userCol` — a single Exchange + Sort
    * feeds every cascaded `min(when(...))`, then one row per user
    * survives a distinct. No self-joins, no per-step scans.
    *
    * @return one row per user that completed step 1: `userCol`,
    *         `step_1_ts .. step_n_ts` (null once progression stops)
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             windowSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
    // only step events feed the window — the filter reaches the scan
    val relevant = events.filter(col(typeCol).isin(steps: _*))
    val stepped = steps.zipWithIndex.foldLeft(relevant) {
      case (df, (step, i)) =>
        val prev = if (i == 0) lit(null) else col(s"step_${i}_ts")
        val after =
          if (i == 0) col(typeCol) === step
          else col(typeCol) === step && col(tsCol) > prev
        val bounded = windowSec match {
          case Some(sec) if i > 0 =>
            after && unix_micros(col(tsCol)) <=
              unix_micros(col("step_1_ts")) + sec * 1000000L
          case _ => after
        }
        df.withColumn(s"step_${i + 1}_ts",
          min(when(bounded, col(tsCol))).over(w))
    }
    stepped
      .select(col(userCol) +: steps.indices.map(i => col(s"step_${i + 1}_ts")): _*)
      .distinct()
      .filter(col("step_1_ts").isNotNull)
  }

  /** Funnel conversion summary: users reaching each step (a user
    * "reaches" step k when all of steps 1..k matched). Output is
    * `steps.length` rows — broadcast-small whatever the corpus. */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowSec: Option[Long] = None): DataFrame = {
    val per = funnel(events, userCol, tsCol, typeCol, steps, windowSec)
    val counts = per.agg(
      count(lit(1)).as("c1"),
      steps.indices.drop(1).map(i =>
        count(col(s"step_${i + 1}_ts")).as(s"c${i + 1}")): _*)
    // unpivot the single summary row into (step, step_name, n_users)
    val stacked = steps.indices.map(i =>
      struct(lit(i + 1).as("step"), lit(steps(i)).as("step_name"),
        col(s"c${i + 1}").as("n_users")))
    counts.select(explode(array(stacked: _*)).as("s"))
      .select(col("s.step"), col("s.step_name"), col("s.n_users"))
  }

  /** Cohort retention: users grouped by the period of their FIRST
    * event (cohort), counted as retained in each later period they
    * were active in. Periods are `periodSec`-wide buckets of event
    * time (exact integer arithmetic on epoch micros — floor division,
    * no calendar ambiguity cross-engine).
    *
    * Plan shape: first-event per user is one map-side-combinable MIN
    * agg; activity pairs are one keyed equi-join of events against
    * that per-user row (both sides hash on `userCol` — at 100 TB the
    * per-user side is |users| ≪ |events| and AQE may broadcast it);
    * the final distinct-count shuffles (cohort, offset, user) once.
    *
    * @return (cohort_period, period_offset, n_users) — offset 0 row
    *         is the cohort size
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
                       periodSec: Long): DataFrame = {
    val us = periodSec * 1000000L
    val period = (c: Column) => floor(unix_micros(c) / us)
    val firstByUser = events.groupBy(col(userCol))
      .agg(min(period(col(tsCol))).as("cohort_period"))
    events
      .select(col(userCol), period(col(tsCol)).as("p"))
      .join(firstByUser, userCol)
      .groupBy(col("cohort_period"),
        (col("p") - col("cohort_period")).as("period_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Exact trailing-window distinct keys per period (daily active
    * users over a rolling week, etc.). The input collapses FIRST to
    * distinct (period, key) pairs — one map-side-combinable dedup,
    * |periods·keys| ≪ |events| — then each pair fans out to the
    * `windowPeriods` window-ends it belongs to (narrow ×w explode)
    * and one distinct-count shuffle finishes. Periods absent from
    * the data get no row (a window end is only reported where
    * activity exists).
    *
    * At true 100 TB key cardinality even the pair grid can dominate —
    * that is what [[rollingDistinctHll]] is for: same window
    * semantics, fixed 2^p state per period.
    */
  def rollingDistinct(events: DataFrame, keyCol: String, tsCol: String,
                      periodSec: Long, windowPeriods: Int): DataFrame = {
    val us = periodSec * 1000000L
    val pairs = events
      .select(floor(unix_micros(col(tsCol)) / us).as("__p"),
        col(keyCol).as("__k"))
      .distinct()
    val present = pairs.select(col("__p").as("period")).distinct()
    pairs
      .select(explode(sequence(col("__p"),
        col("__p") + (windowPeriods - 1))).as("period"), col("__k"))
      .join(present, Seq("period"), "left_semi")
      .groupBy(col("period"))
      .agg(countDistinct(col("__k")).as("n_distinct"))
  }

  /** Trailing-window distinct via per-period HLL registers: each
    * period keeps a ≤ 2^p register table (map-side-combinable,
    * [[Sketches.hllRegistersBy]]), and a window's sketch is the
    * element-wise MAX of its periods' registers — the unionability
    * that makes rolling distinct O(periods · 2^p) state instead of
    * O(periods · keys). Registers are md5-derived and deterministic,
    * so the OUTPUT of this op is exact and cross-engine oracled; only
    * the final cardinality readout ([[Sketches.hllEstimate]]) is
    * approximate, within the published 1.04/√m.
    *
    * @return (period, j, rank) — the merged register table per
    *         window-end period
    */
  def rollingDistinctHll(events: DataFrame, keyCol: String, tsCol: String,
                         periodSec: Long, windowPeriods: Int,
                         p: Int): DataFrame = {
    val us = periodSec * 1000000L
    val keyed = events.select(
      floor(unix_micros(col(tsCol)) / us).as("__p"),
      col(keyCol).cast("string").as("__k"))
    val regs = Sketches.hllRegistersBy(keyed, Seq("__p"), "__k", p)
    val present = regs.select(col("__p").as("period")).distinct()
    regs
      .select(explode(sequence(col("__p"),
        col("__p") + (windowPeriods - 1))).as("period"),
        col("j"), col("rank"))
      .join(present, Seq("period"), "left_semi")
      .groupBy(col("period"), col("j"))
      .agg(max(col("rank")).as("rank"))
  }

  /** Gap-fill a per-key time series onto a regular `stepSec` grid,
    * carrying the last observation forward into empty slots. Each key
    * gets every grid slot between its own first and last event;
    * `fill` is the value of that key's most recent event at or before
    * the slot end (ties on event time broken by `tieCol`, so the
    * carried value is deterministic).
    *
    * Plan shape: the grid is built from one per-key MIN/MAX agg and
    * exploded (narrow after the agg — rows ≈ keys × slots, never
    * events × slots); observed last-values-per-slot come from one
    * `max_by` agg on (key, slot); the fill itself is a `last(...,
    * ignoreNulls)` running window over the SAME (key, slot-ordered)
    * partitioning the grid join just produced — one Exchange end to
    * end on the grid side.
    *
    * @return (key, slot_start timestamp, n_events in slot, fill)
    */
  def gapFillForwardFill(events: DataFrame, keyCol: String, tsCol: String,
                         valueCol: String, tieCol: String,
                         stepSec: Long): DataFrame = {
    val us = stepSec * 1000000L
    val slot = (c: Column) => floor(unix_micros(c) / us)
    val grid = events.groupBy(col(keyCol))
      .agg(min(slot(col(tsCol))).as("s0"), max(slot(col(tsCol))).as("s1"))
      .select(col(keyCol),
        explode(sequence(col("s0"), col("s1"))).as("slot"))
    val observed = events
      .groupBy(col(keyCol), slot(col(tsCol)).as("slot"))
      .agg(
        count(lit(1)).as("n_events"),
        max_by(col(valueCol),
          struct(col(tsCol), col(tieCol))).as("slot_last"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed, Seq(keyCol, "slot"), "left")
      .select(
        col(keyCol),
        timestamp_micros(col("slot") * us).as("slot_start"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("slot_last"), ignoreNulls = true).over(w).as("fill"))
  }

  /** Top event-type paths of length `n`: the DISCOVERY sibling of
    * [[funnel]] — a funnel measures one fixed step sequence, this
    * surfaces which consecutive sequences actually occur. A path is
    * `n` consecutive events of the same entity in event-time order
    * (ties on `tieCol`, so the sequence is deterministic under equal
    * timestamps).
    *
    * Plan shape: all `lead` columns share ONE window partitioned by
    * the entity (single Exchange + Sort), incomplete tails drop with
    * a null check on the furthest lead, and the path count is a
    * map-side-combinable aggregate over at most |types|^n keys. The
    * per-entity event list is never materialized (no collect_list —
    * the shape that OOMs on a hot entity at 100 TB).
    *
    * @return top `k` rows of (path, n_paths), count desc / path asc
    */
  def topPaths(events: DataFrame, entityCol: String, tsCol: String,
               typeCol: String, tieCol: String, n: Int,
               k: Int): DataFrame = {
    require(n >= 2, "a path needs at least two steps")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    val steps = (1 until n).map(i => lead(col(typeCol), i).over(w))
    events
      .withColumn("__path",
        concat_ws(" > ", (col(typeCol) +: steps): _*))
      // the furthest lead is null iff the window runs off the
      // entity's tail; nearer leads cannot be null when it isn't
      .withColumn("__last", steps.last)
      .filter(col("__last").isNotNull)
      .groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path"))
      .limit(k)
  }

  /** First-order Markov transition matrix over per-entity event
    * sequences: count consecutive (from → to) type pairs (ordered by
    * `tsCol`, ties broken by `tieCol` so the pairing is
    * deterministic), and report each transition's probability as
    * integer PPM of its from-type's outgoing total — exact arithmetic
    * (`1 000 000·n div total`), so the matrix hash-matches any engine.
    *
    * Plan shape: ONE entity-keyed exchange feeds the `lead` window;
    * pair counts collapse to ≤ |types|² rows, and the per-from total
    * is a window over that tiny set — the event table never shuffles
    * twice.
    *
    * @return (from_type, to_type, n, ppm)
    */
  def transitionMatrix(events: DataFrame, entityCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("__to", lead(col(typeCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__to").as("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("__total",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("ppm", expr("(1000000 * n) div __total"))
      .drop("__total")
  }

  /** (type, period, cnt) with every period in each type's observed
    * [min, max] span present — zero-count periods gap-filled. Shared
    * by [[rateAnomaly]] and [[changepoint]]; see rateAnomaly's
    * scaladoc for why the fill is load-bearing.
    *
    * Events with a NULL timestamp are dropped EXPLICITLY up front:
    * they carry no period, so no grid placement exists for them —
    * without the filter they would silently vanish in the grid join
    * anyway (a (type, NULL) count row matches no grid row), so the
    * filter makes the drop intentional and visible rather than an
    * accident of join semantics.
    *
    * `horizonSec` (epoch seconds from an EXTERNAL clock — the trigger
    * time, not the data) extends each type's grid forward to that
    * period: a producer dead since its own max period emits no row at
    * all past it, so without an external horizon its trailing silence
    * is invisible (the in-data span ends where the data ends). With
    * the horizon, the silent tail gap-fills to zeros and the
    * downstream stats flag it. The horizon only ever EXTENDS (it is
    * `greatest`-ed with the observed max), so a stale clock can't
    * truncate real data.
    *
    * `maxSpanPeriods` guards the grid explode: one corrupt timestamp
    * (epoch 0, far future) would otherwise inflate a type's
    * `sequence(pmin, pmax)` to billions of rows and OOM a monitoring
    * query that must be robust to dirty data. A type whose span
    * exceeds the cap fails LOUDLY inside the plan (raise_error naming
    * the type) — clamping would silently hide the corrupt region. */
  private def filledPeriodCounts(events: DataFrame, typeCol: String,
      tsCol: String, periodSec: Long, horizonSec: Option[Long],
      maxSpanPeriods: Long): DataFrame = {
    val us = periodSec * 1000000L
    val counts = events
      .filter(col(tsCol).isNotNull)
      .groupBy(col(typeCol), floor(unix_micros(col(tsCol)) / us).as("period"))
      .agg(count(lit(1)).as("cnt"))
    gapFilledCounts(counts, typeCol,
      horizonSec.map(h => Math.floorDiv(h * 1000000L, us)), maxSpanPeriods,
      caller = "filledPeriodCounts")
  }

  /** The grid layer under [[filledPeriodCounts]], factored so
    * PRE-AGGREGATED (type, period, cnt) counts — e.g. the streaming
    * monitor's merge-on-read registers
    * ([[graft.stream.EventStreams.rateMonitor]]) — enter the same
    * gap-fill + guard machinery without a raw-event pass. Horizon is
    * already in period units here. `caller` names the PUBLIC entry
    * point in the span-guard raise_error, so an operator debugging a
    * streaming monitor that tripped the guard is pointed at the
    * function they actually called, not this internal layer. */
  private[graft] def gapFilledCounts(counts0: DataFrame, typeCol: String,
      horizonPeriod: Option[Long], maxSpanPeriods: Long,
      caller: String = "gapFilledCounts"): DataFrame = {
    require(maxSpanPeriods > 0, "maxSpanPeriods must be positive")
    // feeds the span agg AND the left join — avoid the two-branch
    // recompute of the counts aggregation
    val counts = counts0.localCheckpoint(eager = false)
    val spans = counts.groupBy(col(typeCol))
      .agg(min(col("period")).as("__pmin"), max(col("period")).as("__pmax"))
    val pmax = horizonPeriod
      .map(hp => greatest(col("__pmax"), lit(hp)))
      .getOrElse(col("__pmax"))
    val guardedMin = when(
      pmax - col("__pmin") >= lit(maxSpanPeriods),
      raise_error(concat(
        lit(s"$caller: period span exceeds $maxSpanPeriods " +
          "for type "), col(typeCol).cast("string"),
        lit(" — corrupt timestamps? (outlier periods inflate the " +
          "gap-fill grid; filter them or raise maxSpanPeriods)"))
      ).cast("long")).otherwise(col("__pmin"))
    spans
      .select(col(typeCol),
        explode(sequence(guardedMin, pmax)).as("period"))
      .join(counts, Seq(typeCol, "period"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
  }

  /** Event-rate anomaly gate: bucket events per (`typeCol`, period of
    * `periodSec`), then flag periods whose count sits more than
    * `kSigma` standard deviations from that type's own mean — the
    * monitoring query an operator runs over an ingest/event table to
    * catch a stuck producer (rate collapse) or a runaway one (spike).
    *
    * Periods with ZERO events inside a type's observed [min, max]
    * span are gap-filled (sequence over the span, counts coalesced
    * to 0) BEFORE the stats aggregate — a producer that stops
    * mid-span emits no (type, period) row at all, so without the
    * fill the collapse would never be flagged and the absent periods
    * would bias the mean/variance toward the active ones. Trailing
    * silence (a producer dead since its own max period) is closed by
    * `horizonSec`: pass the CURRENT external clock (trigger time,
    * epoch seconds) and every type's grid extends to that period, so
    * the dead tail fills with zeros and flags like any mid-span
    * collapse. Without a horizon the span ends where the data ends —
    * the in-data grid cannot see past its own last event.
    *
    * Events with NULL `tsCol` are dropped (explicitly — see
    * [[filledPeriodCounts]]); a type whose period span exceeds
    * `maxSpanPeriods` (corrupt epoch-0/far-future timestamps) fails
    * loudly instead of exploding the grid.
    *
    * Exact integer arithmetic end to end (the md5-sibling discipline):
    * with n periods, per-period count x, S = Σx, Q = Σx², the z-test
    *   (x − S/n)² > k²·(Q/n − (S/n)²)
    * multiplies through by n² to the integer form
    *   (n·x − S)² > k²·(n·Q − S²)
    * so the flag is hash-identical in any engine — no float mean, no
    * sqrt. Magnitudes: n·x and S are ≤ |events|, so the squares stay
    * under 2⁶³ for anything < ~3·10⁹ events per type; at 100 TB run it
    * per partition-window, not over all history (n is the number of
    * periods either way, and the per-type stats row is 3 integers).
    *
    * Plan shape: one shuffle to (type, period) counts; the gap-fill
    * explodes ≤ span/periodSec rows per type from a |types|-row span
    * agg (bounded by wall-clock range, not |events|) and left-joins
    * the counts; the per-type stats agg (rows = |types|) broadcasts
    * back — the event table itself never shuffles twice and nothing
    * collects.
    *
    * @return (`typeCol`, period, cnt, anomalous 1/0) — one row per
    *         period in each type's observed span, zeros included
    */
  def rateAnomaly(events: DataFrame, typeCol: String, tsCol: String,
                  periodSec: Long, kSigma: Int,
                  horizonSec: Option[Long] = None,
                  maxSpanPeriods: Long = 1000000L): DataFrame =
    zFlag(filledPeriodCounts(events, typeCol, tsCol, periodSec,
      horizonSec, maxSpanPeriods), typeCol, kSigma)

  /** [[rateAnomaly]] over PRE-AGGREGATED (typeCol, period, cnt)
    * counts — the entry point for callers that maintain period counts
    * incrementally instead of holding raw events (the streaming
    * monitor's additive registers,
    * [[graft.stream.EventStreams.rateMonitorView]]): identical
    * gap-fill, horizon (already in period units), span guard, and
    * exact-integer z-test, so the view over merged registers is
    * row-identical to the batch op over the concatenated event log
    * (spec-pinned). Duplicate (type, period) rows are the caller's
    * bug — sum them before calling. */
  def rateAnomalyFromCounts(counts: DataFrame, typeCol: String,
      kSigma: Int, horizonPeriod: Option[Long] = None,
      maxSpanPeriods: Long = 1000000L): DataFrame =
    zFlag(gapFilledCounts(counts, typeCol, horizonPeriod, maxSpanPeriods,
      caller = "rateAnomalyFromCounts"), typeCol, kSigma)

  /** The exact-integer z-test over a gap-filled grid — shared by the
    * raw-event and pre-aggregated entry points. */
  private def zFlag(full: DataFrame, typeCol: String,
      kSigma: Int): DataFrame = {
    val stats = full.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("q"))
    val dev = col("n") * col("cnt") - col("s")
    full.join(broadcast(stats), Seq(typeCol))
      .select(col(typeCol), col("period"), col("cnt"),
        when(dev * dev > lit(kSigma.toLong * kSigma) *
          (col("n") * col("q") - col("s") * col("s")), lit(1))
          .otherwise(lit(0)).as("anomalous"))
  }

  /** Offline CUSUM changepoint per event type — the LEVEL-SHIFT
    * detector [[rateAnomaly]]'s pointwise z-test cannot see: a
    * producer that halves its steady rate never deviates kσ in any
    * single period, but its cumulative deviation from the global
    * mean grows linearly. Over the gap-filled period counts
    * (x₁ … x_n, total S), the classic statistic
    *   C_i = Σ_{j≤i} x_j − i·S/n
    * is evaluated in the n-scaled integer form
    *   D_i = n·Σ_{j≤i} x_j − i·S
    * and the changepoint is the period maximizing |D_i| (tie →
    * earliest period) — exact arithmetic, hash-identical in any
    * engine. Magnitudes (no squares here, unlike [[rateAnomaly]]'s
    * z-form): |D_i| ≤ n·S, so the statistic holds while
    * periods·events < 2⁶³ per type (e.g. 10⁹ events over 10⁹
    * periods); the TIGHTER bound is the ppm means — 10⁶·S must stay
    * under 2⁶³, so S < ~9·10¹² events per type; run per retention
    * window beyond that (n is the window's period count either way).
    * Reported means before/after the cut are exact integer ppm.
    *
    * `horizonSec`/`maxSpanPeriods` behave as in [[rateAnomaly]]: an
    * external-clock horizon extends each grid so a producer dead
    * since its last event shows the level shift (the cut lands at the
    * silence onset), NULL timestamps drop explicitly, and a
    * span-cap guard fails loudly on corrupt-timestamp grids.
    *
    * Plan shape: one shuffle to (type, period) counts (shared with
    * the gap-fill), ONE type-keyed window pass for the cumulative
    * sums (rows ∝ |types|·|periods|, already tiny), and a |types|-row
    * argmax via one more window rank — nothing collects.
    *
    * @return (`typeCol`, cp_period, dev, mean_before_ppm,
    *         mean_after_ppm) — one row per type; dev = max |D_i|;
    *         mean_after_ppm is NULL when the max lands on the last
    *         period (no "after" segment)
    */
  def changepoint(events: DataFrame, typeCol: String, tsCol: String,
                  periodSec: Long, horizonSec: Option[Long] = None,
                  maxSpanPeriods: Long = 1000000L): DataFrame =
    cusumFlag(filledPeriodCounts(events, typeCol, tsCol, periodSec,
      horizonSec, maxSpanPeriods), typeCol)

  /** [[changepoint]] over PRE-AGGREGATED (typeCol, period, cnt)
    * counts — the register-fed entry point (the
    * [[rateAnomalyFromCounts]] contract: duplicates summed upstream,
    * horizon already in period units). Lets ONE streaming register
    * family ([[graft.stream.EventStreams.rateMonitor]]) feed every
    * detector: z-test, CUSUM, and seasonal. */
  def changepointFromCounts(counts: DataFrame, typeCol: String,
      horizonPeriod: Option[Long] = None,
      maxSpanPeriods: Long = 1000000L): DataFrame =
    cusumFlag(gapFilledCounts(counts, typeCol, horizonPeriod,
      maxSpanPeriods, caller = "changepointFromCounts"), typeCol)

  private def cusumFlag(full: DataFrame, typeCol: String): DataFrame = {
    val byType = Window.partitionBy(col(typeCol))
    val ordered = byType.orderBy(col("period"))
    val scored = full
      .withColumn("csum", sum(col("cnt")).over(
        ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("idx", row_number().over(ordered))
      .withColumn("n", count(lit(1)).over(byType))
      .withColumn("s", sum(col("cnt")).over(byType))
      .withColumn("dev",
        abs(col("n") * col("csum") - col("idx") * col("s")))
    scored
      .withColumn("rk", row_number().over(
        byType.orderBy(col("dev").desc, col("period"))))
      .filter(col("rk") === 1)
      .select(col(typeCol), col("period").as("cp_period"), col("dev"),
        expr("1000000 * csum div idx").as("mean_before_ppm"),
        when(col("idx") < col("n"),
          expr("1000000 * (s - csum) div (n - idx)"))
          .as("mean_after_ppm"))
  }

  /** SEASONAL rate anomaly — the periodic-pattern complement of
    * [[rateAnomaly]]'s global z-test: residual r_t = cnt_t −
    * cnt_{t−seasonPeriods} against the SAME period one season back,
    * flagged when (n·r − S)² > k²·(n·Q − S²) over the residual
    * population (n residuals, S = Σr, Q = Σr²) — the exact-integer
    * z-form of [[rateAnomaly]] applied to seasonal differences.
    * This is the detector for load with a built-in cadence: under a
    * weekly pattern the global test either false-flags every weekend
    * or (worse) hides a weekday collapsing to weekend levels inside
    * the inflated global variance; seasonal residuals are ≈ 0
    * everywhere except genuine pattern violations, so the collapse
    * stands k·σ out (spec-pinned: a planted weekday-at-weekend-level
    * day that the global z-test provably misses).
    *
    * The gap-filled grid ([[filledPeriodCounts]] — same NULL-drop,
    * horizon, and span-guard semantics as [[rateAnomaly]]) is what
    * makes `lag(seasonPeriods)` the TRUE seasonal predecessor: with
    * zero-count periods absent, lag would skip silently across gaps
    * and compare unrelated periods. The first `seasonPeriods` periods
    * of each type have no predecessor — they report a NULL residual
    * and never flag (warm-up, not data).
    *
    * Plan shape: [[filledPeriodCounts]]' one event shuffle; the lag
    * and the |types|-row residual stats ride the same type-keyed
    * partitioning; stats broadcast back. Magnitudes: |r| ≤ max count,
    * so the z-form holds to the same ~3·10⁹ events/type bound as
    * [[rateAnomaly]].
    *
    * @return (`typeCol`, period, cnt, residual, anomalous) — residual
    *         NULL (and anomalous 0) for each type's first
    *         seasonPeriods periods
    */
  def seasonalAnomaly(events: DataFrame, typeCol: String, tsCol: String,
      periodSec: Long, seasonPeriods: Int, kSigma: Int,
      horizonSec: Option[Long] = None,
      maxSpanPeriods: Long = 1000000L): DataFrame = {
    require(seasonPeriods > 0, "seasonPeriods must be positive")
    seasonalFlag(filledPeriodCounts(events, typeCol, tsCol, periodSec,
      horizonSec, maxSpanPeriods), typeCol, seasonPeriods, kSigma)
  }

  /** [[seasonalAnomaly]] over PRE-AGGREGATED (typeCol, period, cnt)
    * counts — the register-fed entry point (the
    * [[rateAnomalyFromCounts]] contract). */
  def seasonalAnomalyFromCounts(counts: DataFrame, typeCol: String,
      seasonPeriods: Int, kSigma: Int,
      horizonPeriod: Option[Long] = None,
      maxSpanPeriods: Long = 1000000L): DataFrame = {
    require(seasonPeriods > 0, "seasonPeriods must be positive")
    seasonalFlag(gapFilledCounts(counts, typeCol, horizonPeriod,
      maxSpanPeriods, caller = "seasonalAnomalyFromCounts"), typeCol,
      seasonPeriods, kSigma)
  }

  private def seasonalFlag(full: DataFrame, typeCol: String,
      seasonPeriods: Int, kSigma: Int): DataFrame =
    multiSeasonalFlag(full, typeCol, Seq(seasonPeriods), kSigma)

  /** MULTI-season rate anomaly — nested cadences (a daily pattern
    * inside a weekly one), which a single seasonal lag cannot
    * whiten: lag-one-day residuals still carry the weekly bumps
    * (every weekend flags, or the inflated variance hides a real
    * violation), while lag-one-week residuals are blind to daily-
    * cadence breaks. The classic fix is COMPOSED seasonal
    * differencing (Box–Jenkins): apply (1−B^s₁)(1−B^s₂)… to the
    * gap-filled counts — each pass subtracts the value one season
    * back of the PREVIOUS pass's residual — and z-test the final
    * residual, which is ≈ 0 under every declared cadence at once.
    * The single-season [[seasonalAnomaly]] is the `Seq(s)` case.
    *
    * Warm-up: each pass loses its first `sᵢ` periods per type, so
    * the first `Σ sᵢ` periods report NULL residuals and never flag.
    * A one-period violation at t echoes (sign-flipped) at t+sᵢ —
    * inherent to differencing; read flags within one compound season
    * of a known incident accordingly (same caveat as the single-lag
    * form, compounded).
    *
    * Plan shape: unchanged from [[seasonalAnomaly]] — every lag pass
    * rides the SAME type-keyed sort the first one pays (one
    * WindowExec, |lags| lag expressions), |types|-row stats broadcast
    * back.
    *
    * @return (`typeCol`, period, cnt, residual, anomalous) — residual
    *         NULL (anomalous 0) for each type's first Σ seasonPeriods
    *         periods
    */
  def multiSeasonalAnomaly(events: DataFrame, typeCol: String,
      tsCol: String, periodSec: Long, seasonPeriods: Seq[Int],
      kSigma: Int, horizonSec: Option[Long] = None,
      maxSpanPeriods: Long = 1000000L): DataFrame = {
    require(seasonPeriods.nonEmpty && seasonPeriods.forall(_ > 0),
      "seasonPeriods must be non-empty and positive")
    multiSeasonalFlag(filledPeriodCounts(events, typeCol, tsCol,
      periodSec, horizonSec, maxSpanPeriods), typeCol, seasonPeriods,
      kSigma)
  }

  /** [[multiSeasonalAnomaly]] over PRE-AGGREGATED (typeCol, period,
    * cnt) counts — the register-fed entry point (the
    * [[rateAnomalyFromCounts]] contract). */
  def multiSeasonalAnomalyFromCounts(counts: DataFrame, typeCol: String,
      seasonPeriods: Seq[Int], kSigma: Int,
      horizonPeriod: Option[Long] = None,
      maxSpanPeriods: Long = 1000000L): DataFrame = {
    require(seasonPeriods.nonEmpty && seasonPeriods.forall(_ > 0),
      "seasonPeriods must be non-empty and positive")
    multiSeasonalFlag(gapFilledCounts(counts, typeCol, horizonPeriod,
      maxSpanPeriods, caller = "multiSeasonalAnomalyFromCounts"),
      typeCol, seasonPeriods, kSigma)
  }

  /** ROBUST rate anomaly — median/MAD in place of mean/σ, the
    * detector for the masking failure both moment-based tests share:
    * ONE extreme spike inflates the variance (z-test) and drags the
    * global mean (CUSUM) so far that a simultaneous genuine collapse
    * sits inside the widened tolerance and never flags. Median and
    * MAD have a 50% breakdown point: up to half the periods can be
    * arbitrarily corrupt and the location/scale estimates don't move,
    * so the collapse stands out regardless of how large the spike is
    * (spec-pinned: a planted spike that provably masks a collapse
    * from the k=2 z-test).
    *
    * Exact integer end to end: median is percentile-disc (the value
    * at 1-based rank ⌈n/2⌉ in (cnt, period) order — same definition
    * as [[graft.ops.Sampling.discreteQuantiles]]), MAD is the same
    * rank over |cnt − med|, and the flag is
    * `|cnt − med| > k·MAD` — integer compares, hash-identical in any
    * engine. MAD = 0 (more than half the periods at the median)
    * flags EVERY deviating period: under a constant baseline any
    * deviation is signal; pair with the z-test when counts are noisy
    * and deviations routine.
    *
    * Same gap-fill/NULL-drop/horizon/span-guard semantics as
    * [[rateAnomaly]]. Plan shape: the grid's one event shuffle; both
    * ranking passes and the |types|-row median/MAD aggregates ride
    * the SAME type-keyed partitioning (grid rows ∝ types·periods,
    * already bounded by `maxSpanPeriods`); the two tiny stats frames
    * broadcast back.
    *
    * @return (`typeCol`, period, cnt, med, mad, anomalous)
    */
  def robustAnomaly(events: DataFrame, typeCol: String, tsCol: String,
      periodSec: Long, k: Int, horizonSec: Option[Long] = None,
      maxSpanPeriods: Long = 1000000L): DataFrame =
    robustFlag(filledPeriodCounts(events, typeCol, tsCol, periodSec,
      horizonSec, maxSpanPeriods), typeCol, k)

  /** [[robustAnomaly]] over PRE-AGGREGATED (typeCol, period, cnt)
    * counts — the register-fed entry point (the
    * [[rateAnomalyFromCounts]] contract). */
  def robustAnomalyFromCounts(counts: DataFrame, typeCol: String,
      k: Int, horizonPeriod: Option[Long] = None,
      maxSpanPeriods: Long = 1000000L): DataFrame =
    robustFlag(gapFilledCounts(counts, typeCol, horizonPeriod,
      maxSpanPeriods, caller = "robustAnomalyFromCounts"), typeCol, k)

  private def robustFlag(full: DataFrame, typeCol: String,
      k: Int): DataFrame = {
    // percentile-disc at p=0.5 over the grid: rank in (value, period)
    // order, pick rank ceil(n/2). Grid rows are bounded by
    // types·maxSpanPeriods, so the type-keyed windows here are the
    // same bounded shape every detector in this family rides.
    val n = full.groupBy(col(typeCol)).agg(count(lit(1)).as("__n"))
    val medRank = ceil(col("__n").cast("decimal(20,0)") *
      lit(new java.math.BigDecimal("0.5")).cast("decimal(10,4)"))
    val byCnt = Window.partitionBy(col(typeCol))
      .orderBy(col("cnt"), col("period"))
    val med = full
      .withColumn("__rn", row_number().over(byCnt))
      .join(broadcast(n), Seq(typeCol))
      .filter(col("__rn") === medRank)
      .select(col(typeCol), col("cnt").as("med"))
    val withRes = full.join(broadcast(med), Seq(typeCol))
      .withColumn("__ad", abs(col("cnt") - col("med")))
    val byAd = Window.partitionBy(col(typeCol))
      .orderBy(col("__ad"), col("period"))
    val mad = withRes
      .withColumn("__rn", row_number().over(byAd))
      .join(broadcast(n), Seq(typeCol))
      .filter(col("__rn") === medRank)
      .select(col(typeCol), col("__ad").as("mad"))
    withRes.join(broadcast(mad), Seq(typeCol))
      .select(col(typeCol), col("period"), col("cnt"), col("med"),
        col("mad"),
        when(col("__ad") > lit(k.toLong) * col("mad"), lit(1))
          .otherwise(lit(0)).as("anomalous"))
  }

  private def multiSeasonalFlag(full: DataFrame, typeCol: String,
      seasonPeriods: Seq[Int], kSigma: Int): DataFrame = {
    val byType = Window.partitionBy(col(typeCol)).orderBy(col("period"))
    // composed differencing, one pass per lag (window functions can't
    // nest in one projection): every pass shares the one type-keyed
    // sort, so the extra Window operators add no exchange and no
    // re-sort. A NULL from one pass's warm-up propagates through the
    // next — exactly the compound warm-up contract.
    val withRes = seasonPeriods.foldLeft(
        full.withColumn("residual", col("cnt"))) { (df, s) =>
      df.withColumn("residual",
        col("residual") - lag(col("residual"), s).over(byType))
    }
    val stats = withRes.filter(col("residual").isNotNull)
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n"), sum(col("residual")).as("s"),
        sum(col("residual") * col("residual")).as("q"))
    val dev = col("n") * col("residual") - col("s")
    // left join: a type shorter than the compound season has NO
    // residuals and no stats row — its periods still report (with
    // NULL residuals)
    withRes.join(broadcast(stats), Seq(typeCol), "left")
      .select(col(typeCol), col("period"), col("cnt"), col("residual"),
        when(col("residual").isNotNull &&
          dev * dev > lit(kSigma.toLong * kSigma) *
            (col("n") * col("q") - col("s") * col("s")), lit(1))
          .otherwise(lit(0)).as("anomalous"))
  }

  /** Inter-arrival time profile per event type — a power-of-two
    * (log₂) histogram of the gap, in seconds, between consecutive
    * events of the same entity, attributed to the LATER event's type:
    * the latency fingerprint that separates human cadence
    * (seconds–minutes buckets) from bots/batch jobs (sub-second
    * spikes, metronome buckets) and feeds session-timeout choice.
    * Bucket = smallest power of two ≥ gap (0 and 1 s are their own
    * buckets) — exact integer arithmetic end to end, so the whole
    * histogram is oracle-checkable.
    *
    * Scale shape: ONE entity-keyed exchange feeds the lag window
    * (the [[EventAnalytics]] family's shape); gaps collapse map-side
    * to ≤ |types|·64 histogram rows, and the per-type total for the
    * share joins back from that tiny aggregate — raw events shuffle
    * exactly once.
    *
    * @return (event_type, bucket_s, n, share_ppm) — share_ppm =
    *         n·10⁶ div type total.
    */
  def interArrival(events: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    val byEntity = Window.partitionBy(col(entityCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    val gaps = events
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(byEntity))
      .filter(col("__prev").isNotNull)
      .withColumn("g",
        ((unix_micros(col(tsCol)) - col("__prev")) / lit(1000000L))
          .cast("long"))
      .withColumn("bucket_s",
        when(col("g") <= 0, lit(0L))
          .when(col("g") === 1, lit(1L))
          .otherwise(expr("shiftleft(1L, length(bin(g - 1)))")))
    val hist = gaps.groupBy(col(typeCol).as("event_type"), col("bucket_s"))
      .agg(count(lit(1)).as("n"))
    val totals = hist.groupBy(col("event_type"))
      .agg(sum(col("n")).as("tot"))
    hist.join(totals, Seq("event_type"))
      .select(col("event_type"), col("bucket_s"), col("n"),
        expr("n * 1000000 div tot").as("share_ppm"))
  }
}
