package graft

import java.sql.Timestamp

import graft.ops.EventAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

class EventAnalyticsSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private val base = 1700000000000L
  private def ts(sec: Long) = new Timestamp(base + sec * 1000)

  private def ev(rows: (Long, Long, String, Double)*) =
    rows.map { case (u, sec, t, v) => (u, ts(sec), t, v) }
      .toDF("user_id", "ts", "event_type", "value")

  test("funnel: strict ordering gates each step; unordered events don't advance") {
    val df = ev(
      (1, 0, "view", 0), (1, 10, "click", 0), (1, 20, "purchase", 0),
      // user 2 clicked BEFORE viewing: click must not count
      (2, 5, "click", 0), (2, 10, "view", 0), (2, 50, "purchase", 0),
      // user 3 never clicks
      (3, 0, "view", 0), (3, 99, "purchase", 0),
      // user 4 has no view at all → excluded entirely
      (4, 0, "purchase", 0))
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .select($"user_id", unix_micros($"step_1_ts"),
        unix_micros($"step_2_ts"), unix_micros($"step_3_ts"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def us(sec: Long) = Some((base + sec * 1000) * 1000)
    assert(out(1L) == ((us(0), us(10), us(20))))
    assert(out(2L) == ((us(10), None, None))) // click pre-view ignored
    assert(out(3L) == ((us(0), None, None)))
    assert(!out.contains(4L))
  }

  test("funnel: conversion window bounds later steps relative to step 1") {
    val df = ev(
      (1, 0, "view", 0), (1, 5, "click", 0), (1, 30, "purchase", 0),
      (2, 0, "view", 0), (2, 5, "click", 0), (2, 120, "purchase", 0))
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowSec = Some(60))
      .select($"user_id", unix_micros($"step_3_ts"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).isDefined)
    assert(out(2L).isEmpty) // purchase at +120 s falls outside the 60 s window
  }

  test("funnel: greedy earliest matching admits every user any matching admits") {
    // brute force: user reaches step k iff the steps appear as a
    // strictly-time-increasing subsequence — greedy earliest is optimal
    val rnd = new scala.util.Random(7)
    val types = Vector("view", "click", "purchase", "other")
    val rows = for {
      u <- 1L to 40L
      i <- 1 to 8
    } yield (u, rnd.nextInt(1000).toLong, types(rnd.nextInt(types.size)), 0.0)
    val df = ev(rows: _*)
    val reach = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .select($"user_id", unix_micros($"step_2_ts"), unix_micros($"step_3_ts"))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2.isDefined, r._3.isDefined))).toMap

    def exists(seq: Seq[(Long, String)], steps: List[String], after: Long): Boolean =
      steps match {
        case Nil => true
        case s :: rest =>
          seq.filter(e => e._2 == s && e._1 > after)
            .exists(e => exists(seq, rest, e._1))
      }
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, evs) =>
      val seq = evs.map(e => (e._2, e._3)).sortBy(_._1)
      val views = seq.filter(_._2 == "view")
      if (views.nonEmpty) {
        val start = views.map(_._1).min
        val c2 = exists(seq, List("click"), start)
        val c3 = exists(seq, List("click", "purchase"), start)
        assert(reach(u)._1 == c2, s"user $u step2: got ${reach(u)._1} want $c2")
        assert(reach(u)._2 == c3, s"user $u step3: got ${reach(u)._2} want $c3")
      } else assert(!reach.contains(u))
    }
  }

  test("retentionCohorts: first-period cohorts, offset-0 equals cohort size") {
    val p = 100L // 100 s periods
    val df = ev(
      (1, 10, "a", 0), (1, 150, "a", 0), (1, 350, "a", 0), // cohort 17*... period of base
      (2, 120, "a", 0), (2, 130, "a", 0),
      (3, 20, "a", 0), (3, 250, "a", 0))
    val out = EventAnalytics.retentionCohorts(df, "user_id", "ts", p)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val p0 = (base / 1000 + 10) / p // users 1 and 3 first-period bucket
    val p1 = (base / 1000 + 120) / p
    assert(p1 == p0 + 1)
    assert(out((p0, 0L)) == 2)      // users 1, 3 active in their cohort period
    assert(out((p0, 1L)) == 1)      // user 1 at +150 s
    assert(out((p0, 2L)) == 1)      // user 3 at +250 s
    assert(out((p0, 3L)) == 1)      // user 1 at +350 s
    assert(out((p1, 0L)) == 1)      // user 2's own cohort
    assert(!out.contains((p1, 1L)))
  }

  test("rollingDistinct ≡ brute force; HLL rolling registers ≡ merged per-day sketches") {
    import graft.ops.Sketches
    val rnd = new scala.util.Random(23)
    val day = 86400L
    // 40 users active on random days over 3 weeks
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(40).toLong + 1, rnd.nextInt(21).toLong * day + rnd.nextInt(1000), "e", 0.0)
    }
    val df = ev(rows: _*)
    val w = 7
    val exact = EventAnalytics.rollingDistinct(df, "user_id", "ts", day, w)
      .as[(Long, Long)].collect().toMap
    // brute force over the same integer day arithmetic
    val dayOf = (sec: Long) => (base / 1000 + sec) / day
    val pairs = rows.map(r => (dayOf(r._2), r._1)).distinct
    val present = pairs.map(_._1).distinct
    present.foreach { p =>
      val want = pairs.filter(x => x._1 >= p - (w - 1) && x._1 <= p).map(_._2).distinct.size
      assert(exact(p) == want.toLong, s"period $p")
    }
    assert(exact.keySet == present.toSet)

    val hll = EventAnalytics.rollingDistinctHll(df, "user_id", "ts", day, w, p = 6)
    val oneDay = present.max
    val mergedRows = hll.filter(col("period") === oneDay)
      .select("j", "rank").as[(Long, Int)].collect().toSeq.sorted
    val direct = Sketches.hllRegisters(
      pairs.filter(x => x._1 >= oneDay - (w - 1) && x._1 <= oneDay)
        .map(_._2.toString).distinct.toDF("k"), "k", 6)
      .as[(Long, Int)].collect().toSeq.sorted
    assert(mergedRows == direct)
    // the readout lands near the exact count (m=64 → σ≈13%; data is fixed)
    val est = Sketches.hllEstimate(
      hll.filter(col("period") === oneDay).select("j", "rank"), 6)
    val ex = exact(oneDay).toDouble
    assert(math.abs(est - ex) / ex < 0.5, s"est=$est exact=$ex")
  }

  test("topPaths: consecutive per-user sequences, incomplete tails dropped, ties on tieCol") {
    val df = Seq(
      // user 1: a → b → c → b  ⇒ trigrams "a>b>c", "b>c>b"
      (1L, 0L, 101L, "a"), (1L, 10L, 102L, "b"),
      (1L, 20L, 103L, "c"), (1L, 30L, 104L, "b"),
      // user 2: equal timestamps — event_id orders them: a → b → c
      (2L, 5L, 201L, "a"), (2L, 5L, 202L, "b"), (2L, 5L, 203L, "c"),
      // user 3: too short for any trigram
      (3L, 0L, 301L, "a"), (3L, 1L, 302L, "b"))
      .map { case (u, sec, id, t) => (u, ts(sec), id, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.topPaths(df, "user_id", "ts",
      "event_type", "event_id", n = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a > b > c", 2L), ("b > c > b", 1L)))
  }

  test("gapFillForwardFill: empty slots carry the last observation; ties break on tieCol") {
    val df = Seq(
      (1L, ts(0), "a", 10.0, 100L),
      (1L, ts(5), "a", 20.0, 101L),  // same slot as prior, later ts wins
      (1L, ts(95), "a", 40.0, 103L), // slot 3 (one empty slot gap at 1,2)
      (2L, ts(35), "a", 7.0, 104L),
      (2L, ts(35), "a", 9.0, 105L))  // identical ts: higher event_id wins
      .toDF("user_id", "ts", "event_type", "value", "event_id")
    val out = EventAnalytics.gapFillForwardFill(df, "user_id", "ts",
      "value", "event_id", stepSec = 30)
      .select($"user_id", unix_micros($"slot_start"), $"n_events", $"fill")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val slot0 = (base * 1000) / 30000000L * 30000000L
    def s(i: Long) = slot0 + i * 30000000L
    assert(out((1L, s(0))) == ((2L, 20.0)))
    assert(out((1L, s(1))) == ((0L, 20.0))) // gap: forward-filled
    assert(out((1L, s(2))) == ((0L, 20.0)))
    assert(out((1L, s(3))) == ((1L, 40.0)))
    assert(out((2L, s(1))) == ((2L, 9.0))) // tie on ts → event_id decides
    assert(out.size == 5)                  // each key spans only its own range
  }

  test("rateAnomaly: planted spike flagged, steady type stays clean") {
    // 10-second periods; type A runs 2/period for 9 periods then
    // spikes to 20 in period 9; type B is a constant 3/period
    val rows =
      (0 until 9).flatMap(p => Seq.fill(2)((1L, p * 10L, "A", 0.0))) ++
        Seq.fill(20)((1L, 90L, "A", 0.0)) ++
        (0 until 10).flatMap(p => Seq.fill(3)((1L, p * 10L, "B", 0.0)))
    val out = EventAnalytics.rateAnomaly(
        ev(rows.zipWithIndex.map { case ((u, sec, t, v), i) =>
          (u + i, sec, t, v) }: _*),
        "event_type", "ts", periodSec = 10L, kSigma = 2)
      .select($"event_type", $"cnt", $"anomalous")
      .as[(String, Long, Int)].collect()
    val aFlags = out.filter(_._1 == "A")
    assert(aFlags.count(_._3 == 1) == 1)
    assert(aFlags.find(_._3 == 1).get._2 == 20L) // the spike period only
    assert(out.filter(_._1 == "B").forall(_._3 == 0))
    // exact-integer form: mean 3.8, var 29.16 for A; the 2σ band is
    // (n·x−S)² > 4·(n·Q−S²) with n=10, S=38, Q=436 — period 9's
    // (200−38)² = 26244 > 4·(4360−1444) = 11664; periods at x=2 give
    // (20−38)² = 324 < 11664
    assert(aFlags.length == 10)
  }

  test("rateAnomaly: a silent period inside the span gap-fills to zero " +
      "and flags the rate collapse") {
    // type C: 5 events/period for periods 0–4 and 6–10, NOTHING in
    // period 5 — without gap-fill that period has no row at all and
    // the stopped producer is invisible. Filled: n=11, S=50, Q=250;
    // x=0 gives (0−50)² = 2500 > 4·(11·250−2500) = 1000 → flagged;
    // x=5 gives (55−50)² = 25 → clean.
    val rows = (0 to 10).filter(_ != 5)
      .flatMap(p => Seq.fill(5)((1L, p * 10L, "C", 0.0)))
    val out = EventAnalytics.rateAnomaly(
        ev(rows.zipWithIndex.map { case ((u, sec, t, v), i) =>
          (u + i, sec, t, v) }: _*),
        "event_type", "ts", periodSec = 10L, kSigma = 2)
      .select($"period", $"cnt", $"anomalous")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    val base = out.map(_._1).min // ev() offsets ts from a base epoch
    val rel = out.map { case (p, c, a) => (p - base, c, a) }
    assert(rel.length == 11, s"span must gap-fill to 11 periods: ${rel.length}")
    assert(rel(5) == ((5L, 0L, 1)), s"silent period must flag: ${rel(5)}")
    assert(rel.count(_._3 == 1) == 1)
  }

  test("changepoint: a halved steady rate z-tests clean but CUSUM-flags " +
      "at the shift boundary") {
    // type A: 4/period for periods 0-9, then 2/period for 10-19 — no
    // single period deviates 2 sigma (rateAnomaly stays silent), but
    // the cumulative deviation peaks exactly at the boundary.
    // n=20, S=60; at idx i<=10: csum=4i, D=|80i-60i|=20i → max at
    // i=10 (D=200, period 9); beyond: D=|20*(40+2(i-10))-60i|=|200-20(i-10)|
    // declines. mean_before = 1e6*40 div 10 = 4000000; after 2000000.
    val rows =
      (0 until 10).flatMap(p => Seq.fill(4)((1L, p * 10L, "A", 0.0))) ++
        (10 until 20).flatMap(p => Seq.fill(2)((1L, p * 10L, "A", 0.0)))
    val df = ev(rows.zipWithIndex.map { case ((u, sec, t, v), i) =>
      (u + i, sec, t, v) }: _*)
    val an = EventAnalytics.rateAnomaly(df, "event_type", "ts", 10L, 2)
      .select($"anomalous").as[Int].collect()
    assert(an.forall(_ == 0), "pointwise z-test must NOT fire on the shift")
    val cp = EventAnalytics.changepoint(df, "event_type", "ts", 10L)
      .select($"cp_period", $"dev", $"mean_before_ppm", $"mean_after_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(cp.length == 1)
    val basePeriod = cp.head._1 - 9 // period 9 relative to the ev() base
    assert(cp.head._2 == 200L, s"dev: ${cp.head}")
    assert(cp.head._3 == 4000000L && cp.head._4 == 2000000L, s"${cp.head}")
    assert(basePeriod * 10 >= 0) // shape sanity: cp sits at relative 9
  }

  test("changepoint ≡ brute CUSUM on random dense count sequences") {
    val rnd = new scala.util.Random(211)
    // three types, every period occupied (no gap-fill interaction),
    // counts 1..6 per period
    val types = Seq("P", "Q", "R")
    val perType = types.map { t =>
      t -> (0 until (8 + rnd.nextInt(8))).map(_ => 1 + rnd.nextInt(6))
    }.toMap
    val rows = perType.toSeq.flatMap { case (t, counts) =>
      counts.zipWithIndex.flatMap { case (c, p) =>
        Seq.fill(c)((1L, p * 10L, t, 0.0)) }
    }
    val df = ev(rows.zipWithIndex.map { case ((u, sec, t, v), i) =>
      (u + i, sec, t, v) }: _*)
    // every type starts at sec=0, so all share the same base period
    val pmin = df.select(
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.unix_micros($"ts") / 10000000L))
      .as[Long].collect().min
    val out = EventAnalytics.changepoint(df, "event_type", "ts",
        periodSec = 10L)
      .select($"event_type", $"cp_period", $"dev")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    perType.foreach { case (t, x) =>
      val n = x.length.toLong
      val s = x.sum.toLong
      val cs = x.scanLeft(0L)(_ + _).drop(1)
      val devs = cs.zipWithIndex.map { case (c, i) =>
        math.abs(n * c - (i + 1) * s) }
      // argmax with earliest-period tie-break
      val best = devs.zipWithIndex.maxBy { case (d, i) => (d, -i) }
      val (_, gotP, gotD) = out(t)
      assert(gotD == best._1, s"type $t dev: got $gotD want ${best._1}")
      assert(gotP - pmin == best._2,
        s"type $t cp: got ${gotP - pmin} want ${best._2}")
    }
  }

  test("changepoint: single-period type has zero dev and NULL after-mean") {
    val df = ev((1L, 0L, "X", 0.0), (2L, 1L, "X", 0.0))
    val cp = EventAnalytics.changepoint(df, "event_type", "ts", 10L)
      .select($"dev", $"mean_before_ppm", $"mean_after_ppm")
      .collect().head
    assert(cp.getLong(0) == 0L)
    assert(cp.getLong(1) == 2000000L) // 1e6 * 2 div 1
    assert(cp.isNullAt(2), "no after-segment at the last period")
  }

  test("rateAnomaly: external-clock horizon exposes trailing silence " +
      "the in-data grid cannot see") {
    // type D: 10/period for periods 0–11, then DEAD. The in-data span
    // ends at period 11, so without a horizon no zero row exists to
    // flag. Horizon at relative period 13 appends zero periods 12–13:
    // n=14, S=120, Q=1200; x=0 → S² = 14400 > 4·(14·1200−14400) =
    // 9600 → dead periods flag; x=10 → (140−120)² = 400 → clean.
    val rows = (0 until 12)
      .flatMap(p => Seq.fill(10)((1L, p * 10L, "D", 0.0)))
    val df = ev(rows.zipWithIndex.map { case ((u, sec, t, v), i) =>
      (u + i, sec, t, v) }: _*)
    val without = EventAnalytics.rateAnomaly(df, "event_type", "ts", 10L, 2)
    assert(without.count() == 12)
    assert(without.filter($"anomalous" === 1).count() == 0,
      "the dead producer must be invisible without an external clock")
    val out = EventAnalytics.rateAnomaly(df, "event_type", "ts", 10L, 2,
        horizonSec = Some(1700000000L + 130L))
      .select($"period", $"cnt", $"anomalous")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(out.length == 14, s"grid must extend to the horizon: ${out.length}")
    assert(out.takeRight(2).forall(r => r._2 == 0L && r._3 == 1),
      s"trailing silence must flag: ${out.takeRight(2).mkString(", ")}")
    assert(out.dropRight(2).forall(_._3 == 0))
  }

  test("changepoint: horizon pulls the cut to the silence onset") {
    val rows = (0 until 12)
      .flatMap(p => Seq.fill(10)((1L, p * 10L, "D", 0.0)))
    val df = ev(rows.zipWithIndex.map { case ((u, sec, t, v), i) =>
      (u + i, sec, t, v) }: _*)
    // constant counts without a horizon: every D_i = 0, dev = 0
    val flat = EventAnalytics.changepoint(df, "event_type", "ts", 10L)
      .select($"dev").as[Long].collect()
    assert(flat.sameElements(Array(0L)))
    // with the horizon: n=14, S=120; i ≤ 12 → D = |140i − 120i| = 20i,
    // max at i=12 (relative period 11, the last live period);
    // means: before 1e6·120 div 12, after 1e6·0 div 2 = 0
    val cp = EventAnalytics.changepoint(df, "event_type", "ts", 10L,
        horizonSec = Some(1700000000L + 130L))
      .select($"cp_period", $"dev", $"mean_before_ppm", $"mean_after_ppm")
      .as[(Long, Long, Long, Long)].collect().head
    assert(cp._1 == 170000000L + 11L, s"cut must land at silence onset: $cp")
    assert(cp._2 == 240L && cp._3 == 10000000L && cp._4 == 0L, s"$cp")
  }

  test("rateAnomaly: a horizon at or before the data max never truncates") {
    val rows = (0 until 8).flatMap(p => Seq.fill(3)((1L, p * 10L, "E", 0.0)))
    val df = ev(rows.zipWithIndex.map { case ((u, sec, t, v), i) =>
      (u + i, sec, t, v) }: _*)
    val plain = EventAnalytics.rateAnomaly(df, "event_type", "ts", 10L, 2)
      .collect().toSet
    val stale = EventAnalytics.rateAnomaly(df, "event_type", "ts", 10L, 2,
        horizonSec = Some(1700000000L)) // the data's own first second
      .collect().toSet
    assert(stale == plain, "a stale clock must be greatest-ed away")
  }

  test("rateAnomaly: NULL timestamps drop explicitly, not by join accident") {
    val withNull = Seq(
      (1L, Some(ts(0)), "N", 0.0), (2L, Some(ts(10)), "N", 0.0),
      (3L, None: Option[Timestamp], "N", 0.0))
      .toDF("user_id", "ts", "event_type", "value")
    val clean = withNull.filter($"ts".isNotNull)
    val a = EventAnalytics.rateAnomaly(withNull, "event_type", "ts", 10L, 2)
      .collect().toSet
    val b = EventAnalytics.rateAnomaly(clean, "event_type", "ts", 10L, 2)
      .collect().toSet
    assert(a == b && a.size == 2)
  }

  test("rateAnomaly/changepoint: a corrupt far-future timestamp fails " +
      "loudly instead of exploding the gap-fill grid") {
    // one outlier 3·10⁷ s out → 3·10⁶ ten-second periods, over the
    // default 10⁶ cap: the monitoring query must refuse, not OOM
    val df = ev((1L, 0L, "C", 0.0), (2L, 10L, "C", 0.0),
      (3L, 30000000L, "C", 0.0))
    val e = intercept[Exception] {
      EventAnalytics.rateAnomaly(df, "event_type", "ts", 10L, 2).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    assert(messages(e).contains("period span exceeds"), messages(e))
    val e2 = intercept[Exception] {
      EventAnalytics.changepoint(df, "event_type", "ts", 10L).collect()
    }
    assert(messages(e2).contains("period span exceeds"))
    // a raised cap runs it: the full grid, zeros in between
    val ok = EventAnalytics.rateAnomaly(df, "event_type", "ts", 10L, 2,
      maxSpanPeriods = 4000000L)
    assert(ok.count() == 3000001L)
  }

  test("seasonalAnomaly: a weekday collapsing to weekend levels flags " +
      "seasonally while the global z-test provably misses it") {
    // 4 weeks of weekly cadence at 10-second "days", season = 7:
    // weekdays 10/period, weekends (periods 5,6 of each week)
    // 2/period — except period 22 (a WEEK-4 weekday) collapses to 2.
    // Global z-test at k=2: n=28, S=208, Q=1936; x=2 → (56−208)² =
    // 23104 < 4·(28·1936−208²) = 43776 → never flags (weekend mass
    // inflates the global variance).
    // Seasonal residuals: all 0 except period 22's −8: n=21, S=−8,
    // Q=64; dev² = (21·(−8)−(−8))² = 25600 > 4·(21·64−64) = 5120 →
    // flagged; zero residuals give (0−(−8))² = 64 → clean.
    def cnt(p: Int): Int =
      if (p == 22) 2 else if (p % 7 >= 5) 2 else 10
    val rows = (0 until 28).flatMap(p =>
      Seq.fill(cnt(p))((1L, p * 10L, "W", 0.0)))
    val df = ev(rows.zipWithIndex.map { case ((u, sec, t, v), i) =>
      (u + i, sec, t, v) }: _*)
    val global = EventAnalytics.rateAnomaly(df, "event_type", "ts", 10L, 2)
      .filter($"anomalous" === 1).count()
    assert(global == 0, "the global z-test must miss the collapse")
    val out = EventAnalytics.seasonalAnomaly(df, "event_type", "ts", 10L,
        seasonPeriods = 7, kSigma = 2)
      .select($"period", $"residual", $"anomalous")
      .as[(Long, Option[Long], Int)].collect().sortBy(_._1)
    assert(out.length == 28)
    val base = out.map(_._1).min
    // warm-up week: NULL residuals, never anomalous
    assert(out.take(7).forall(r => r._2.isEmpty && r._3 == 0))
    val flagged = out.filter(_._3 == 1)
    assert(flagged.map(_._1 - base).toSeq == Seq(22L),
      s"only the violated weekday flags: ${flagged.mkString(", ")}")
    assert(flagged.head._2.contains(-8L))
    // the week AFTER the collapse: period 29 doesn't exist (28 periods),
    // but period 22+7 would residual +8 — out of range here by design
  }

  test("multiSeasonalAnomaly: a violation under NESTED cadences flags " +
      "only when both lags compose; either single lag provably misses it") {
    // 6 "weeks" of 7 ten-second periods with BOTH a 2-period (daily)
    // and a 7-period (weekly) additive cadence — coprime, so neither
    // single lag whitens the counts:
    //   cnt(p) = 10 + 9·[p even] + 12·[p mod 7 ∈ {4,5}] − 4·[p = 23]
    // lag-2 residuals keep the ±12 weekly edges (σ ≈ 9); lag-7
    // residuals keep the ±9 daily alternation (7 is odd); in both the
    // planted −4 drop at period 23 sits inside 2σ and never flags.
    // Composed (1−B²)(1−B⁷): residuals are EXACTLY 0 everywhere
    // except the violation's difference echoes ∓4 at {23, 25, 30, 32},
    // which all stand out of the near-zero variance.
    def cnt(p: Int): Int =
      10 + (if (p % 2 == 0) 9 else 0) +
        (if (p % 7 == 4 || p % 7 == 5) 12 else 0) -
        (if (p == 23) 4 else 0)
    val rows = (0 until 42).flatMap(p =>
      Seq.fill(cnt(p))((1L, p * 10L, "N", 0.0)))
    val df = ev(rows.zipWithIndex.map { case ((u, sec, t, v), i) =>
      (u + i, sec, t, v) }: _*)
    val base = EventAnalytics.seasonalAnomaly(df, "event_type", "ts", 10L,
        seasonPeriods = 2, kSigma = 2)
      .select($"period").as[Long].collect().min
    def flagged(out: org.apache.spark.sql.DataFrame): Seq[Long] =
      out.filter($"anomalous" === 1).select($"period")
        .as[Long].collect().map(_ - base).sorted.toSeq
    assert(flagged(EventAnalytics.seasonalAnomaly(df, "event_type", "ts",
      10L, seasonPeriods = 2, kSigma = 2)).isEmpty,
      "lag-2 alone must miss the violation (weekly edges inflate σ)")
    assert(flagged(EventAnalytics.seasonalAnomaly(df, "event_type", "ts",
      10L, seasonPeriods = 7, kSigma = 2)).isEmpty,
      "lag-7 alone must miss the violation (daily alternation inflates σ)")
    val multi = EventAnalytics.multiSeasonalAnomaly(df, "event_type", "ts",
      10L, seasonPeriods = Seq(2, 7), kSigma = 2)
    assert(flagged(multi) == Seq(23L, 25L, 30L, 32L),
      s"composed differencing must flag the violation and its echoes: " +
        s"${flagged(multi)}")
    // compound warm-up: first 2+7 periods NULL residual, never flagged
    val warm = multi.orderBy($"period")
      .select($"residual", $"anomalous").collect().take(9)
    assert(warm.forall(r => r.isNullAt(0) && r.getInt(1) == 0))
    // a clean twin (no violation) never false-flags under the multi
    // test — the composed residuals are identically zero
    val cleanRows = (0 until 42).flatMap(p =>
      Seq.fill(cnt(p) + (if (p == 23) 4 else 0))((1L, p * 10L, "N", 0.0)))
    val cleanDf = ev(cleanRows.zipWithIndex.map { case ((u, sec, t, v), i) =>
      (u + i, sec, t, v) }: _*)
    assert(flagged(EventAnalytics.multiSeasonalAnomaly(cleanDf,
      "event_type", "ts", 10L, Seq(2, 7), kSigma = 2)).isEmpty)
  }

  test("robustAnomaly: a spike that masks a collapse from the z-test " +
      "is powerless against median/MAD") {
    // 31 ten-second periods alternating 11/9 (wobble → MAD = 2), a
    // 500-count spike at period 5 and a collapse to 2 at period 20.
    // z-test at k=2: the spike inflates σ to ~86, so the collapse's
    // |2 − mean| ≈ 24 sits far inside 2σ — only the spike flags
    // (masking). Robust: med = 11, MAD = 2, threshold |r| > 4 →
    // flags exactly {5, 20}. (All values verified exactly outside
    // Spark first.)
    def cnt(p: Int): Int =
      if (p == 5) 500 else if (p == 20) 2
      else if (p % 2 == 0) 11 else 9
    val rows = (0 until 31).flatMap(p =>
      Seq.fill(cnt(p))((1L, p * 10L, "R", 0.0)))
    val df = ev(rows.zipWithIndex.map { case ((u, sec, t, v), i) =>
      (u + i, sec, t, v) }: _*)
    val base = EventAnalytics.rateAnomaly(df, "event_type", "ts", 10L, 2)
      .select($"period").as[Long].collect().min
    val zFlags = EventAnalytics.rateAnomaly(df, "event_type", "ts", 10L, 2)
      .filter($"anomalous" === 1).select($"period")
      .as[Long].collect().map(_ - base).sorted.toSeq
    assert(zFlags == Seq(5L), s"z-test must flag ONLY the spike: $zFlags")
    val robust = EventAnalytics.robustAnomaly(df, "event_type", "ts", 10L, 2)
    val rFlags = robust.filter($"anomalous" === 1).select($"period")
      .as[Long].collect().map(_ - base).sorted.toSeq
    assert(rFlags == Seq(5L, 20L),
      s"median/MAD must flag spike AND collapse: $rFlags")
    val stats = robust.select($"med", $"mad").distinct()
      .as[(Long, Long)].collect().toSeq
    assert(stats == Seq((11L, 2L)), s"med/mad: $stats")
    // register-fed twin: row-identical over pre-aggregated counts
    val counts = df.groupBy($"event_type",
        floor(unix_micros($"ts") / 10000000L).as("period"))
      .agg(count(lit(1)).as("cnt"))
    val viaCounts = EventAnalytics.robustAnomalyFromCounts(
      counts, "event_type", 2).collect().map(_.toSeq).toSet
    assert(viaCounts == robust.collect().map(_.toSeq).toSet)
  }

  test("seasonalAnomaly: type shorter than one season reports NULL " +
      "residuals and no flags") {
    val rows = (0 until 4).flatMap(p => Seq.fill(3)((1L, p * 10L, "S", 0.0)))
    val df = ev(rows.zipWithIndex.map { case ((u, sec, t, v), i) =>
      (u + i, sec, t, v) }: _*)
    val out = EventAnalytics.seasonalAnomaly(df, "event_type", "ts", 10L,
        seasonPeriods = 7, kSigma = 2)
      .select($"residual", $"anomalous")
      .collect()
    assert(out.length == 4)
    assert(out.forall(r => r.isNullAt(0) && r.getInt(1) == 0))
  }

  test("interArrival: gaps bucket to power-of-two seconds, shares exact") {
    // user 1: a@0, b@1 (gap 1 → bucket 1), a@4 (gap 3 → bucket 4),
    //         a@4 dup-second via event_id order (gap 0 → bucket 0)
    // user 2: b@100, b@105 (gap 5 → bucket 8)
    val df = Seq(
      (1L, 1L, ts(0), "a"), (2L, 1L, ts(1), "b"),
      (3L, 1L, ts(4), "a"), (4L, 1L, ts(4), "a"),
      (5L, 2L, ts(100), "b"), (6L, 2L, ts(105), "b"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = EventAnalytics.interArrival(df, "user_id", "ts",
        "event_type", "event_id")
      .orderBy("event_type", "bucket_s")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("a", 0L, 1L, 500000L), ("a", 4L, 1L, 500000L),
      ("b", 1L, 1L, 500000L), ("b", 8L, 1L, 500000L)), s"got $r")
  }
}
