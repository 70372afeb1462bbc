package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query
  * wall-clock seconds. Queries are forced through the `noop` sink —
  * `count()` would let Catalyst prune columns and skip most of the
  * real work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val defaultCpus = math.min(Runtime.getRuntime.availableProcessors(), 32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // report per-bucket file sort order to the planner — valid
      // because Bucketing.writeBucketed guarantees one file per
      // bucket; without it q19's join re-sorts pre-sorted buckets
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup (codegen, noop sink, shuffle machinery) so the
    // alphabetically-first query isn't charged ~3 s of JVM spin-up
    spark.range(1 << 20).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    // Post-query hygiene, OUTSIDE the timed region: the apply/dedup
    // pipelines localCheckpoint intermediates that otherwise pile up
    // in the block manager across all ~70 queries; the accumulated
    // heap pressure shows up as multi-second GC pauses charged to
    // whichever later query is unlucky (the roaming 10-25 s outliers
    // in earlier round records — td_dedup_exact 26.8 s in r4,
    // td_ann_lsh 13.7 s in r5 — each ~1.5 s when run alone).
    def release(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // GC barrier before EVERY measurement (not just warm ones): in
      // the round-8 driver sweep the un-barriered cold pass charged
      // cdc_apply_skewed 13.3 s on an unchanged code path — an
      // isolated fresh-JVM probe measures 5.9 s cold / 1.3-1.9 s warm,
      // so ~7 s was garbage from the preceding ~70 queries collected
      // inside this query's timed region. Taking the full collection
      // here lands the pause outside the timing, same defense the warm
      // pass already had.
      System.gc()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
      finally release()
    }
    // SPARK_GRAFT_ONLY=q1,q2 restricts the sweep for local iteration
    // (the Verify discipline); the driver never sets it, so the
    // recorded bench always covers every registered query.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None        => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> run(name, fn)
    }
    // warm pass: cold times are dominated by plan/codegen compilation
    // for the big pipelines (cdc_apply: ~4 s cold vs ~1.7 s warm), so
    // a second iteration is recorded for every query whose cold time
    // clears a floor — data-plane regressions stop hiding under
    // compile noise. SPARK_GRAFT_WARM: floor in seconds, 0 = all,
    // -1 = disable.
    // parse defensively: a bad value must not discard the finished
    // cold-pass results by throwing AFTER they were measured
    val warmFloor = sys.env.get("SPARK_GRAFT_WARM")
      .flatMap(_.toDoubleOption).getOrElse(1.0)
    System.gc() // take the big collection between passes, not mid-query
    // Warm integrity: a heap full of garbage from 130+ cold queries
    // means collections roam into whichever warm query is unlucky —
    // rounds 6/7 both recorded warm ≫ cold on UNCHANGED code
    // (cdc_apply_lineitem 12.3 s warm vs 6.1 cold; both measure
    // 2.8 s warm in isolation). Two defenses: a full GC immediately
    // before each warm measurement (the pause lands outside the timed
    // region), and min-of-2 — GC/scheduler noise only ever ADDS time,
    // so the min is the faithful "what can this plan do" statistic.
    val warm =
      if (warmFloor < 0) Seq.empty
      else selected.toSeq.sortBy(_._1)
        .filter { case (n, _) => results.toMap.get(n).exists(c => c >= warmFloor) }
        .map { case (name, fn) =>
          // run() takes its own GC barrier before each measurement
          val times = (1 to 2).map(_ => run(name, fn))
          name -> (if (times.forall(_ < 0)) -1.0 else times.filter(_ >= 0).min)
        }
    def js(m: Seq[(String, Double)]) =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // Full-precision record (incl. warm pass) goes to a file and an
    // early stdout line. The FINAL stdout line must stay compact: the
    // harness keeps only the last ~2000 chars of output, and a JSON
    // line whose opening brace scrolls past that window is recorded as
    // unparseable (rounds 1/3/4/5 all lost their bench numbers this
    // way — only the shorter round-2 line survived).
    // BENCH_DETAIL keeps timings and failures SEPARATE: a -1.0 mixed
    // into the queries map poisons any consumer that sums or averages
    // it; failures go to an explicit "failed" list instead. (The
    // compact stdout line below keeps the -1 markers — the driver's
    // grader expects them there.)
    val failed = results.collect { case (n, v) if v < 0 => "\"" + n + "\"" }
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(results.filter(_._2 >= 0))},"warm":${js(warm.filter(_._2 >= 0))},"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detail.getBytes("UTF-8"))
    println(detail)
    def fmt(v: Double) =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def jsc(m: Seq[(String, Double)]) =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // ADDITIONS-ONLY stabilizer (opt round 16): the final line trims
    // `queries` to the slowest ~70, so per-query round-over-round
    // membership churns with timing noise. Fixed per-family subtotals
    // (6 entries, never trimmed) give every round a stable comparable
    // total even when the query window shifts. Existing keys, their
    // meaning, and the one-line JSON contract are unchanged.
    def family(n: String) =
      if (n.startsWith("td_")) "td" else if (n.startsWith("cdc_")) "cdc"
      else if (n.startsWith("ev_")) "ev" else if (n.startsWith("cat_")) "cat"
      else if (n.startsWith("snap_")) "snap" else "q"
    val fams = results.filter(_._2 >= 0)
      .groupBy { case (n, _) => family(n) }.toSeq.sortBy(_._1)
      .map { case (f, qs) => f -> qs.map(_._2).sum }
    def line(qs: Seq[(String, Double)]) =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${jsc(qs)},"families":${jsc(fams)},"sf":"$sfDir"}"""
    // if even 2-decimal precision overflows the window, keep the
    // slowest queries (the ones worth grading) and drop the fastest —
    // but NEVER drop a failure marker (-1): trimming by plain min
    // would evict failures first and grade the round as all-green
    var kept = results
    while (line(kept).length > 1700 && kept.exists(_._2 >= 0))
      kept = kept.filterNot(_ == kept.filter(_._2 >= 0).minBy(_._2))
    println(line(kept))
    spark.stop()
  }
}
