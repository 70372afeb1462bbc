package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Planted-boilerplate skew probe for the winnowing df guard — the
  * experiment behind the round-15 de-windowing of the maxDf document-
  * frequency caps ([[graft.ops.Winnowing.winnowingPairs]] and
  * friends).
  *
  * One boilerplate preamble is prepended to 30% of documents, so a
  * handful of winnowing fingerprint hashes each occur in 30% of the
  * corpus — exactly the template-text hot key `maxDf` exists to drop.
  * The probe then evaluates the SAME rare-hash guard two ways:
  *
  *  - `window`: `count(*) OVER (PARTITION BY h)` — the pre-round-15
  *    shape. No partial aggregation, no AQE skew split: every
  *    occurrence of a hot hash must land in ONE task before the
  *    filter can drop it, so the guard's per-task max input grows
  *    linearly with corpus volume.
  *  - `agg`: `groupBy(h).count()` filtered and joined back — the
  *    shipped shape. The hot hash collapses map-side to one partial
  *    row per task; only hashes that SURVIVED the cap key the
  *    join-back, so no exchange ever carries a hot group.
  *
  * The probe emulates the cluster contract local[32] can't show
  * directly: shuffle partitions SCALE with volume (64·mult, the way a
  * real deployment holds per-task input constant as data grows) and
  * AQE partition COALESCING is off (at bench scale it merges every
  * small partition and hides per-key concentration; skew-split and
  * broadcast conversion stay ON — they are the mechanisms the agg
  * form banks on). Under that contract the signal is exactly the
  * verdict's: the agg form's max per-task input stays at the per-task
  * budget while the window form's hot task grows linearly with
  * volume — it alone must hold every occurrence of the planted hash.
  *
  * Reported per (volume multiplier × form): wall seconds, the result
  * row count (equal across forms — the guard is semantics-preserving)
  * and the max shuffle-read records of any single task.
  *
  * Runs at `SPARK_GRAFT_SF_DIR` (default sf0.1) with volume
  * multipliers from `SPARK_GRAFT_SKEW_MULTS` (default "1,10",
  * id-shifted tagged copies — the DocStreamBench scale discipline).
  * Prints one JSON line and writes SKEWBENCH_DETAIL.json.
  */
object SkewBench {

  private final class MaxShuffleListener extends SparkListener {
    val maxRecords = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null)
        maxRecords.updateAndGet(c =>
          math.max(c, m.shuffleReadMetrics.recordsRead))
    }
  }

  /** The pre-round-15 guard shape, kept HERE (bench-only) as the
    * degradation reference — ops code must never grow it back. */
  private def rareWindow(fp: DataFrame, maxDf: Int): DataFrame =
    fp.withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("df") <= maxDf)
      .select(col("id"), col("h"))

  /** The shipped guard shape ([[graft.ops.Winnowing.winnowingPairs]]). */
  private def rareAgg(fp: DataFrame, maxDf: Int): DataFrame = {
    val rareH = fp.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("h"))
    fp.join(rareH, Seq("h")).select(col("id"), col("h"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = sys.env.getOrElse("SPARK_GRAFT_SKEW_MULTS", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val maxDf = 64
    val defaultCpus = math.min(Runtime.getRuntime.availableProcessors(), 32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // diagnostic probe: coalescing would merge every small bench-
      // scale partition and hide per-key concentration; skew split
      // and broadcast conversion stay on
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()

    val boiler = (1 to 40).map(i => s"boilerplate$i").mkString(" ")

    def measure(body: => Long): (Double, Long, Long) = {
      val l = new MaxShuffleListener
      spark.sparkContext.addSparkListener(l)
      System.gc()
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // drain the async listener bus
      spark.sparkContext.removeSparkListener(l)
      (sec, rows, l.maxRecords.get())
    }

    val results = mults.map { mult =>
      // hold per-task input constant as volume grows — the cluster
      // contract: partitions scale with data
      spark.conf.set("spark.sql.shuffle.partitions", 64 * mult)
      val base = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val corpus = (0 until mult)
        .map(b => base.withColumn("doc_id",
          col("doc_id") + lit(b * 10000000L)))
        .reduce(_ unionByName _)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(10)) < 3,
            concat(lit(boiler + " "), col("text")))
            .otherwise(col("text")))
        .repartition(cpus.toInt)
      // materialize the fingerprints OUTSIDE both measured regions —
      // the probe times the guard stage only
      val fp = ops.TextAnalysis
        .winnowingFingerprints(corpus, "doc_id", "text", 4, 4)
        .select(col("id"), col("h")).distinct()
        .localCheckpoint(eager = true)
      val nFp = fp.count()

      val (aggSec, aggRows, aggMax) = measure(rareAgg(fp, maxDf).count())
      val (winSec, winRows, winMax) = measure(rareWindow(fp, maxDf).count())
      require(aggRows == winRows,
        s"guard forms disagree at mult=$mult: agg=$aggRows window=$winRows")
      fp.unpersist(blocking = true)
      f"""{"mult":$mult,"fp_rows":$nFp,"rare_rows":$aggRows,""" +
        f""""agg_sec":$aggSec%.3f,"agg_max_task_records":$aggMax,""" +
        f""""window_sec":$winSec%.3f,"window_max_task_records":$winMax}"""
    }

    val json =
      s"""{"metric":"skewbench_df_guard","sf_dir":${JsonUtil.quote(sfDir)},""" +
        s""""max_df":$maxDf,"runs":${results.mkString("[", ",", "]")}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SKEWBENCH_DETAIL.json"),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
