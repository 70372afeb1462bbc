package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.fixtures.SyntheticCdc
import graft.model.{SchemaRegistry, TableId, TableMeta}
import graft.stream.{CdcStreamEngine, TableStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Version-store lifecycle economics: the CDC apply loop run for
  * 100+ batches with [[TableStore.vacuum]] invoked IN-LOOP every
  * `vacuumEvery` batches — the band-index compaction discipline
  * ([[graft.stream.DocIngest.compactIndex]] windowed in-loop runs)
  * applied to the table store. Without vacuum, every batch leaves one
  * superseded `v=N` dir and the root grows O(batches); the claim to
  * measure is that in-loop vacuum holds the dir count at
  * ≈ keepHistory + vacuumEvery and costs O(dirs-reclaimed) amortized
  * per batch, independent of stream age.
  *
  * Drives [[CdcStreamEngine.processBatch]] directly (no streaming
  * trigger machinery — StreamBench owns that number; this one
  * isolates store lifecycle cost). Prints ONE JSON line and writes
  * the per-vacuum curve to VACUUMBENCH_DETAIL.json.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_VACUUM_BATCHES (default 120),
  * SPARK_GRAFT_VACUUM_EVERY (default 10, 0 = never — the control
  * run), SPARK_GRAFT_VACUUM_KEEP (default 3).
  */
object VacuumBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val nBatches = sys.env.get("SPARK_GRAFT_VACUUM_BATCHES")
      .flatMap(_.toIntOption).getOrElse(120)
    val vacuumEvery = sys.env.get("SPARK_GRAFT_VACUUM_EVERY")
      .flatMap(_.toIntOption).getOrElse(10)
    val keep = sys.env.get("SPARK_GRAFT_VACUUM_KEEP")
      .flatMap(_.toIntOption).getOrElse(3)
    val defaultCpus = math.min(Runtime.getRuntime.availableProcessors(), 32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tid = TableId("srcdb", "public", "customer")
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    val root = Files.createTempDirectory("graft-vbench-store-").toString
    val registry = new SchemaRegistry
    registry.register(TableMeta(tid, schema, Seq("c_custkey")))
    val store = new TableStore(spark, root)
    val cust = Tables.customer(spark, sfDir)
    store.stage(tid, cust, 0L)
    store.commit(Map(tid -> 0L))
    val custRows = cust.count()

    def versionDirs(): Int = {
      val td = Paths.get(root, tid.qualified)
      if (!Files.exists(td)) 0
      else {
        val s = Files.list(td)
        try s.iterator().asScala.count(_.getFileName.toString.startsWith("v="))
        finally s.close()
      }
    }

    // warmup (codegen, shuffle machinery) outside the measured loop
    spark.range(1 << 20).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    val engine = new CdcStreamEngine(spark, registry, store)

    val batchMs = Array.ofDim[Double](nBatches)
    val curve = scala.collection.mutable.Buffer.empty[String]
    var vacuumMsTotal = 0.0
    var removedTotal = 0
    var maxDirs = 0
    (1 to nBatches).foreach { b =>
      val events = SyntheticCdc.rollingLogOf(cust, b)
      val t0 = System.nanoTime()
      engine.processBatch(events, b.toLong)
      batchMs(b - 1) = (System.nanoTime() - t0) / 1e6
      maxDirs = math.max(maxDirs, versionDirs())
      if (vacuumEvery > 0 && b % vacuumEvery == 0) {
        val before = versionDirs()
        val tv = System.nanoTime()
        val removed = store.vacuum(keepHistory = keep)
        val ms = (System.nanoTime() - tv) / 1e6
        vacuumMsTotal += ms
        removedTotal += removed
        curve += s"""{"batch":$b,"dirs_before":$before,""" +
          s""""dirs_after":${versionDirs()},"removed":$removed,""" +
          s""""vacuum_ms":${ms.round}}"""
      }
    }

    // the store must still serve the exact steady-state result
    val fin = store.read(tid)
    val expCount = custRows + custRows / 10
    val balOk = fin.filter(
        pmod(col("c_custkey"), lit(1000000000L)) < 10000000L &&
        pmod(col("c_custkey"), lit(10)) =!= 4 &&
        col("c_acctbal") =!= nBatches.toDouble)
      .limit(1).count() == 0L
    val ok = fin.count() == expCount && balOk

    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val meanBatch = batchMs.sum / nBatches
    val line =
      s"""{"metric":"vacuum_amortized_ms_per_batch",""" +
        s""""value":${fmt(vacuumMsTotal / nBatches)},"unit":"ms",""" +
        s""""batches":$nBatches,"vacuum_every":$vacuumEvery,"keep":$keep,""" +
        s""""mean_batch_ms":${fmt(meanBatch)},""" +
        s""""vacuum_ms_total":${fmt(vacuumMsTotal)},""" +
        s""""dirs_removed":$removedTotal,"max_dirs":$maxDirs,""" +
        s""""dirs_end":${versionDirs()},"failed":${!ok},"sf":"$sfDir"}"""
    Files.write(Paths.get("VACUUMBENCH_DETAIL.json"),
      (curve :+ line).mkString("[", ",", "]").getBytes("UTF-8"))
    println(line)
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
