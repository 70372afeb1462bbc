package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators for the 100 TB path. Bucketing is the
  * pre-shuffle: pay the partition-by-key cost ONCE at write time, and
  * every later equi-join or aggregation on that key runs with no
  * exchange at all. For a fact table joined daily against the same
  * dimension key, this converts the cluster's dominant recurring
  * shuffle into a one-time layout decision.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table and
    * return it as read back through the catalog.
    *
    * The input is pre-repartitioned into exactly `buckets` partitions
    * on the key — `repartition(n, col)` and `bucketBy(n, col)` use the
    * same Murmur3-hash-mod-n placement, so every task holds exactly
    * one bucket's rows and each bucket lands in ONE sorted file.
    * That single-file property is what lets Spark's scan report both
    * the hash distribution AND the sort order, eliminating exchange
    * and sort on the join path (multi-file buckets would re-sort).
    */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
                    buckets: Int, key: String): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // the in-memory catalog forgets tables across JVMs but the
    // warehouse dir persists — clear it so saveAsTable never trips
    // over a stale location
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new Path(new Path(wh), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
    // session-keyed staging tables are never reused by another JVM
    // (the in-memory catalog dies with it) — reclaim the warehouse
    // dir on exit or every run leaks a table copy
    cleanupOnExit(loc.toUri.getPath)
    spark.table(table)
  }

  /** Partition-pruned staging: write `df` partitioned by `partCol`
    * under `dir` and read it back — a filter on `partCol` then prunes
    * directories at planning time (the scan never opens non-matching
    * files; at 100 TB this is the difference between reading one
    * partition and reading the fleet). */
  def writePartitioned(spark: SparkSession, df: DataFrame, dir: String,
                       partCol: String): DataFrame = {
    df.write.mode("overwrite").partitionBy(partCol).parquet(dir)
    // staging dirs are per-session (callers key them by applicationId
    // to stay race-free) — reclaim on JVM exit or every run leaks a
    // full table copy into tmp
    cleanupOnExit(dir)
    spark.read.parquet(dir)
  }

  /** Morton/Z code: interleave the low `bits` of two bucketed
    * dimensions (x even positions, y odd). Pure bitwise column
    * expression — codegen'd, no shuffle. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _) // disjoint bit positions: + ≡ OR

  /** Driver-side twin of [[zValue]] for prefix-cell enumeration. */
  private def zValueInt(x: Int, y: Int, bits: Int): Int =
    (0 until bits).map(i =>
      (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))).sum

  /** Quantize a numeric column into 2^bits equal-width rank buckets
    * over a KNOWN domain [minV, maxV] — layout-internal only (never
    * part of a query's visible result), values outside the domain
    * clamp into the edge buckets. */
  def rangeBucket(c: Column, minV: Double, maxV: Double, bits: Int): Column = {
    val n = 1 << bits
    least(lit(n - 1), greatest(lit(0),
      floor((c.cast("double") - lit(minV)) * n / (maxV - minV)).cast("int")))
  }

  /** Driver-side twin of [[rangeBucket]] — same double arithmetic, so
    * a predicate bound quantizes to exactly the bucket its rows got at
    * write time. */
  def rangeBucketValue(v: Double, minV: Double, maxV: Double, bits: Int): Int = {
    val n = 1 << bits
    math.min(n - 1, math.max(0,
      math.floor((v - minV) * n / (maxV - minV)).toInt))
  }

  /** Z-ordered staging layout: directory per z-prefix cell (the top
    * `prefixBitsPerDim` bits of each dimension, interleaved), rows
    * within each cell sorted by full z-value so parquet row-group
    * min/max stats stay tight on BOTH dimensions.
    *
    * Why this beats single-column layout at 100 TB: a 2-D box
    * predicate prunes to the ~(xRange·yRange) intersecting cells —
    * linear layouts prune on one dimension and scan the full stripe
    * of the other. This is the multi-dimension clustering technique
    * of Delta/Iceberg OPTIMIZE ZORDER, built from parts Spark
    * already has (partitioned dirs + range sort).
    */
  def writeZOrdered(spark: SparkSession, df: DataFrame, dir: String,
      xBucket: Column, yBucket: Column, bits: Int,
      prefixBitsPerDim: Int): DataFrame = {
    require(prefixBitsPerDim <= bits, "prefix cannot exceed bucket bits")
    val cell = zValue(
      shiftright(xBucket.cast("long"), bits - prefixBitsPerDim),
      shiftright(yBucket.cast("long"), bits - prefixBitsPerDim),
      prefixBitsPerDim)
    df.withColumn("z_cell", cell)
      .withColumn("z_val", zValue(xBucket, yBucket, bits))
      .repartition(col("z_cell"))
      .sortWithinPartitions(col("z_cell"), col("z_val"))
      .drop("z_val")
      .write.mode("overwrite").partitionBy("z_cell").parquet(dir)
    cleanupOnExit(dir)
    spark.read.parquet(dir)
  }

  /** The z-prefix cells a 2-D box intersects, given each dimension's
    * BUCKET range (inclusive, pre-quantized with the same `bits` as
    * the write). Attach as `col("z_cell").isin(zCellsForBox(...): _*)`
    * alongside the exact predicate: the isin prunes directories at
    * planning time, the exact predicate keeps semantics. */
  def zCellsForBox(xBuckets: (Int, Int), yBuckets: (Int, Int),
      bits: Int, prefixBitsPerDim: Int): Seq[Int] = {
    val s = bits - prefixBitsPerDim
    for {
      a <- (xBuckets._1 >> s) to (xBuckets._2 >> s)
      b <- (yBuckets._1 >> s) to (yBuckets._2 >> s)
    } yield zValueInt(a, b, prefixBitsPerDim)
  }

  /** Small-file compaction (the OPTIMIZE-compact maintenance op): a
    * staging dir accumulated by many micro-batches is rewritten into
    * `ceil(totalBytes / targetFileBytes)` files. At 100 TB the
    * small-file problem is a planner/namenode killer — every file is
    * a task and a listing entry; CDC sinks in particular append one
    * file per batch per bucket ([[graft.stream.BucketedPublish]])
    * and need periodic compaction to keep scans wide and listings
    * short. Coalesce (no shuffle) when shrinking file count.
    */
  def compact(spark: SparkSession, dir: String, outDir: String,
      targetFileBytes: Long): DataFrame = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(dir)
      .coalesce(nFiles)
      .write.mode("overwrite").parquet(outDir)
    cleanupOnExit(outDir)
    spark.read.parquet(outDir)
  }

  private val exitCleanup =
    scala.collection.mutable.LinkedHashSet.empty[String]
  /** Register a session-scoped staging dir for removal at JVM exit. */
  private[graft] def cleanupOnExit(dir: String): Unit = exitCleanup.synchronized {
    if (exitCleanup.isEmpty) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        exitCleanup.foreach { d =>
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(); ()
          }
          rm(new java.io.File(d))
        }))
    }
    exitCleanup += dir
    ()
  }
}
