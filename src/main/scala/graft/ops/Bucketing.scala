package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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
