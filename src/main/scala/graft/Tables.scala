package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries receive an `sfDir` (e.g. /root/testdata/sf0.01) and read
  * the parquet tables from it. Reads go through `spark.read.parquet`
  * so Catalyst pushes filters/pruning into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  /** Normalizes `events.ts` to `TimestampType` regardless of fixture
    * encoding. The driver has shipped two encodings so far:
    *   - parquet TIMESTAMP(NANOS) → Spark reads a Long (nanos) under
    *     `spark.sql.legacy.parquet.nanosAsLong`; the data is µs-precision,
    *     so `div 1000` is a lossless ns→µs conversion (integer division —
    *     a double roundtrip would corrupt int64 nanos).
    *   - parquet timestamp[us] with no UTC adjustment → Spark reads
    *     `TIMESTAMP_NTZ`; under the engine's UTC session timezone a cast
    *     to `TimestampType` is a lossless reinterpretation of the same
    *     µs value.
    * Downstream queries can then use `unix_micros(ts)` uniformly.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    val df = load(spark, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // the NTZ→TZ cast is only a lossless reinterpretation when the
        // session renders local time as UTC; any other zone silently
        // shifts every event timestamp and diverges from the oracle —
        // fail loudly instead
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "Tables.events requires spark.sql.session.timeZone=UTC to cast " +
            "TIMESTAMP_NTZ fixtures losslessly; got " +
            spark.conf.get("spark.sql.session.timeZone"))
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
