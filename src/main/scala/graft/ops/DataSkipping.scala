package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping — the Delta/Iceberg "data skipping
  * statistics" technique built from Spark + parquet parts.
  *
  * Parquet footers already carry per-row-group min/max/null-count for
  * every column; this module lifts them into a tiny per-file manifest
  * (written once, next to the data, under a `_`-prefixed dir Spark's
  * listing ignores), and a pruned read path intersects a range
  * predicate with the manifest so non-matching files are never opened.
  * Combined with a range-clustered layout ([[writeWithStats]] sorts by
  * the stats column so each file owns a tight slice), a selective scan
  * touches O(selectivity · files) instead of every file — at 100 TB
  * this is the difference between reading one day's files and listing
  * and opening the whole corpus. The manifest itself is built by a
  * DISTRIBUTED footer sweep (one task per file batch, footer-only
  * reads — no data pages), so stats collection is O(#files) metadata
  * I/O spread over the cluster, not a second full scan.
  *
  * Correctness discipline: pruning decisions can only ever KEEP a file
  * that an exact evaluation would exclude, never drop one it needs —
  * files with absent/unusable stats (unsupported physical type,
  * non-ASCII binary bounds where byte order and string order diverge)
  * are kept unconditionally, and callers re-apply the exact predicate
  * on the surviving rows. Reference analog: the snapshot scan's
  * ctid-range partitioning (connemara_python/connemara/restore.py)
  * slices a table so workers touch disjoint ranges; here the slices
  * are files and the ranges are column values.
  */
object DataSkipping {

  /** Per-(file, column) statistics row. `kind` selects the populated
    * slot pair: "long" | "double" | "string"; "none" = stats unusable
    * (file must be kept). Min/max are None for an all-null file.
    * `logical` records the parquet logical type (e.g. timestamp unit)
    * so predicate bounds quantize identically at prune time. */
  final case class FileColumnStats(
      file: String,
      column: String,
      kind: String,
      logical: String,
      minLong: Option[Long],
      maxLong: Option[Long],
      minDouble: Option[Double],
      maxDouble: Option[Double],
      minString: Option[String],
      maxString: Option[String],
      nullCount: Long,
      rowCount: Long)

  private val statsSubdir = "_graft_stats"

  /** Write `df` range-clustered on `layoutCols` into ~`nFiles` files
    * under `dir`, then build the stats manifest for `statsCols` and
    * return the data read back. Range clustering is what makes the
    * stats selective: each file owns a contiguous slice of the layout
    * key, so min/max intervals are narrow and disjoint instead of all
    * spanning the full domain. */
  def writeWithStats(spark: SparkSession, df: DataFrame, dir: String,
      nFiles: Int, layoutCols: Seq[String],
      statsCols: Seq[String]): DataFrame = {
    require(nFiles > 0, "nFiles must be positive")
    // Spark's default parquet timestamp encoding is INT96, which
    // carries no ordered footer stats — force INT64 micros for the
    // staging write (and restore the caller's conf) so timestamp
    // layout columns actually skip.
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prior = spark.conf.getOption(tsKey)
    spark.conf.set(tsKey, "TIMESTAMP_MICROS")
    try {
      df.repartitionByRange(nFiles, layoutCols.map(col): _*)
        .sortWithinPartitions(layoutCols.map(col): _*)
        .write.mode("overwrite").parquet(dir)
    } finally prior match {
      case Some(v) => spark.conf.set(tsKey, v)
      case None => spark.conf.unset(tsKey)
    }
    buildStats(spark, dir, statsCols)
    Bucketing.cleanupOnExit(dir)
    spark.read.parquet(dir)
  }

  /** Build (or rebuild) the manifest for an existing parquet dir: a
    * distributed footer-only sweep over its data files, written to
    * `dir/_graft_stats`. Safe to re-run after appends/compaction. */
  def buildStats(spark: SparkSession, dir: String,
      statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "statsCols must be non-empty")
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && isDataFile(s.getPath.getName))
      .map(_.getPath.toString)
    // Configuration is not serializable — ship its entries and rebuild
    // per task (loadDefaults=false: the entries already include them).
    val confMap = hconf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap
    val wanted = statsCols.toSet
    val parallelism = math.max(1, math.min(files.size, 64))
    val rows: Seq[FileColumnStats] =
      if (files.isEmpty) Seq.empty
      else spark.sparkContext
        .parallelize(files, parallelism)
        .flatMap(f => footerStats(f, confMap, wanted))
        .collect().toSeq
    import spark.implicits._
    spark.createDataset(rows).toDF()
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(new Path(root, statsSubdir).toString)
  }

  /** The manifest as a DataFrame (one row per data file × stats col). */
  def statsManifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(new Path(new Path(dir), statsSubdir).toString)

  /** Files that may contain rows with `column` in [lo, hi] (either
    * bound optional), plus the total file count. Keeps any file whose
    * stats can't prove exclusion. Bounds accept the column's external
    * Scala type: Int/Long/Double/Float, String, java.sql.Timestamp /
    * Instant (quantized by the file's parquet timestamp unit),
    * java.sql.Date / LocalDate (epoch days). */
  def prunedFiles(spark: SparkSession, dir: String, column: String,
      lo: Option[Any], hi: Option[Any]): (Seq[String], Int) = {
    val m = statsManifest(spark, dir)
      .filter(col("column") === column)
      .as[FileColumnStats](fileColumnStatsEncoder(spark))
      .collect().toSeq
    val kept = m.filter(s => mayMatch(s, lo, hi)).map(_.file)
    (kept, m.size)
  }

  /** Read only the files that may satisfy `column ∈ [lo, hi]`. The
    * caller MUST still apply the exact predicate — pruning is a
    * superset guarantee, not an evaluation. */
  def prunedRead(spark: SparkSession, dir: String, column: String,
      lo: Option[Any], hi: Option[Any]): DataFrame = {
    val (kept, _) = prunedFiles(spark, dir, column, lo, hi)
    if (kept.isEmpty) spark.read.parquet(dir).limit(0)
    else spark.read.parquet(kept: _*)
  }

  /** Point-lookup pruning: files that may contain ANY of `keys` in
    * `column` — the CDC-refetch / needle-lookup shape. With a
    * range-clustered layout a batch of K keys touches O(K) files out
    * of the fleet; the check is binary search of the sorted key set
    * against each file's [min,max], O(files·log K) driver work on the
    * tiny manifest. Callers re-apply the exact `isin`/join. */
  def prunedFilesForKeys(spark: SparkSession, dir: String, column: String,
      keys: Seq[Any]): (Seq[String], Int) = {
    val m = statsManifest(spark, dir)
      .filter(col("column") === column)
      .as[FileColumnStats](fileColumnStatsEncoder(spark))
      .collect().toSeq
    if (keys.isEmpty) return (Seq.empty, m.size)
    // canonicalize once; kinds are uniform across files of one column
    val kinds = m.map(_.kind).filterNot(_ == "none").distinct
    val kept = kinds match {
      case Seq("long") =>
        val ks = keys.map(longBound(_, m.head.logical)).sorted.toIndexedSeq
        m.filter(s => s.kind == "none" || anyKeyInRange(ks,
          s.minLong, s.maxLong, s))
      case Seq("double") =>
        val ks = keys.map(doubleBound).sorted.toIndexedSeq
        m.filter(s => s.kind == "none" || anyKeyInRange(ks,
          s.minDouble, s.maxDouble, s))
      case Seq("string") =>
        val ks = keys.map(_.toString).sorted.toIndexedSeq
        m.filter(s => s.kind == "none" || anyKeyInRange(ks,
          s.minString, s.maxString, s))
      case _ => m // mixed or stats-less manifest: keep everything
    }
    (kept.map(_.file), m.size)
  }

  /** Read only the files that may contain any of `keys` in `column`.
    * The caller MUST still apply the exact membership predicate. */
  def prunedReadForKeys(spark: SparkSession, dir: String, column: String,
      keys: Seq[Any]): DataFrame = {
    val (kept, _) = prunedFilesForKeys(spark, dir, column, keys)
    if (kept.isEmpty) spark.read.parquet(dir).limit(0)
    else spark.read.parquet(kept: _*)
  }

  /** Binary-search `sortedKeys` for a member of [min, max]. Missing
    * bounds (all-null file) exclude unless the file is stats-less. */
  private def anyKeyInRange[T](sortedKeys: IndexedSeq[T],
      min: Option[T], max: Option[T], s: FileColumnStats)
      (implicit ord: Ordering[T]): Boolean = (min, max) match {
    case (Some(lo), Some(hi)) =>
      val i = lowerBound(sortedKeys, lo)
      i < sortedKeys.size && ord.lteq(sortedKeys(i), hi)
    case _ => s.nullCount < s.rowCount // no recorded values: only keep
      // if the file could hold something other than nulls
  }

  /** Index of the first element ≥ `target` (sortedKeys.size if none). */
  private def lowerBound[T](xs: IndexedSeq[T], target: T)
      (implicit ord: Ordering[T]): Int = {
    var lo = 0; var hi = xs.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.lt(xs(mid), target)) lo = mid + 1 else hi = mid
    }
    lo
  }

  // ---- pruning decision ----------------------------------------------

  /** True unless the stats PROVE no row of the file can fall in
    * [lo, hi]. A range predicate never matches NULL, so an all-null
    * file (min/max absent with every row null) is excludable. */
  private[ops] def mayMatch(s: FileColumnStats, lo: Option[Any],
      hi: Option[Any]): Boolean = s.kind match {
    case "none" => true
    case _ if s.minLong.isEmpty && s.minDouble.isEmpty &&
        s.minString.isEmpty =>
      // no non-null values recorded: excludable only if provably all
      // rows are null
      s.nullCount < s.rowCount
    case "long" =>
      val loB = lo.map(longBound(_, s.logical))
      val hiB = hi.map(longBound(_, s.logical))
      loB.forall(b => s.maxLong.exists(_ >= b)) &&
        hiB.forall(b => s.minLong.exists(_ <= b))
    case "double" =>
      val loB = lo.map(doubleBound)
      val hiB = hi.map(doubleBound)
      loB.forall(b => s.maxDouble.exists(_ >= b)) &&
        hiB.forall(b => s.minDouble.exists(_ <= b))
    case "string" =>
      val loB = lo.map(_.toString)
      val hiB = hi.map(_.toString)
      loB.forall(b => s.maxString.exists(_ >= b)) &&
        hiB.forall(b => s.minString.exists(_ <= b))
    case _ => true
  }

  /** Predicate bound → the canonical long the file's stats use.
    * Timestamps follow the parquet logical unit recorded at stats
    * time; dates are epoch days (parquet DATE physical int32). */
  private def longBound(v: Any, logical: String): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case b: Boolean => if (b) 1L else 0L
    case t: java.sql.Timestamp => timestampUnits(t.toInstant, logical)
    case t: java.time.Instant => timestampUnits(t, logical)
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => d.toEpochDay
    case other => throw new IllegalArgumentException(
      s"unsupported long-kind bound: ${other.getClass.getName}")
  }

  private def timestampUnits(t: java.time.Instant, logical: String): Long = {
    val micros = Math.addExact(
      Math.multiplyExact(t.getEpochSecond, 1000000L), t.getNano / 1000L)
    if (logical.contains("NANOS")) Math.multiplyExact(micros, 1000L)
    else if (logical.contains("MILLIS")) Math.floorDiv(micros, 1000L)
    else micros // parquet TIMESTAMP default in Spark writes: MICROS
  }

  private def doubleBound(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case other => throw new IllegalArgumentException(
      s"unsupported double-kind bound: ${other.getClass.getName}")
  }

  // ---- footer sweep (runs inside executor tasks) ---------------------

  /** Footer-only stats for one parquet file. Aggregates row groups;
    * any row group with missing/unusable stats for a column demotes
    * that column to kind="none" (file always kept). */
  private[ops] def footerStats(file: String, confMap: Map[String, String],
      wanted: Set[String]): Seq[FileColumnStats] = {
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val byCol = blocks.flatMap(_.getColumns.asScala)
        .filter(cc => wanted.contains(cc.getPath.toDotString))
        .groupBy(_.getPath.toDotString)
      byCol.toSeq.sortBy(_._1).map { case (name, chunks) =>
        mergeChunks(file, name, chunks)
      }
    } finally reader.close()
  }

  private def mergeChunks(file: String, name: String,
      chunks: Seq[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
      : FileColumnStats = {
    val primitive = chunks.head.getPrimitiveType
    val logical = Option(primitive.getLogicalTypeAnnotation)
      .map(_.toString).getOrElse("")
    val rows = chunks.map(_.getValueCount).sum
    val statsOk = chunks.forall { cc =>
      val st: org.apache.parquet.column.statistics.Statistics[_] =
        cc.getStatistics
      st != null && !st.isEmpty && st.isNumNullsSet
    }
    def none = FileColumnStats(file, name, "none", logical,
      None, None, None, None, None, None, 0L, rows)
    if (!statsOk) none
    else {
      val nulls = chunks.map(_.getStatistics.getNumNulls).sum
      val valued = chunks.filter(_.getStatistics.hasNonNullValue)
      val mins = valued.map(_.getStatistics.genericGetMin)
      val maxs = valued.map(_.getStatistics.genericGetMax)
      primitive.getPrimitiveTypeName match {
        case PrimitiveTypeName.INT32 =>
          val lo = mins.map(_.asInstanceOf[Integer].longValue())
          val hi = maxs.map(_.asInstanceOf[Integer].longValue())
          FileColumnStats(file, name, "long", logical,
            lo.minOption, hi.maxOption, None, None, None, None, nulls, rows)
        case PrimitiveTypeName.INT64 =>
          val lo = mins.map(_.asInstanceOf[java.lang.Long].longValue())
          val hi = maxs.map(_.asInstanceOf[java.lang.Long].longValue())
          FileColumnStats(file, name, "long", logical,
            lo.minOption, hi.maxOption, None, None, None, None, nulls, rows)
        case PrimitiveTypeName.BOOLEAN =>
          val lo = mins.map(m => if (m.asInstanceOf[java.lang.Boolean]) 1L else 0L)
          val hi = maxs.map(m => if (m.asInstanceOf[java.lang.Boolean]) 1L else 0L)
          FileColumnStats(file, name, "long", logical,
            lo.minOption, hi.maxOption, None, None, None, None, nulls, rows)
        case PrimitiveTypeName.FLOAT =>
          val lo = mins.map(_.asInstanceOf[java.lang.Float].doubleValue())
          val hi = maxs.map(_.asInstanceOf[java.lang.Float].doubleValue())
          FileColumnStats(file, name, "double", logical,
            None, None, lo.minOption, hi.maxOption, None, None, nulls, rows)
        case PrimitiveTypeName.DOUBLE =>
          val lo = mins.map(_.asInstanceOf[java.lang.Double].doubleValue())
          val hi = maxs.map(_.asInstanceOf[java.lang.Double].doubleValue())
          FileColumnStats(file, name, "double", logical,
            None, None, lo.minOption, hi.maxOption, None, None, nulls, rows)
        case PrimitiveTypeName.BINARY =>
          // parquet orders binary stats by unsigned bytes; that equals
          // Java String order only when both bounds are ASCII — beyond
          // that, keep the file rather than risk a wrong exclusion
          // (e.g. supplementary code points order differently in
          // UTF-16 than in UTF-8 bytes).
          val lo = mins.map(b => b.asInstanceOf[Binary].toStringUsingUTF8)
          val hi = maxs.map(b => b.asInstanceOf[Binary].toStringUsingUTF8)
          val ascii = (lo ++ hi).forall(s => s.forall(_ < 128))
          if (!ascii) none
          else FileColumnStats(file, name, "string", logical,
            None, None, None, None, lo.minOption, hi.maxOption, nulls, rows)
        case _ => none // INT96, FIXED_LEN_BYTE_ARRAY: no canonical order here
      }
    }
  }

  private def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  private def fileColumnStatsEncoder(spark: SparkSession) = {
    import spark.implicits._
    implicitly[org.apache.spark.sql.Encoder[FileColumnStats]]
  }
}
