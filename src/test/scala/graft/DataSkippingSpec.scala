package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.DataSkipping

class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def stage(tag: String): String =
    Files.createTempDirectory(s"graft_skip_$tag").toString + "/data"

  test("pruned range scan reads fewer files, same rows as a full filter") {
    val dir = stage("range")
    val df = (1 to 10000).map(i => (i.toLong, s"v$i", i % 7)).toDF("k", "v", "m")
    val back = DataSkipping.writeWithStats(spark, df, dir,
      nFiles = 10, layoutCols = Seq("k"), statsCols = Seq("k", "v"))
    assert(back.count() === 10000)

    val (kept, total) = DataSkipping.prunedFiles(spark, dir, "k",
      lo = Some(2500L), hi = Some(3499L))
    assert(total === 10, "manifest should cover every data file")
    assert(kept.size <= 3,
      s"range-clustered layout should prune to ~1-2 files, kept ${kept.size}")
    assert(kept.nonEmpty)

    val pruned = DataSkipping.prunedRead(spark, dir, "k",
      Some(2500L), Some(3499L))
      .filter(col("k") >= 2500L && col("k") <= 3499L)
    val full = spark.read.parquet(dir)
      .filter(col("k") >= 2500L && col("k") <= 3499L)
    assert(pruned.count() === 1000L)
    assert(pruned.select("k").as[Long].collect().sorted.toSeq ===
      full.select("k").as[Long].collect().sorted.toSeq)
    // the scan really only opens the kept files
    assert(pruned.inputFiles.length === kept.size)
  }

  test("string-column pruning uses ASCII bounds") {
    val dir = stage("str")
    val df = ('a' to 'z').flatMap(c => (1 to 10).map(i => (s"$c$i", c.toString)))
      .toDF("id", "grp")
    DataSkipping.writeWithStats(spark, df, dir,
      nFiles = 6, layoutCols = Seq("grp"), statsCols = Seq("grp"))
    val (kept, total) = DataSkipping.prunedFiles(spark, dir, "grp",
      lo = Some("c"), hi = Some("d"))
    assert(kept.size < total)
    val rows = DataSkipping.prunedRead(spark, dir, "grp", Some("c"), Some("d"))
      .filter(col("grp") >= "c" && col("grp") <= "d").count()
    assert(rows === 20)
  }

  test("all-null file is excluded; mixed-null file with matches is kept") {
    // one file of nulls, one of values — written separately by hand so
    // the file split is exact
    val df = Seq[(java.lang.Long, Int)]((null, 0), (null, 0), (5L, 1), (9L, 1))
      .toDF("k", "part")
    val dir2 = stage("nulls")
    df.filter(col("part") === 0).coalesce(1)
      .write.parquet(dir2)
    df.filter(col("part") === 1).coalesce(1)
      .write.mode("append").parquet(dir2)
    DataSkipping.buildStats(spark, dir2, Seq("k"))
    val (kept, total) = DataSkipping.prunedFiles(spark, dir2, "k",
      lo = Some(1L), hi = Some(100L))
    assert(total === 2)
    assert(kept.size === 1, "the all-null file is provably excludable")
    val rows = DataSkipping.prunedRead(spark, dir2, "k", Some(1L), Some(100L))
      .filter(col("k") >= 1L && col("k") <= 100L).count()
    assert(rows === 2)
  }

  test("timestamp bounds quantize by the file's parquet unit") {
    val dir = stage("ts")
    val df = (0 until 96).map { h =>
      (java.sql.Timestamp.valueOf(f"2024-03-0${1 + h / 24}%d ${h % 24}%02d:00:00"), h)
    }.toDF("ts", "h")
    DataSkipping.writeWithStats(spark, df, dir,
      nFiles = 4, layoutCols = Seq("ts"), statsCols = Seq("ts"))
    val lo = java.sql.Timestamp.valueOf("2024-03-02 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-03-02 23:00:00")
    val (kept, total) = DataSkipping.prunedFiles(spark, dir, "ts",
      Some(lo), Some(hi))
    assert(total === 4)
    assert(kept.size <= 2, s"one day of four should prune, kept ${kept.size}")
    val n = DataSkipping.prunedRead(spark, dir, "ts", Some(lo), Some(hi))
      .filter(col("ts") >= lit(lo) && col("ts") <= lit(hi)).count()
    assert(n === 24)
  }

  test("key-lookup pruning touches O(keys) files, not the fleet") {
    val dir = stage("keys")
    val df = (1 to 10000).map(i => (i.toLong, i % 5)).toDF("k", "m")
    DataSkipping.writeWithStats(spark, df, dir,
      nFiles = 20, layoutCols = Seq("k"), statsCols = Seq("k"))
    // three keys spread across the domain → at most 3 files survive
    val keys = Seq(17L, 5003L, 9999L)
    val (kept, total) = DataSkipping.prunedFilesForKeys(spark, dir, "k", keys)
    assert(total === 20)
    assert(kept.size <= 3, s"3 point keys should touch ≤3 files, got ${kept.size}")
    val got = DataSkipping.prunedReadForKeys(spark, dir, "k", keys)
      .filter(col("k").isin(keys: _*))
      .select("k").as[Long].collect().sorted.toSeq
    assert(got === keys.sorted)
    // keys that fall in inter-file gaps match nothing and keep nothing
    val (keptMiss, _) = DataSkipping.prunedFilesForKeys(spark, dir, "k",
      Seq(-5L, 999999L))
    assert(keptMiss.isEmpty)
  }

  test("open-ended bounds and unknown-stats columns stay correct") {
    val dir = stage("open")
    val df = (1 to 100).map(i => (i, i * 1.5)).toDF("k", "x")
    DataSkipping.writeWithStats(spark, df, dir,
      nFiles = 5, layoutCols = Seq("k"), statsCols = Seq("k", "x"))
    // only an upper bound
    val (keptHi, _) = DataSkipping.prunedFiles(spark, dir, "k",
      None, Some(20))
    assert(keptHi.size < 5)
    // double-kind column
    val (keptX, totX) = DataSkipping.prunedFiles(spark, dir, "x",
      Some(100.0), None)
    assert(totX === 5 && keptX.size < 5)
    val n = DataSkipping.prunedRead(spark, dir, "x", Some(100.0), None)
      .filter(col("x") >= 100.0).count()
    assert(n === df.filter(col("x") >= 100.0).count())
  }
}
