package graft

import graft.ops.{Sampling, SkewJoin}
import org.apache.spark.sql.functions._

/** Deterministic sampling + salted-join invariants. The oracle gate
  * checks values; these specs check the STABILITY properties the
  * oracle can't see (partitioning-independence, join identity).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 2000L).toDF("id")
    .withColumn("grp", (col("id") % 7).cast("string"))

  test("hashSample: membership independent of partitioning and run") {
    val a = Sampling.hashSample(ids, "id", 0.2).select("id")
      .as[Long].collect().toSet
    val b = Sampling.hashSample(ids.repartition(13, col("grp")), "id", 0.2)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // fraction is approximate but must be in a sane band for n=2000
    assert(a.size > 300 && a.size < 500, s"got ${a.size}")
  }

  test("hashSample: nested sample property — 10% subset of 20%") {
    val s20 = Sampling.hashSample(ids, "id", 0.2).select("id").as[Long].collect().toSet
    val s10 = Sampling.hashSample(ids, "id", 0.1).select("id").as[Long].collect().toSet
    assert(s10.subsetOf(s20))
  }

  test("stratifiedSample: exactly n per stratum (or all if fewer)") {
    val out = Sampling.stratifiedSample(ids, "grp", "id", 5)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(out.values.forall(_ == 5L) && out.size == 7)
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    val outTiny = Sampling.stratifiedSample(tiny, "grp", "id", 5).count()
    assert(outTiny == 3L)
  }

  test("discreteQuantiles: exact rank semantics on a known sequence") {
    // group "g": measures 1..100 → p50 = ceil(50)=rank 50 → 50, p99 → 99
    val df = (1 to 100).map(i => (i.toLong, "g", i)).toDF("id", "grp", "m")
    val q = Sampling.discreteQuantiles(df, "grp", "id", col("m"),
      Seq("p50" -> 0.5, "p99" -> 0.99))
    val row = q.collect()(0)
    assert(row.getAs[Int]("p50") == 50 && row.getAs[Int]("p99") == 99)
  }

  test("domainMix: rates derived from live counts hit the targets; unlisted domains drop") {
    // a:1000, b:500, c:200 rows; targets 50/30/20 → T bounded by c
    // (200·10^6/200000 = 1,000,000 → 1M? no: T = min(1000·1e6/5e5,
    // 500·1e6/3e5, 200·1e6/2e5) = min(2000, 1666, 1000)·10^3 = 10^6)
    val rows = (1L to 1000L).map(i => (i, "a")) ++
      (1001L to 1500L).map(i => (i, "b")) ++
      (1501L to 1700L).map(i => (i, "c")) ++
      (1701L to 1800L).map(i => (i, "unlisted"))
    val df = rows.toDF("id", "src")
    val out = Sampling.domainMix(df, "id", "src",
      Map("a" -> 500000L, "b" -> 300000L, "c" -> 200000L))
      .select("id", "src").as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!bySrc.contains("unlisted"))
    // expected keep targets: T = 10^6 µ-rows → k = 500, 300, 200;
    // keep_ppm = 500000, 600000, 1000000. Bernoulli noise on a/b,
    // exact on c (ppm = 10^6 keeps everything)
    assert(bySrc("c") == 200)
    assert(math.abs(bySrc("a") - 500) < 80, s"a=${bySrc("a")}")
    assert(math.abs(bySrc("b") - 300) < 80, s"b=${bySrc("b")}")
    // membership is a pure function of the id — repartitioning changes nothing
    val out2 = Sampling.domainMix(df.repartition(7, col("src")), "id", "src",
      Map("a" -> 500000L, "b" -> 300000L, "c" -> 200000L))
      .select("id", "src").as[(Long, String)].collect()
    assert(out.toSet == out2.toSet)
    // realized shares approach the targets
    val total = out.length.toDouble
    assert(math.abs(bySrc("a") / total - 0.5) < 0.06)
    assert(math.abs(bySrc("b") / total - 0.3) < 0.06)
  }

  test("discreteQuantilesByValue ≡ discreteQuantiles with ties and null measures") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 1500L).map { i =>
      val m: Integer =
        if (rnd.nextInt(20) == 0) null // null measures rank last
        else Int.box(rnd.nextInt(40))  // heavy ties
      (i, s"g${i % 5}", m)
    }
    val df = rows.toDF("id", "grp", "m")
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p100" -> 1.0)
    val byRank = Sampling.discreteQuantiles(df, "grp", "id", col("m"), ps)
      .orderBy("grp").collect().map(_.toSeq).toSeq
    val byValue = Sampling.discreteQuantilesByValue(df, "grp", col("m"), ps)
      .orderBy("grp").collect().map(_.toSeq).toSeq
    assert(byValue == byRank)
  }

  test("epochShuffle: stable per epoch, dense per-shard positions, epochs differ") {
    import graft.ops.Pipeline
    val a = Pipeline.epochShuffle(ids, "id", epoch = 3, nShards = 8)
    val b = Pipeline.epochShuffle(ids.repartition(13, col("grp")), "id",
      epoch = 3, nShards = 8)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("shard", "pos", "id").as[(Int, Int, Long)].collect().sorted.toSeq
    // same epoch → same layout regardless of input partitioning
    assert(key(a) == key(b))
    // shards cover [0, 8) and positions are dense 1..count per shard
    val perShard = key(a).groupBy(_._1)
    assert(perShard.keySet.subsetOf((0 until 8).toSet) && perShard.nonEmpty)
    perShard.foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted == (1 to rows.size).toList)
    }
    assert(perShard.values.map(_.size).sum == 2000)
    // a different epoch reorders (pure-function-of-epoch, not of run)
    val c = Pipeline.epochShuffle(ids, "id", epoch = 4, nShards = 8)
    assert(key(a) != key(c))
  }

  test("writeEpochShards: one file per shard, epoch order preserved on re-read") {
    import graft.ops.Pipeline
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    Pipeline.writeEpochShards(ids, "id", epoch = 3, nShards = 4, out)
    // exactly one data file in every shard dir — the loader contract
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
    // re-read ≡ the epochShuffle layout it materializes
    val reread = spark.read.parquet(out)
      .select("shard", "pos", "id").as[(Int, Int, Long)].collect().sorted.toSeq
    val direct = Pipeline.epochShuffle(ids, "id", epoch = 3, nShards = 4)
      .select("shard", "pos", "id").as[(Int, Int, Long)].collect().sorted.toSeq
    assert(reread == direct)
  }

  test("importanceWeights: target-like docs outrank off-target, zero-token scores 0") {
    // target speaks "alpha beta"; raw docs range from pure-target
    // vocabulary to disjoint; a hand-run of the same integer formula
    // must agree exactly
    val target = Seq((100L, "alpha beta alpha beta"), (101L, "alpha beta"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha"), // pure target vocab
      (2L, "alpha zulu"),       // half
      (3L, "zulu yankee xray"), // disjoint
      (4L, "   "))              // token-less
      .toDF("doc_id", "text")
    val got = Sampling.importanceWeights(raw, target, "doc_id", "text", dim = 16)
      .as[(Long, Long)].collect().toMap

    // driver-side re-run of the same formula (md5 buckets, add-1
    // smoothing, scaled integer div)
    def grams(t: String): Seq[String] = {
      val toks = t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    def bucket(g: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 16).toInt
    }
    val rawDocs = Map(1L -> "alpha beta alpha", 2L -> "alpha zulu",
      3L -> "zulu yankee xray")
    val rawCnt = rawDocs.values.flatMap(grams).groupBy(bucket)
      .map { case (p, g) => p -> g.size.toLong }
    val tgtCnt = Seq("alpha beta alpha beta", "alpha beta").flatMap(grams)
      .groupBy(bucket).map { case (p, g) => p -> g.size.toLong }
    val expected = rawDocs.map { case (id, t) =>
      id -> grams(t).groupBy(bucket).map { case (p, gs) =>
        gs.size.toLong *
          ((tgtCnt.getOrElse(p, 0L) + 1L) * 1000000L /
            (rawCnt.getOrElse(p, 0L) + 1L))
      }.sum
    } + (4L -> 0L)
    assert(got == expected, s"got=$got expected=$expected")
    assert(got(1L) > got(3L), "pure-target vocab must outrank disjoint")
    val top = Sampling.importanceSelect(raw, target, "doc_id", "text",
      k = 2, dim = 16).as[(Long, Long)].collect().map(_._1).toSeq
    assert(top == expected.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(2).map(_._1))
  }

  test("temperatureRates: √n damping boosts small domains, feasibility holds") {
    import org.apache.spark.sql.functions.col
    // 900 / 100 / 25 docs: raw shares 878k/98k/24k ppm; √n shares
    // 30/10/5 → 667k/222k/111k ppm — big damped, small boosted
    val rows = (0 until 900).map(i => (i.toLong, "big")) ++
      (1000 until 1100).map(i => (i.toLong, "mid")) ++
      (2000 until 2025).map(i => (i.toLong, "small"))
    val df = rows.toDF("doc_id", "dom")
    val r = Sampling.temperatureRates(df, "dom").collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    val total = 1025.0
    // damping direction: share(big) < count-share(big), small boosted
    assert(r("big")._2 < (900 / total * 1e6).toLong)
    assert(r("small")._2 > (25 / total * 1e6).toLong)
    // shares sum to ~1e6 (integer floor loses < |domains| ppm)
    val shareSum = r.values.map(_._2).sum
    assert(shareSum > 999997L && shareSum <= 1000000L, shareSum.toString)
    // feasibility: every keep rate ≤ 100%, and the binding domain
    // (largest share-to-count ratio = small) keeps all but at most
    // one doc (the feasible-total floor can round one away — the
    // same integer-floor behavior as domainMix)
    assert(r.values.forall(_._3 <= 1000000L))
    assert(r("small")._3 >= ((25L - 1) * 1000000L) / 25L, r("small").toString)
    // the mix respects the rates: kept counts within 1 of n·keep/1e6
    // is NOT guaranteed (hash membership), but kept ≤ n and the
    // sampled frame only contains rows from the input
    val kept = Sampling.temperatureMix(df, "doc_id", "dom")
    assert(kept.count() <= df.count())
    assert(kept.join(df, Seq("doc_id", "dom"), "left_anti").isEmpty)
  }

  test("qualityPrune: byValue ⊇ exact, equal when the boundary score is unique") {
    // dom "a": distinct scores — the two forms must agree exactly.
    // dom "b": five rows ALL tied at one score — exact keeps
    // max(1, 5*40/100)=2 (by id), byValue keeps the whole tie bucket.
    val df = (Seq((1L, "a", 90L), (2L, "a", 80L), (3L, "a", 70L),
      (4L, "a", 60L), (5L, "a", 50L)) ++
      (11L to 15L).map(i => (i, "b", 42L))).toDF("id", "dom", "s")
    def kept(d: org.apache.spark.sql.DataFrame) =
      d.select("id").as[Long].collect().toSet
    val exact = kept(Sampling.qualityPruneExact(df, "dom", col("s"), "id", 40))
    val byVal = kept(Sampling.qualityPruneByValue(df, "dom", col("s"), "id", 40))
    assert(exact == Set(1L, 2L, 11L, 12L))      // 40% of 5 = 2 per dom
    assert(exact.subsetOf(byVal))
    assert(byVal == Set(1L, 2L) ++ (11L to 15L)) // tie bucket all kept
    // a 1-row domain always survives (the max(1, …) floor)
    val tiny = Seq((1L, "solo", 5L)).toDF("id", "dom", "s")
    assert(Sampling.qualityPruneExact(tiny, "dom", col("s"), "id", 10).count() == 1L)
    assert(Sampling.qualityPruneByValue(tiny, "dom", col("s"), "id", 10).count() == 1L)
  }

  test("qualityPrune property: byValue ⊇ exact on tie-heavy random scores; ≡ on distinct") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 120L).map(i =>
        (i, s"d${i % 3}", rnd.nextInt(6).toLong)) // 6 values → heavy ties
      val df = rows.toDF("id", "dom", "s")
      val pct = 10 + rnd.nextInt(81)
      def kept(d: org.apache.spark.sql.DataFrame) =
        d.select("id").as[Long].collect().toSet
      val exact = kept(Sampling.qualityPruneExact(df, "dom", col("s"), "id", pct))
      val byVal = kept(Sampling.qualityPruneByValue(df, "dom", col("s"), "id", pct))
      assert(exact.subsetOf(byVal), s"seed=$seed pct=$pct")
      // exact keeps exactly max(1, n·pct div 100) per domain
      val perDom = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val expected = perDom.values.map(n => math.max(1L, n.toLong * pct / 100)).sum
      assert(exact.size == expected, s"seed=$seed pct=$pct")
      // distinct scores → the forms agree exactly
      val uniq = (1L to 120L).map(i => (i, s"d${i % 3}", rnd.nextLong()))
        .toDF("id", "dom", "s")
      assert(kept(Sampling.qualityPruneExact(uniq, "dom", col("s"), "id", pct)) ==
        kept(Sampling.qualityPruneByValue(uniq, "dom", col("s"), "id", pct)),
        s"seed=$seed pct=$pct distinct-score forms diverged")
    }
  }

  test("saltedJoin: identical result to the plain join, incl. dup keys") {
    val big = Seq((1, "x"), (1, "y"), (2, "z"), (3, "w")).toDF("k", "v")
    val small = Seq((1, "A"), (1, "B"), (2, "C")).toDF("k", "d")
    val plain = big.join(small, Seq("k"), "inner")
      .orderBy("k", "v", "d").collect().toSeq
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), salt = 4)
      .orderBy("k", "v", "d").collect().toSeq
    assert(salted == plain)
  }
}
