package graft

import graft.ops.{BloomJoin, Dedup, Multimodal, Similarity, TextAnalysis, Winnowing}
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens/tokenCount handle empty and multi-space text") {
    val df = Seq("", "  ", "a  b\tc", "one").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(0, 0, 3, 1))
  }

  test("shingles: word 3-grams, short docs collapse to one shingle") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh"))
    val r = df.as[Seq[String]].collect()
    assert(r(0).toSet == Set("a b c", "b c d"))
    assert(r(1) == Seq("a b"))
  }

  test("simhash: identical text → identical hash; disjoint text differs") {
    val df = Seq(("x", "k1 k2 k3 k4"), ("y", "k1 k2 k3 k4"), ("z", "q9 q8 q7 q6"))
      .toDF("id", "text")
      .select(col("id"), Dedup.simhash(col("text")).as("s"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("x") == m("y"))
    assert(m("x") != m("z"))
  }

  test("simhashDf agrees with the column-expression simhash") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "one two three four five"),
      (3L, ""),
      (4L, "single")).toDF("doc_id", "text")
    val colVersion = docs
      .select(col("doc_id").as("id"), Dedup.simhash(col("text")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dfVersion = Dedup.simhashDf(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dfVersion == colVersion)
  }

  test("simhashNearDuplicates finds identical docs, skips disjoint ones") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDuplicates(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("charJaccardSimilar ≡ the all-pairs form on random data") {
    // small alphabet → plenty of high-Jaccard char-set pairs; fixed
    // seed for determinism
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef ."
    val docs = (0 until 60).map { i =>
      val len = 6 + rnd.nextInt(18)
      val text = (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      (s"s${i % 3}", i.toLong, text)
    }.toDF("source", "doc_id", "text")

    val fast = Dedup.charJaccardSimilar(docs, "source", "doc_id", "text", 0.9)
      .select("part", "id_a", "id_b", "jac").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    val d = docs.select(col("source"), col("doc_id"),
      Dedup.charMask(col("text")).as("cm"))
    val a = d.select(col("source"), col("doc_id").as("id_a"), col("cm").as("ma"))
    val b = d.select(col("source"), col("doc_id").as("id_b"), col("cm").as("mb"))
    val brute = a.join(b, Seq("source")).filter(col("id_a") < col("id_b"))
      .withColumn("jac", Dedup.maskJaccard(col("ma"), col("mb")))
      .filter(col("jac") >= 0.9)
      .select("source", "id_a", "id_b", "jac").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    assert(brute.nonEmpty, "fixture should contain similar pairs")
    assert(fast == brute)
  }

  test("charJaccardSimilar: mask-aliasing non-ASCII chars still meet in candidates") {
    // 'é' (233) and 'i' (105) fold to the SAME mask bit (hi 41), so
    // maskJaccard('é', 'i') = 1.0; with exact chars as candidate keys
    // the pair would never meet in the equi-join and be silently lost
    val docs = Seq(("s", 1L, "é"), ("s", 2L, "i")).toDF("source", "doc_id", "text")
    val r = Dedup.charJaccardSimilar(docs, "source", "doc_id", "text", 0.9)
      .select("id_a", "id_b", "jac").as[(Long, Long, Double)].collect().toSeq
    assert(r == Seq((1L, 2L, 1.0)), s"aliasing pair missed: $r")
  }

  test("ngramJaccardSimilar ≡ the all-pairs exact form on random data") {
    // random bases + planted near-copies (random 3-gram SEQUENCES
    // rarely overlap — similarity must be planted); fixed seed
    val rnd = new scala.util.Random(7)
    val vocab = Seq("red", "blue", "green", "dog", "cat", "sun", "sky")
    val base = (0 until 25).map { i =>
      val len = 8 + rnd.nextInt(6)
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val copies = base.collect { case (i, t) if i % 3 == 0 =>
      (i + 1000L, t + " extra") }
    val docs = (base ++ copies).toDF("doc_id", "text")

    val fast = Dedup.ngramJaccardSimilar(docs, "doc_id", "text", 3, 0.6)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet

    val d = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val a = d.select(col("doc_id").as("id_a"), col("sh").as("sa"))
    val b = d.select(col("doc_id").as("id_b"), col("sh").as("sb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("ni", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", col("ni").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("ni")))
      .filter(col("jaccard") >= 0.6)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet

    assert(brute.nonEmpty, "fixture should contain similar pairs")
    assert(fast == brute)
  }

  test("containmentPairs ≡ the all-pairs directional form on random data") {
    val rnd = new scala.util.Random(13)
    val vocab = Seq("red", "blue", "green", "dog", "cat", "sun", "sky", "oak")
    val base = (0 until 25).map { i =>
      val len = 10 + rnd.nextInt(8)
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    // planted contained slices (prefix halves) + a noisy variant
    val slices = base.collect { case (i, t) if i % 3 == 0 =>
      (i + 1000L, t.split(" ").take(t.split(" ").length / 2).mkString(" ")) }
    val noisy = base.collect { case (i, t) if i % 4 == 0 =>
      (i + 2000L, t.split(" ").take(t.split(" ").length / 2).mkString(" ") + " zz qq") }
    val docs = (base ++ slices ++ noisy).toDF("doc_id", "text")

    val fast = Winnowing.containmentPairs(docs, "doc_id", "text", 3, 0.7,
        minShingles = 3)
      .select("id_contained", "id_container", "containment")
      .as[(Long, Long, Double)].collect().toSet

    val d = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val a = d.select(col("doc_id").as("id_contained"), col("sh").as("si"))
    val b = d.select(col("doc_id").as("id_container"), col("sh").as("so"))
    val brute = a.crossJoin(b)
      .filter(col("id_contained") =!= col("id_container"))
      .filter(size(col("si")) >= 3)
      .withColumn("ni", size(array_intersect(col("si"), col("so"))))
      .withColumn("containment", col("ni").cast("double") / size(col("si")))
      .filter(col("containment") >= 0.7)
      .select("id_contained", "id_container", "containment")
      .as[(Long, Long, Double)].collect().toSet

    assert(brute.nonEmpty, "fixture should contain containment pairs")
    assert(fast == brute)
  }

  test("vocabRichness: TTR and hapax shares are exact per group") {
    val docs = Seq(
      ("A", "x x x x y"),   // 5 tokens, 2 types, 1 hapax (y)
      ("B", "a b c a"))     // 4 tokens, 3 types, 2 hapax (b, c)
      .toDF("source", "text")
    val r = TextAnalysis.vocabRichness(docs, "source", "text")
      .orderBy("group")
      .select("group", "n_tokens", "n_types", "n_hapax", "ttr_ppm",
        "hapax_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("A", 5L, 2L, 1L, 400000L, 500000L),
      ("B", 4L, 3L, 2L, 750000L, 666666L)))
  }

  test("dedupRoi: dup holders pay, canonical owners keep their tokens") {
    val docs = Seq(
      (1L, "A", "x y z"), (2L, "A", "x y z"), // d2 is the dup holder
      (3L, "B", "a b c d"), (4L, "B", "x y z")) // cross-source copy
      .toDF("doc_id", "source", "text")
    val r = graft.ops.Dedup.dedupRoi(docs, "doc_id", "text", "source")
      .orderBy("source")
      .select("source", "n_docs", "n_dup_docs", "total_tokens",
        "dup_tokens", "savings_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("A", 2L, 1L, 6L, 3L, 500000L),
      ("B", 2L, 1L, 7L, 3L, 428571L)))
  }

  test("dropContained: quote dropped, host kept, identical pair keeps lowest id") {
    val host = "w1 w2 w3 w4 w5 w6 w7 w8 alpha beta gamma delta epsilon zeta " +
      "v1 v2 v3 v4 v5 v6 v7 v8"
    val docs = Seq(
      (1L, host),
      (2L, "alpha beta gamma delta epsilon zeta"), // quote → dropped
      (3L, "island text unrelated to all others fully"), // survives
      (4L, "twin copy of this exact sentence here now"),
      (5L, "twin copy of this exact sentence here now")) // 4 kept, 5 dropped
      .toDF("doc_id", "text")
    val kept = graft.ops.Winnowing.dropContained(docs, "doc_id", "text",
        n = 3, threshold = 0.8, minShingles = 3)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L, 3L, 4L), s"wrong survivors: $kept")
  }

  test("joinSizeEstimate: upper bound always, exact when buckets dominate keys") {
    val rnd = new scala.util.Random(31)
    val left = (0 until 400).map(_ => rnd.nextInt(40).toLong).toDF("k")
    val right = (0 until 300).map(_ => rnd.nextInt(40).toLong).toDF("k")
    val exact = left.as("l").join(right.as("r"),
      col("l.k") === col("r.k")).count()
    for (b <- Seq(4, 16, 4096)) {
      val est = graft.ops.Sketches.joinSizeEstimate(
        left, col("k"), right, col("k"), b)
        .select("est_rows").as[Long].head()
      assert(est >= exact, s"buckets=$b: estimate $est below exact $exact")
      // 4096 buckets over 40 keys: md5 collisions across 40 keys are
      // possible but did not occur for this fixed seed — the estimate
      // is exact (pinned: a collision would show as est > exact)
      if (b == 4096) assert(est == exact, s"est $est != exact $exact")
    }
  }

  test("joinSizeEstimateMulti ≡ per-width joinSizeEstimate (divisor widths)") {
    // the one-pass multi-resolution form must be ROW-identical to
    // unioning single-width calls: coarser widths re-aggregate the
    // finest histogram, exact because pmod(pmod(H, finest), w) ==
    // pmod(H, w) when w divides finest
    val rnd = new scala.util.Random(77)
    val left = (0 until 500).map(_ => rnd.nextInt(60).toLong).toDF("k")
    val right = (0 until 350).map(_ => rnd.nextInt(60).toLong).toDF("k")
    val widths = Seq(4, 16, 256)
    val multi = graft.ops.Sketches.joinSizeEstimateMulti(
        left, col("k"), right, col("k"), widths)
      .orderBy(col("buckets"))
      .as[(Int, Long)].collect().toSeq
    val single = widths.map { w =>
      w -> graft.ops.Sketches.joinSizeEstimate(
        left, col("k"), right, col("k"), w)
        .select("est_rows").as[Long].head()
    }
    assert(multi == single, s"multi $multi != per-width $single")
    // a non-divisor width must be refused, not silently approximated
    intercept[IllegalArgumentException] {
      graft.ops.Sketches.joinSizeEstimateMulti(
        left, col("k"), right, col("k"), Seq(3, 256))
    }
  }

  test("minhashSignatureMd5: identical sets match everywhere; estimate tracks Jaccard") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g h i j k l m n o p"), // identical → 32/32
      (3L, "a b c d e f g h i j k l zz yy xx ww")) // ~asymmetric overlap
      .toDF("id", "text")
    val sigs = docs.select(col("id"),
        Dedup.shingles(col("text"), 3).as("sh"))
      .withColumn("sig", Dedup.minhashSignatureMd5(col("sh"), 32))
    val m = sigs.select("id", "sig").as[(Long, Seq[Long])]
      .collect().map { case (i, s) => i -> s }.toMap
    assert(m(1L) == m(2L), "identical sets must have identical signatures")
    val matches13 = m(1L).zip(m(3L)).count { case (x, y) => x == y }
    // exact jaccard of the 3-gram sets is 10/18 ≈ 0.556; a 32-hash
    // estimate is deterministic for fixed inputs — assert it lands in
    // a generous band around the true value
    assert(matches13 > 6 && matches13 < 26,
      s"estimate implausibly far from exact: $matches13/32")
  }

  test("containmentPairs: prefix filter is lossless across thresholds") {
    val rnd = new scala.util.Random(47)
    val vocab = Seq("k1", "k2", "k3", "k4", "k5", "k6", "k7", "k8", "k9")
    val base = (0 until 20).map { i =>
      val len = 9 + rnd.nextInt(9)
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val slices = base.collect { case (i, t) if i % 2 == 0 =>
      (i + 1000L, t.split(" ").take(2 * t.split(" ").length / 3).mkString(" ")) }
    val docs = (base ++ slices).toDF("doc_id", "text")
    val d = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    for (t <- Seq(0.5, 0.8, 0.9)) {
      val fast = Winnowing.containmentPairs(docs, "doc_id", "text", 3, t,
          minShingles = 3)
        .select("id_contained", "id_container")
        .as[(Long, Long)].collect().toSet
      val brute = d.select(col("doc_id").as("id_contained"), col("sh").as("si"))
        .crossJoin(d.select(col("doc_id").as("id_container"), col("sh").as("so")))
        .filter(col("id_contained") =!= col("id_container") &&
          size(col("si")) >= 3)
        .filter(size(array_intersect(col("si"), col("so"))).cast("double") /
          size(col("si")) >= t)
        .select("id_contained", "id_container")
        .as[(Long, Long)].collect().toSet
      assert(fast == brute, s"threshold $t: prefix filter lost pairs " +
        s"(missing ${brute -- fast}, extra ${fast -- brute})")
    }
  }

  test("containmentPairs: required-overlap formula matches the verify " +
      "comparison for every (k, n) up to 500") {
    // r must be the smallest integer with fl(r/n) >= t under the SAME
    // double comparison verify uses; ceil(t·n) alone overshoots when
    // fl(t·n) rounds just above k (e.g. t = fl(29/35): ceil gives 30
    // while 29/35 >= t holds). Exhaustive scan, pure JVM — the exact
    // arithmetic the Catalyst expressions compile to.
    var ceilBroken = 0
    for (n <- 2 to 500; k <- 1 to n) {
      val t = k.toDouble / n // threshold chosen exactly at the boundary
      val kc = math.ceil(t * n).toInt
      if (kc > k) ceilBroken += 1
      val r = if ((kc - 1).toDouble / n >= t) kc - 1 else kc
      assert(r.toDouble / n >= t, s"r=$r not accepted at k=$k n=$n")
      assert(r - 1 < 1 || (r - 1).toDouble / n < t,
        s"r=$r not minimal at k=$k n=$n")
    }
    assert(ceilBroken > 0, "scan should cover cases where bare ceil fails")
  }

  test("containmentPairs finds the boundary pair the ceil prefix lost") {
    // Adversarial (k=29, n_sh=35, t=fl(29/35)): fl(t·35) rounds just
    // above 29, so the old ceil-derived prefix had length 6 — and the
    // contained doc's 6 UNSHARED shingles (df=1, rarest) filled that
    // prefix exactly, so the candidate was never generated even
    // though verify accepts 29/35 >= t. The widened prefix (length 7)
    // must reach one shared shingle and recover the pair.
    val t = 29.0 / 35
    val a = (1 to 37).map(i => f"a$i%02d")           // 35 shingles
    val contained = (2000L, a.mkString(" "))
    val container = (1L, (a.take(31) ++ (1 to 20).map(i => f"x$i%02d"))
      .mkString(" "))                                 // shares exactly 29
    val docs = Seq(container, contained).toDF("doc_id", "text")
    val pairs = Winnowing.containmentPairs(docs, "doc_id", "text", 3, t,
        minShingles = 3)
      .filter(col("id_contained") === 2000L && col("id_container") === 1L)
      .select("n_sh_contained", "containment")
      .as[(Int, Double)].collect().toSeq
    assert(pairs == Seq((35, t)),
      s"boundary pair (overlap 29 of 35) must survive the prefix: $pairs")
  }

  test("containmentPairs catches the quote-inclusion pair Jaccard misses") {
    // a 6-token quote embedded verbatim in a 60-token host: containment
    // = 1.0 but jaccard ≈ 4/58 — invisible to any symmetric threshold
    val quote = "alpha beta gamma delta epsilon zeta"
    val host = ("w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 " +
      "w16 w17 w18 w19 w20 w21 w22 w23 w24 w25 ") + quote +
      (" v1 v2 v3 v4 v5 v6 v7 v8 v9 v10 v11 v12 v13 v14 v15 " +
        "v16 v17 v18 v19 v20 v21 v22 v23 v24 v25")
    val docs = Seq((1L, host), (2L, quote)).toDF("doc_id", "text")

    val jac = Dedup.ngramJaccardSimilar(docs, "doc_id", "text", 3, 0.5)
      .collect()
    assert(jac.isEmpty, "jaccard should NOT flag the asymmetric pair")

    val con = Winnowing.containmentPairs(docs, "doc_id", "text", 3, 0.99,
        minShingles = 3)
      .select("id_contained", "id_container", "containment")
      .as[(Long, Long, Double)].collect().toSeq
    assert(con == Seq((2L, 1L, 1.0)), s"containment should flag it: $con")
  }

  test("tfIdfTopTerms: rare terms outrank common ones, ties break on term") {
    val docs = Seq(
      (1L, "common rare1 common"),
      (2L, "common unique2"),
      (3L, "common common"),
      (4L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", 2)
      .select("id", "rank", "term", "tf", "df", "score")
      .as[(Long, Int, String, Long, Long, Long)].collect().toSeq.sorted
    // n_docs = 3 (the empty doc is excluded); idf_scaled("common") =
    // 1000000*3 div 3 = 1000000; rare1/unique2 → 3000000
    assert(r.filter(_._1 == 1L).map(t => (t._2, t._3)) == Seq((1, "rare1"), (2, "common")))
    assert(r.filter(_._1 == 1L).head._6 == 3000000L)       // tf=1 · idf=3e6
    assert(r.filter(_._1 == 1L).last._6 == 2L * 1000000L)  // tf=2 · idf=1e6
    assert(r.filter(_._1 == 3L) == Seq((3L, 1, "common", 2L, 3L, 2000000L)))
    assert(!r.exists(_._1 == 4L), "empty doc must not appear")
  }

  test("minhash near-dups: exact copy has jaccard 1.0") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    val r = Dedup.minhashNearDuplicates(docs, "doc_id", "text")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
    assert(r == Seq((1L, 2L, 1.0)))
  }

  test("profileApprox tracks the exact profile; nulls/min/max identical") {
    val df = spark.range(5000).toDF("id")
      .withColumn("v", when(pmod(col("id"), lit(10)) === 0, lit(null))
        .otherwise(concat(lit("k"), pmod(col("id"), lit(997)))))
    val exact = graft.ops.Profiling.profile(df, Seq("v"))
      .collect()(0)
    val approx = graft.ops.Profiling.profileApprox(df, Seq("v"))
      .collect()(0)
    assert(exact.getLong(1) == 500 && approx.getLong(1) == 500) // n_nulls
    assert(exact.getLong(2) == 997)
    val err = math.abs(approx.getLong(2) - 997).toDouble / 997
    assert(err < 0.05, s"approx distinct off by $err")
    assert(exact.getString(3) == approx.getString(3)) // min
    assert(exact.getString(4) == approx.getString(4)) // max
  }

  test("driftTvd: 0 for identical corpora, 1e6 for disjoint, exact gap between") {
    import spark.implicits._
    val a = Seq("en", "en", "en", "de").toDF("lang")
    // identical distributions → every gap and the total are 0
    val same = graft.ops.Profiling.driftTvd(a, a, col("lang"))
    assert(same.select("gap_ppm").as[Long].collect().forall(_ == 0L))
    assert(same.select("tvd_ppm").as[Long].head() == 0L)
    // disjoint bucket sets → TVD = 1e6 (absent side fills n=0)
    val b = Seq("fr", "es").toDF("lang")
    val disj = graft.ops.Profiling.driftTvd(a, b, col("lang"))
    assert(disj.select("tvd_ppm").as[Long].head() == 1000000L)
    assert(disj.count() == 4L) // buckets from EITHER side survive
    // a known shift: a = 3/4 en, b = 1/2 en → gap 250000 each side
    val c = Seq("en", "de").toDF("lang")
    val r = graft.ops.Profiling.driftTvd(a, c, col("lang"))
      .select("bucket", "gap_ppm").as[(String, Long)].collect().toMap
    assert(r == Map("en" -> 250000L, "de" -> 250000L))
    // a NULL bucket (unknown language) is one category, not two: the
    // same null share on both sides must contribute zero drift
    val withNull = Seq(Some("en"), Some("en"), Some("en"),
      None: Option[String]).toDF("lang")
    val nr = graft.ops.Profiling.driftTvd(withNull, withNull, col("lang"))
    assert(nr.count() == 2L, "en + the null category")
    assert(nr.select("tvd_ppm").as[Long].head() == 0L,
      "identical corpora with null buckets must read zero drift")
  }

  test("langPuritySpans: code-switch halves, tie priority, markerless and empty docs") {
    import spark.implicits._
    val langs = Seq("en" -> Seq("the"), "de" -> Seq("der"))
    val switched = (Seq.fill(20)("the") ++ Seq.fill(20)("der")).mkString(" ")
    val df = Seq(
      (1L, switched),      // span 0 → en, span 1 → de: purity 50%
      (2L, ""),            // token-less: 0 spans, priority head, 0
      (3L, "xx yy zz"))    // markers absent: ties → priority head
      .toDF("id", "text")
    val r = graft.ops.TextAnalysis
      .langPuritySpans(df, "id", "text", langs, spanTokens = 20)
      .as[(Long, Long, String, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // doc 1's majority is ALSO a tie (1 en span, 1 de span) → priority
    assert(r(1L) == ((2L, "en", 500000L)), r(1L).toString)
    assert(r(2L) == ((0L, "en", 0L)), r(2L).toString)
    assert(r(3L) == ((1L, "en", 1000000L)), r(3L).toString)
  }

  test("corpusDiff: added/removed/changed/unchanged incl. NULL-text docs") {
    import spark.implicits._
    val a = Seq((1L, Some("same")), (2L, Some("old")), (3L, Some("gone")),
      (4L, None: Option[String]), (5L, Some("was text"))).toDF("id", "text")
    val b = Seq((1L, Some("same")), (2L, Some("new")),
      (4L, None: Option[String]), (5L, None: Option[String]),
      (9L, Some("fresh"))).toDF("id", "text")
    val r = graft.ops.Profiling.corpusDiff(a, b, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged",  // null text both sides: present, identical
      5L -> "changed",    // text → null is a change, not a removal
      9L -> "added"))
  }

  test("incremental near-dup ≡ batch minus within-old, on a planted corpus") {
    // old corpus: 40 docs; new batch: 9 near-copies of old docs (last
    // word dropped → shingle jaccard 9/10, inside the [0.8, 1) band)
    // plus one exact within-new duplicate of old doc 0
    def doc(i: Long, words: Int) =
      (i, (0 until words).map(w => s"w${i % 7}_$w").mkString(" "))
    val old = (0L until 40L).map(doc(_, 12))
    val newer = (100L until 109L).map { i =>
      (i, doc(i - 100, 11)._2)
    } :+ (109L, old.head._2)
    val oldDf = old.toDF("doc_id", "text")
    val newDf = newer.toDF("doc_id", "text")

    val index = Dedup.minhashBandIndex(oldDf, "doc_id", "text")
    val inc = Dedup.incrementalNearDuplicates(newDf, index, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    val full = Dedup.minhashNearDuplicates(
      oldDf.unionByName(newDf), "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = full.filterNot { case (a, b) => a < 100 && b < 100 }
    assert(inc == expected, s"inc=$inc expected=$expected")
    assert(inc.nonEmpty)
    assert(inc.exists { case (a, b) => a >= 100 && b >= 100 },
      "within-new pair missing")
    assert(inc.exists { case (a, b) => a < 100 && b >= 100 },
      "cross new-old pair missing")
  }

  test("minhashNearDuplicates ≡ brute-force Jaccard on seeded random docs") {
    // fixed seed → deterministic docs → deterministic xxhash64 LSH:
    // this asserts equality once and stays stable. Near-dup pairs are
    // planted at j ≥ 0.8 where 16×2-row bands have P(miss) ≈ 8e-8.
    val rnd = new scala.util.Random(42)
    val base = (0L until 30L).map { i =>
      (i, Seq.fill(14)(s"w${rnd.nextInt(400)}").mkString(" "))
    }
    // appending ONE word adds one trigram: j = 12/13 ≈ 0.92 ≥ 0.8
    // (dropping a middle word would kill 3 trigrams → j ≈ 0.64)
    val copies = base.take(15).map { case (i, t) =>
      (i + 100, t + " wz")
    }
    val docs = (base ++ copies).toDF("doc_id", "text")

    def shingleSet(t: String): Set[String] = {
      val w = t.trim.split("\\s+").toSeq
      if (w.size < 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val all = (base ++ copies)
    val expected = (for {
      (ia, ta) <- all; (ib, tb) <- all if ia < ib
      sa = shingleSet(ta); sb = shingleSet(tb)
      j = (sa & sb).size.toDouble / (sa | sb).size if j >= 0.8
    } yield (ia, ib)).toSet

    val got = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
      numHashes = 32, bands = 16, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("groupNearDuplicates: copied collection found, disjoint ones spared") {
    // g1 = copy of g0 with one extra doc; g2 disjoint
    val docs = Seq(
      ("g0", "a1 a2 a3 a4 a5 a6"), ("g0", "b1 b2 b3 b4 b5 b6"),
      ("g1", "a1 a2 a3 a4 a5 a6"), ("g1", "b1 b2 b3 b4 b5 b6"),
      ("g1", "c1 c2 c3"),
      ("g2", "z1 z2 z3 z4 z5 z6")).toDF("src", "text")
    val r = Dedup.groupNearDuplicates(docs, "src", "text", threshold = 0.8)
      .as[(String, String, Double)].collect().toSeq
    // g0: 8 shingles; g1: those 8 + 1 ("c1 c2 c3") → jaccard 8/9
    assert(r == Seq(("g0", "g1", 8.0 / 9.0)), r.toString)
  }

  test("dedupCorpus keeps one representative per cluster, all columns intact") {
    val docs = Seq(
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8", "s0"), // cluster {10, 11, 12}
      (11L, "w1 w2 w3 w4 w5 w6 w7 w8", "s1"),
      (12L, "w1 w2 w3 w4 w5 w6 w7 w8", "s0"),
      (20L, "z1 z2 z3 z4 z5 z6 z7 z8", "s1"), // cluster {20, 21}
      (21L, "z1 z2 z3 z4 z5 z6 z7 z8", "s0"),
      (30L, "u1 u2 u3 u4 u5 u6 u7 u8", "s1")) // singleton
      .toDF("doc_id", "text", "source")
    val r = Dedup.dedupCorpus(docs, "doc_id", "text")
      .select("doc_id", "source").as[(Long, String)].collect().toSeq.sorted
    assert(r == Seq((10L, "s0"), (20L, "s1"), (30L, "s1")))
  }

  test("connectedComponentsStar ≡ label propagation on seeded random graphs") {
    // 3 seeded graphs of 20-40 vertices: the equivalence property is
    // shape-driven (cycles, chains, self-merges), not scale-driven —
    // both loop operators cost O(rounds) Spark jobs per graph, so the
    // fixture is sized to what the assertion needs (opt round 16:
    // the suite must fit the driver's test budget)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 20 + rnd.nextInt(20)
      val pairs = Seq.fill(n) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val df = pairs.toDF("id_a", "id_b")
      val star = Dedup.connectedComponentsStar(df)
        .as[(Long, Long)].collect().toSeq.sorted
      val prop = Dedup.connectedComponents(df)
        .as[(Long, Long)].collect().toSeq.sorted
      assert(star == prop, s"pairs=$pairs")
    }
  }

  test("connectedComponentsStar converges on a chain past propagation's horizon") {
    // a 26-vertex path has diameter 25: min-label propagation needs
    // ~25 rounds (its default budget of 20 throws — after burning all
    // 20, so the chain is the shortest that proves the horizon), the
    // alternating star rounds collapse it in O(log n)
    val chain = (0L until 25L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain)
    }
    val r = Dedup.connectedComponentsStar(chain)
      .as[(Long, Long)].collect().toSeq
    assert(r.size == 26 && r.forall(_._2 == 0L), r.sorted.take(5).toString)
  }

  test("component loops with a reliable checkpoint dir match localCheckpoint") {
    import graft.ops.Lineage
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lineage").toString
    try {
      // chain + a separate triangle — exercises multi-round
      // convergence (a 12-chain runs ~12 propagation rounds / ~5 star
      // rounds; round count, not vertex count, is what the
      // reliable-vs-local equivalence must survive)
      val pairs = ((0L until 12L).map(i => (i, i + 1)) ++
        Seq((100L, 101L), (101L, 102L), (102L, 100L))).toDF("id_a", "id_b")
      val local = Dedup.connectedComponentsStar(pairs)
        .as[(Long, Long)].collect().toSeq.sorted
      val reliable = Dedup.connectedComponentsStar(pairs,
        strategy = Lineage.Reliable(s"$dir/star"))
        .as[(Long, Long)].collect().toSeq.sorted
      assert(reliable == local && local.nonEmpty)
      val localP = Dedup.connectedComponents(pairs, maxIter = 30)
        .as[(Long, Long)].collect().toSeq.sorted
      val reliableP = Dedup.connectedComponents(pairs, maxIter = 30,
        strategy = Lineage.Reliable(s"$dir/prop"))
        .as[(Long, Long)].collect().toSeq.sorted
      assert(reliableP == localP && localP == local)
      // superseded rounds are retired EAGERLY: after convergence the
      // scratch holds only the states the returned plan still reads
      // (star: final edges + vertices; propagation: final labels) —
      // scratch stays O(1) states however many rounds the loop ran
      def states(d: String) = new java.io.File(d).listFiles()
        .count(_.getName.startsWith("state_"))
      assert(states(s"$dir/star") == 2, s"star scratch: ${states(s"$dir/star")}")
      assert(states(s"$dir/prop") == 1, s"prop scratch: ${states(s"$dir/prop")}")
      // results are already collected above, so the final states have
      // no remaining reader: cleanup empties the scratch dirs
      assert(Lineage.cleanup(s"$dir/star") == 2)
      assert(Lineage.cleanup(s"$dir/prop") == 1)
      assert(states(s"$dir/star") == 0 && states(s"$dir/prop") == 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("dedupCorpusBy keeps the highest-scoring member, ties break on id") {
    val docs = Seq(
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8", 5),  // cluster {10, 11, 12}
      (11L, "w1 w2 w3 w4 w5 w6 w7 w8", 9),  //   ← winner (best score)
      (12L, "w1 w2 w3 w4 w5 w6 w7 w8", 9),  //   loses tie on id
      (30L, "u1 u2 u3 u4 u5 u6 u7 u8", 1))  // singleton survives
      .toDF("doc_id", "text", "score")
    val r = Dedup.dedupCorpusBy(docs, "doc_id", "text", "score")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(r == Seq(11L, 30L))
  }

  test("l2Normalize: unit norm, zero vector → null") {
    val df = Seq(Seq(3f, 4f), Seq(0f, 0f)).toDF("v")
      .select(Similarity.l2Normalize(col("v")).as("n"))
    val r = df.as[Option[Seq[Double]]].collect()
    assert(r(0).get == Seq(0.6, 0.8))
    assert(r(1).isEmpty)
  }

  test("meanPoolVectors: exact positional means, null vectors ignored") {
    val df = Seq(
      ("a", Some(Seq(1.0, 2.0, 3.0))),
      ("a", Some(Seq(3.0, 4.0, 5.0))),
      ("a", None),
      ("b", Some(Seq(10.0, 20.0, 30.0))))
      .toDF("doc", "vec")
    val r = Similarity.meanPoolVectors(df, "doc", "vec")
      .as[(String, Seq[Double])].collect().toMap
    assert(r("a") == Seq(2.0, 3.0, 4.0))
    assert(r("b") == Seq(10.0, 20.0, 30.0))
  }

  test("cosine: orthogonal → 0, identical → 1, zero-norm → null (no ANSI abort)") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 2f), Seq(1f, 2f)),
      (Seq(0f, 0f), Seq(1f, 2f))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val r = df.collect()
    assert(math.abs(r(0).getDouble(0)) < 1e-12)
    assert(math.abs(r(1).getDouble(0) - 1.0) < 1e-12)
    assert(r(2).isNullAt(0))
  }

  test("qualityFeatures on empty text: NULL ratios, not DIVIDE_BY_ZERO") {
    val df = Seq("", "a b").toDF("text")
      .select(TextAnalysis.qualityFeatures(col("text"), Seq("a")): _*)
    val rows = df.collect()
    assert(rows(0).isNullAt(2) && rows(0).isNullAt(3)) // ratios null
    assert(rows(0).getInt(1) == 0)                     // n_tokens 0
    assert(rows(1).getDouble(3) == 0.5)                // stopword ratio
  }

  test("lshTopK cosines agree with the exhaustive ranking") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, (0 until 8).map(j => ((i * 7 + j * 13) % 17 - 8).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 5)
    // all-pair cosines as ground truth
    val all = Similarity.bruteForceTopK(q, vecs, "vec_id", "embedding", 49)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val ann = Similarity.lshTopK(q, vecs, "vec_id", "embedding", 5,
      numPlanes = 4, probes = 2)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
    assert(ann.nonEmpty)
    ann.foreach { case (qid, nid, c) =>
      assert(math.abs(all((qid, nid)) - c) < 1e-12, s"pair ($qid,$nid)")
    }
  }

  test("ivfTopK cosines agree with the exhaustive ranking") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, (0 until 8).map(j => ((i * 11 + j * 7) % 19 - 9).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 4)
    val all = Similarity.bruteForceTopK(q, vecs, "vec_id", "embedding", 59)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val ivf = Similarity.ivfTopK(q, vecs, "vec_id", "embedding", 5,
      nCells = 8, nProbe = 3)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (qid, nid, c) =>
      assert(math.abs(all((qid, nid)) - c) < 1e-12, s"pair ($qid,$nid)")
    }
  }

  test("semanticNearDuplicates: planted copy found in its cell, organic pairs spared") {
    val vecs = (0 until 60).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, Seq.fill(8)((r.nextDouble() - 0.5).toFloat))
    }.toDF("vec_id", "embedding")
    // plant exact copies of vectors 5 and 17
    val corpus = vecs.unionByName(
      vecs.filter(col("vec_id").isin(5, 17))
        .withColumn("vec_id", col("vec_id") + 1000L))
    val pairs = Similarity.semanticNearDuplicates(
      corpus, "vec_id", "embedding", threshold = 0.999, nCells = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the planted copies are found (same cell: identical vector ⇒
    // identical centroid ranking), and nothing else clears 0.999
    assert(pairs == Set((5L, 1005L), (17L, 1017L)))
  }

  test("multimodal resize: payload tracks target dims, meta updated") {
    val docs = Seq((1L, "0123456789abcdef"), (2L, "xy")).toDF("doc_id", "text")
    val out = Multimodal.resize(
      Multimodal.packFromText(docs, "doc_id", "text"), w = 2, h = 4)
      .select(col("media_id"), octet_length(col("media")).as("len"),
        col("meta.width"), col("meta.height"))
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 8, 2, 4), (2L, 8, 2, 4))) // truncated / padded
  }

  test("multimodal sampleFrames: slicing, stride, order-stable index") {
    val docs = Seq((1L, "aaaabbbbccccdddd")).toDF("doc_id", "text") // 16 bytes
    val frames = Multimodal.sampleFrames(
      Multimodal.packFromText(docs, "doc_id", "text"), frameBytes = 4, every = 2)
      .select(col("frame_idx"), col("frame").cast("string"))
      .as[(Int, String)].collect().sortBy(_._1).toSeq
    assert(frames == Seq((0, "aaaa"), (2, "cccc"))) // every 2nd frame
  }

  test("multimodal: batched stub decode preserves ids and byte counts") {
    val docs = Seq((1L, "abc"), (2L, "defg"), (3L, "")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(
      Multimodal.packFromText(docs, "doc_id", "text"), batchSize = 2)
      .select("media_id", "n_bytes", "mean_byte")
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3, ('a' + 'b' + 'c').toDouble / 3),
      (2L, 4, ('d' + 'e' + 'f' + 'g').toDouble / 4),
      (3L, 0, 0.0)))
  }

  test("approx sketches track exact cardinality within rsd bounds") {
    // the 100 TB cardinality path: exact COUNT(DISTINCT) shuffles the
    // full key set; approx_count_distinct (HLL++) is one pass with
    // fixed memory. Sanity-pin the error envelope we'd budget for.
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val words = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
    val exact = words.select(countDistinct("w")).as[Long].collect()(0)
    val approx = words.select(approx_count_distinct("w", 0.02)).as[Long].collect()(0)
    assert(exact > 0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.05, s"approx=$approx exact=$exact err=$err")
  }

  test("scrubPii: rules applied in order, count matches redactions") {
    val rules = Seq(
      "[a-z0-9]+@[a-z.]+" -> "<EMAIL>",
      "http://[a-z./]+" -> "<URL>")
    val df = Seq(
      "mail me at bob@x.com or see http://x.io/a",
      "no pii here at all",
      "two mails a@b.c and d@e.f").toDF("text")
      .select(
        TextAnalysis.scrubPii(col("text"), rules).as("clean"),
        TextAnalysis.piiCount(col("text"), rules.map(_._1)).as("n"))
    val out = df.as[(String, Int)].collect().toSeq
    assert(out(0) == ("mail me at <EMAIL> or see <URL>", 2))
    assert(out(1) == ("no pii here at all", 0))
    assert(out(2) == ("two mails <EMAIL> and <EMAIL>", 2))
  }

  test("bigramLmScore: exact scaled conditional probabilities") {
    val docs = Seq(
      (1L, "a b a b c"), // bigrams: ab ba ab bc
      (2L, "a b x"),     // bigrams: ab bx
      (3L, "solo")).toDF("doc_id", "text")
    // corpus: c(a b)=3 c(b a)=1 c(b c)=1 c(b x)=1; c(a·)=3 c(b·)=3
    val out = TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .orderBy("id")
      .select("id", "n_bigrams", "mean_cond_ppm", "singleton_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 666666L, 500000L), // (1e6+333333+1e6+333333) div 4
      (2L, 2L, 666666L, 500000L), // (1e6+333333) div 2; bx singleton
      (3L, 0L, 0L, 0L)))
  }

  test("gopherQualityFlags: each rule is an exact integer comparison") {
    val flags = TextAnalysis.gopherQualityFlags(col("text"), Seq("the"),
      minWords = 3, minStopHits = 1)
    val df = Seq(
      "the cats sat onto the mat", // all rules pass
      "# # # ... x1",              // symbols, alpha, mean-len fail
      "ab cd"                      // word count fails
    ).toDF("text").select(flags: _*)
    val rows = df.collect()
    assert(rows(0).toSeq == Seq(true, true, true, true, true))
    assert(rows(1).toSeq == Seq(true, false, false, false, false))
    assert(rows(2).toSeq(0) == false)
  }

  test("lineRepetitionSignals counts repeated lines and their characters") {
    val sig = TextAnalysis.lineRepetitionSignals(col("text"))
    val df = Seq(
      (1L, "aaa\nbbbb\naaa\n\n  \ncc"), // aaa repeats: 2 dup lines, 6 chars
      (2L, "one\ntwo\nthree"),           // no repeats
      (3L, "")                           // empty doc
    ).toDF("doc_id", "text").select((col("doc_id") +: sig): _*)
    val out = df.orderBy("doc_id").as[(Long, Int, Int, Int, Int)]
      .collect().toSeq
    assert(out == Seq(
      (1L, 4, 1, 6, 12), // 4 non-empty lines, 4-3 distinct, 3+3 dup chars
      (2L, 3, 0, 0, 11),
      (3L, 0, 0, 0, 0)))
  }

  test("c4Clean applies every C4 rule and pins the rewrites") {
    val doc1 = Seq( // 3 kept lines (one repeated), junk dropped
      "This first line has five good words.",
      "short line.",                       // < 5 words
      "no terminal punctuation on this line",
      "Enable JavaScript to use this site.", // banned word
      "This first line has five good words.", // dup of kept line 1
      "Another closing line with enough words!").mkString("\n")
    val doc2 = "Too few surviving lines here honestly." // 1 kept < 3
    val doc3 = doc1 + "\ntemplate { x }"   // curly brace kills the page
    val out = TextAnalysis.c4Clean(
      Seq((1L, doc1), (2L, doc2), (3L, doc3)).toDF("doc_id", "text"),
      "doc_id", "text")
      .orderBy("id")
      .select("id", "n_lines", "n_kept", "keep_doc", "clean_md5",
        "dedup_md5")
      .as[(Long, Int, Int, Boolean, String, String)].collect().toSeq
    val kept1 = Seq(
      "This first line has five good words.",
      "This first line has five good words.",
      "Another closing line with enough words!")
    def m(s: Seq[String]) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0) == (1L, 6, 3, true, m(kept1), m(kept1.distinct)))
    assert(out(1) == (2L, 1, 1, false, m(Seq(doc2)), m(Seq(doc2))))
    assert(out(2)._4 == false) // brace page dropped, lines unchanged
    assert(out(2)._3 == 3)
  }

  test("BloomJoin semi/anti ≡ plain joins even with a high-fpp sketch") {
    val rnd = new scala.util.Random(7)
    val fact = (1 to 400).map(i => (i.toLong, rnd.nextInt(60).toLong))
      .toDF("row_id", "k")
    val keys = (1 to 25).map(_ => rnd.nextInt(60).toLong).distinct
      .toDF("key")
    // fpp 0.5 forces false positives through the residual join
    val semi = BloomJoin.semiJoin(fact, keys, "k", "key", 100L, 0.5)
      .orderBy("row_id").select("row_id", "k")
      .as[(Long, Long)].collect().toSeq
    val wantSemi = fact.join(keys.withColumnRenamed("key", "k"),
        Seq("k"), "left_semi")
      .orderBy("row_id").select("row_id", "k")
      .as[(Long, Long)].collect().toSeq
    assert(semi == wantSemi)
    val anti = BloomJoin.antiJoin(fact, keys, "k", "key", 100L, 0.5)
      .orderBy("row_id").select("row_id", "k")
      .as[(Long, Long)].collect().toSeq
    val wantAnti = fact.join(keys.withColumnRenamed("key", "k"),
        Seq("k"), "left_anti")
      .orderBy("row_id").select("row_id", "k")
      .as[(Long, Long)].collect().toSeq
    assert(anti == wantAnti)
    assert(anti.nonEmpty && semi.nonEmpty)
  }

  test("BloomJoin string keys and null keys behave like the plain joins") {
    val fact = Seq((1L, "aa"), (2L, "bb"), (3L, null.asInstanceOf[String]),
      (4L, "cc"), (5L, "aa")).toDF("row_id", "k")
    val keys = Seq("aa", "zz").toDF("key")
    val semi = BloomJoin.semiJoin(fact, keys, "k", "key", 10L, 0.01)
      .orderBy("row_id").select("row_id").as[Long].collect().toSeq
    assert(semi == Seq(1L, 5L))
    val anti = BloomJoin.antiJoin(fact, keys, "k", "key", 10L, 0.01)
      .orderBy("row_id").select("row_id").as[Long].collect().toSeq
    assert(anti == Seq(2L, 3L, 4L)) // null kept, like left_anti
  }

  test("countMin cells match a brute-force sketch of the same stream") {
    import graft.ops.Sketches
    val rnd = new scala.util.Random(11)
    val words = Seq.fill(300)(s"w${rnd.nextInt(40)}")
    val depth = 3; val width = 16
    val got = Sketches.countMin(words.toDF("w"), "w", depth, width)
      .orderBy("r", "b").as[(Int, Long, Long)].collect().toSeq
    // byte-route derivation of the same Kirsch-Mitzenmacher buckets
    // the Spark side computes via hex substrings — proves the two
    // routes agree as well as the sketch counts
    def bucket(w: String, r: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      val bb = java.nio.ByteBuffer.wrap(d)
      ((bb.getLong(0) >>> 4) + r.toLong * (bb.getLong(8) >>> 4)) % width
    }
    val want = (for { w <- words; r <- 0 until depth }
      yield (r, bucket(w, r)))
      .groupBy(identity).map { case ((r, b), g) => (r, b, g.size.toLong) }
      .toSeq.sorted
    assert(got == want)
  }

  test("heavyHitters ≡ plain groupBy-having even with heavy collisions") {
    import graft.ops.Sketches
    val rnd = new scala.util.Random(23)
    // skewed stream: a few hot tokens + a long tail
    val words = (Seq.fill(120)("hot1") ++ Seq.fill(80)("hot2") ++
      Seq.fill(800)(s"tail${rnd.nextInt(300)}"))
    val df = words.toDF("w")
    // width 8 → constant collisions → many false candidates, zero misses
    val got = Sketches.heavyHitters(df, "w", phiPct = 5, depth = 2,
        width = 8)
      .orderBy("w").as[(String, Long)].collect().toSeq
    val n = words.size
    val want = words.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .filter { case (_, c) => c * 100 >= n.toLong * 5 }
      .sortBy(_._1)
    assert(got == want)
    assert(got.map(_._1).contains("hot1"))
  }

  test("hllEstimate lands within the published bound of exact distinct") {
    import graft.ops.Sketches
    val rnd = new scala.util.Random(31)
    val words = Seq.fill(20000)(s"t${rnd.nextInt(5000)}")
    val p = 8 // m=256 → σ ≈ 6.5%; deterministic data, assert 4σ
    val regs = Sketches.hllRegisters(words.toDF("w"), "w", p)
    val est = Sketches.hllEstimate(regs, p)
    val exact = words.distinct.size.toDouble
    assert(math.abs(est - exact) / exact < 0.26,
      s"est=$est exact=$exact")
  }

  test("hllRegistersBy ≡ hllRegisters run on each group separately") {
    import graft.ops.Sketches
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(600)((s"g${rnd.nextInt(3)}", s"t${rnd.nextInt(200)}"))
    val df = rows.toDF("g", "w")
    val grouped = Sketches.hllRegistersBy(df, Seq("g"), "w", 5)
      .orderBy("g", "j").as[(String, Long, Int)].collect().toSeq
    val separate = rows.map(_._1).distinct.sorted.flatMap { g =>
      Sketches.hllRegisters(
          rows.filter(_._1 == g).map(_._2).toDF("w"), "w", 5)
        .orderBy("j").as[(Long, Int)].collect().toSeq
        .map { case (j, r) => (g, j, r) }
    }
    assert(grouped == separate)
  }

  test("bottomK merge of split scans ≡ sketch of the union; estimate in bound") {
    import graft.ops.Sketches
    val ids = (1L to 8000L)
    val (a, b) = ids.partition(_ % 3 == 0) // uneven, disjoint shards
    val k = 256
    val merged = Sketches.mergeBottomK(
        Sketches.bottomK(a.toDF("id"), "id", k),
        Sketches.bottomK(b.toDF("id"), "id", k), k, "id")
      .orderBy("hv", "id").as[(Long, Long)].collect().toSeq
    val whole = Sketches.bottomK(ids.toDF("id"), "id", k)
      .orderBy("hv", "id").as[(Long, Long)].collect().toSeq
    assert(merged == whole)
    // overlapping shards: shared keys dedup, never double-fill slots
    val overlap = Sketches.mergeBottomK(
        Sketches.bottomK(ids.take(5000).toDF("id"), "id", k),
        Sketches.bottomK(ids.drop(3000).toDF("id"), "id", k), k, "id")
      .orderBy("hv", "id").as[(Long, Long)].collect().toSeq
    assert(overlap == whole)
    // KMV estimate: σ ≈ 1/√(k−2) ≈ 6.3% at k=256; deterministic
    // data, assert 4σ
    val est = Sketches.kmvEstimate(Sketches.bottomK(ids.toDF("id"), "id", k), k)
    assert(math.abs(est - 8000.0) / 8000.0 < 0.25, s"est=$est")
    // under-full sketch = exact count
    assert(Sketches.kmvEstimate(
      Sketches.bottomK((1L to 57L).toDF("id"), "id", k), k) == 57.0)
  }

  test("bottomK plans as TakeOrdered, never a full sort-shuffle") {
    import graft.ops.Sketches
    val df = Sketches.bottomK(
      (1L to 1000L).toDF("id").repartition(7), "id", 64)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"bottom-k lost its bounded-state plan:\n$plan")
  }

  test("BloomJoin integer keys hash consistently between build and probe") {
    val fact = Seq((1L, 10), (2L, 20), (3L, 30), (4L, 10))
      .toDF("row_id", "k")
    val keys = Seq(10, 99).toDF("key")
    val semi = BloomJoin.semiJoin(fact, keys, "k", "key", 10L, 0.01)
      .orderBy("row_id").select("row_id").as[Long].collect().toSeq
    assert(semi == Seq(1L, 4L))
    val anti = BloomJoin.antiJoin(fact, keys, "k", "key", 10L, 0.01)
      .orderBy("row_id").select("row_id").as[Long].collect().toSeq
    assert(anti == Seq(2L, 3L))
  }

  test("hllMerge of split scans ≡ registers of the union") {
    import graft.ops.Sketches
    val rnd = new scala.util.Random(37)
    val a = Seq.fill(500)(s"a${rnd.nextInt(300)}")
    val b = Seq.fill(500)(s"b${rnd.nextInt(300)}")
    val merged = Sketches.hllMerge(
        Sketches.hllRegisters(a.toDF("w"), "w", 6),
        Sketches.hllRegisters(b.toDF("w"), "w", 6))
      .orderBy("j").as[(Long, Int)].collect().toSeq
    val whole = Sketches.hllRegisters((a ++ b).toDF("w"), "w", 6)
      .orderBy("j").as[(Long, Int)].collect().toSeq
    assert(merged == whole)
  }

  test("duplicatedSpans merges overlapping spans and counts each word once") {
    // docs 1 and 2 share the 7-gram "s1..s7" (three overlapping 5-gram
    // spans → one merged island of 7 words); doc 3 additionally shares
    // a disjoint 5-gram "t1..t5" with doc 1; doc 4 is unique; doc 5 is
    // below the n-gram size; doc 6 is empty.
    val docs = Seq(
      (1L, "s1 s2 s3 s4 s5 s6 s7 u1 u2 u3 t1 t2 t3 t4 t5"),
      (2L, "x1 s1 s2 s3 s4 s5 s6 s7 x2"),
      (3L, "t1 t2 t3 t4 t5 y1 y2 y3 y4 y5"),
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8"),
      (5L, "w1 w2"),
      (6L, "")).toDF("doc_id", "text")
    val out = Winnowing.duplicatedSpans(docs, "doc_id", "text", n = 5)
      .orderBy("id")
      .select("id", "n_tokens", "dup_tokens", "dup_ppm")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 15, 12L, 800000L), // 7-word island + disjoint 5-word island
      (2L, 9, 7L, 777777L),
      (3L, 10, 5L, 500000L),
      (4L, 8, 0L, 0L),
      (5L, 2, 0L, 0L),
      (6L, 0, 0L, 0L)))
  }

  test("kmeans separates two obvious clusters and is deterministic") {
    // two tight 2-D blobs; the id%2 init seeds one centroid in each
    // blob (min even id 0 → blob A, min odd id 1 → blob B), and the
    // Lloyd iterations pull every member to its blob
    val pts = Seq(
      (0L, Seq(0.0f, 0.1f)), (2L, Seq(0.1f, 0.0f)), (4L, Seq(0.05f, 0.05f)),
      (1L, Seq(5.0f, 5.1f)), (3L, Seq(5.1f, 5.0f)), (5L, Seq(5.05f, 5.05f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.KMeans
      .train(pts, "vec_id", "embedding", k = 2, iters = 3)
      .orderBy("id").as[(Long, Int)].collect().toSeq
    val byCluster = out.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(byCluster == Set(Set(0L, 2L, 4L), Set(1L, 3L, 5L)),
      s"clusters wrong: $out")
    val again = graft.ops.KMeans
      .train(pts, "vec_id", "embedding", k = 2, iters = 3)
      .orderBy("id").as[(Long, Int)].collect().toSeq
    assert(out == again, "training is not deterministic")
    // k > distinct init cells with members: empty cluster keeps its
    // previous centroid and training still completes
    val sparse = graft.ops.KMeans
      .train(pts, "vec_id", "embedding", k = 5, iters = 2)
      .orderBy("id").as[(Long, Int)].collect().toSeq
    assert(sparse.size == 6)
  }

  test("clusterBalance reports exact shares and the max-cell imbalance") {
    // 4+2+2 over k=4 (one empty cell): shares 500000/250000/250000,
    // imbalance = 4·4·10⁶ div 8 = 2000000 (max cell is 2× ideal)
    val assigned = Seq(
      (0L, 0), (1L, 0), (2L, 0), (3L, 0),
      (4L, 1), (5L, 1), (6L, 2), (7L, 2)).toDF("id", "cluster")
    val r = graft.ops.KMeans.clusterBalance(assigned, k = 4)
      .orderBy("cluster")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (0, 4L, 500000L, 2000000L),
      (1, 2L, 250000L, 2000000L),
      (2, 2L, 250000L, 2000000L)))
  }

  test("kmeans codebook returns per-cluster float means") {
    val pts = Seq(
      (0L, Seq(0.0f, 2.0f)), (2L, Seq(2.0f, 0.0f)),
      (1L, Seq(10.0f, 10.0f))).toDF("vec_id", "embedding")
    val cb = graft.ops.KMeans
      .codebook(pts, "vec_id", "embedding", k = 2, iters = 2)
      .orderBy("cluster")
      .as[(Int, Seq[Double])].collect().toSeq
    assert(cb.map(_._2).toSet == Set(Seq(1.0, 1.0), Seq(10.0, 10.0)))
  }

  test("product quantization: codebook vectors encode to their own code") {
    // 4-dim vectors, m=2 subspaces of 2, k=2 codes: ids 0,1 define the
    // codebook (id%2); every vector must encode to its nearest
    // centroid in each subspace independently
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f, 9.0f, 9.0f)),
      (1L, Seq(5.0f, 5.0f, 1.0f, 1.0f)),
      (2L, Seq(0.1f, 0.1f, 1.2f, 0.9f)), // sub0 → code 0, sub1 → code 1
      (3L, Seq(4.9f, 5.2f, 8.8f, 9.1f))) // sub0 → code 1, sub1 → code 0
      .toDF("vec_id", "embedding")
    val cb = graft.ops.ProductQuant.standInCodebook(
      vecs, "vec_id", "embedding", dim = 4, m = 2, k = 2)
    val codes = graft.ops.ProductQuant.encode(
      vecs, cb, "vec_id", "embedding", dim = 4, m = 2)
      .orderBy("id", "sub")
      .as[(Long, Int, Int)].collect().toSeq
    assert(codes == Seq(
      (0L, 0, 0), (0L, 1, 0), // own codebook rows
      (1L, 0, 1), (1L, 1, 1),
      (2L, 0, 0), (2L, 1, 1),
      (3L, 0, 1), (3L, 1, 0)))
  }

  test("editDistanceNearDuplicates: blocking + levenshtein residual") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zetaX"), // 1 char edit
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (4L, "one two three four five six seven")).toDF("doc_id", "text")
    val out = Dedup.editDistanceNearDuplicates(docs, "doc_id", "text",
      maxDist = 5, shingleN = 3, jaccardFloor = 0.5)
      .select("id_a", "id_b", "edit_dist")
      .as[(Long, Long, Int)].collect().toSeq
    // 1↔2 is one substitution; 1↔3 shares shingles but is 24 chars
    // apart; 4 shares nothing
    assert(out == Seq((1L, 2L, 1)))
  }

  test("removeDuplicatedSpans rewrites docs without their shared spans") {
    val docs = Seq(
      (1L, "s1 s2 s3 s4 s5 s6 s7 u1 u2 u3"), // shares s1..s7 with doc 2
      (2L, "x1 s1 s2 s3 s4 s5 s6 s7 x2"),
      (3L, "q1 q2 q3 q4 q5 q6"),             // unique — untouched
      (4L, "")).toDF("doc_id", "text")
    val out = Winnowing.removeDuplicatedSpans(docs, "doc_id", "text", n = 5)
      .orderBy("id")
      .select("id", "clean_text", "n_tokens", "n_kept")
      .as[(Long, String, Int, Int)].collect().toSeq
    assert(out == Seq(
      (1L, "u1 u2 u3", 10, 3),
      (2L, "x1 x2", 9, 2),
      (3L, "q1 q2 q3 q4 q5 q6", 6, 6),
      (4L, "", 0, 0)))
  }

  test("fuzzyContaminatedDocs flags paraphrased benchmark overlap, best match wins") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words entirely here now"),
      (3L, "the quick brown fox jumps over a sleepy cat")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog indeed"),
      (101L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val out = Dedup.fuzzyContaminatedDocs(corpus, bench, "doc_id", "text",
      n = 3, threshold = 0.6)
      .orderBy("id").select("id", "bench_id")
      .as[(Long, Long)].collect().toSeq
    // doc 1 matches bench 101 exactly (jaccard 1 beats 100's subset);
    // doc 2 shares nothing; doc 3's overlap is below the threshold
    assert(out == Seq((1L, 101L)))
  }

  test("duplicatedSpans ≡ brute-force reference on random corpora") {
    val rnd = new scala.util.Random(99)
    val vocab = Vector("a", "b", "c", "d", "e")
    val n = 4
    val docs = (1L to 40L).map { i =>
      i -> Seq.fill(3 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    // independent reference: mark positions covered by any n-gram
    // that appears in ≥2 distinct docs, count marked positions
    val grams = docs.flatMap { case (id, text) =>
      val t = text.split("\\s+").toSeq
      if (t.size < n) Seq.empty
      else (0 to t.size - n).map(p => (t.slice(p, p + n).mkString(" "), id, p))
    }
    val dupSet = grams.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2)
      .keySet
    val want = docs.map { case (id, text) =>
      val t = text.split("\\s+").toSeq
      val covered = Array.fill(t.size)(false)
      if (t.size >= n)
        for (p <- 0 to t.size - n
             if dupSet(t.slice(p, p + n).mkString(" "));
             q <- p until p + n) covered(q) = true
      (id, t.size, covered.count(identity).toLong)
    }.sortBy(_._1)
    val got = Winnowing.duplicatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", n = n)
      .orderBy("id").select("id", "n_tokens", "dup_tokens")
      .as[(Long, Int, Long)].collect().toSeq
    assert(got == want)
  }

  test("duplicatedSpans covers a full near-copy end to end") {
    val base = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    val docs = Seq((1L, base), (2L, base), (3L, "q1 q2 q3 q4 q5 q6"))
      .toDF("doc_id", "text")
    val out = Winnowing.duplicatedSpans(docs, "doc_id", "text", n = 5)
      .orderBy("id").select("id", "dup_ppm").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1000000L), (2L, 1000000L), (3L, 0L)))
  }

  test("Validation.report: one pass, null verdicts are violations; surplus counts dups") {
    import graft.ops.Validation
    import graft.ops.Validation.Check
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (2L, 50.0), (3L, null), (3L, 2.0), (1L, 1.0))
      .toDF("k", "v")
    val rep = Validation.report(df, Seq(
      Check("v_small", col("v") <= 10),   // 50.0 fails, null fails → 2
      Check("v_notnull", col("v").isNotNull))) // 1 violation
      .orderBy("check_name")
      .as[(String, Long, Long)].collect().toSeq
    assert(rep == Seq(("v_notnull", 1L, 5L), ("v_small", 2L, 5L)))
    val surplus = Validation.duplicateSurplus(df, Seq("k"), "k_unique")
      .as[(String, Long, Long)].collect().head
    assert(surplus == (("k_unique", 2L, 5L))) // keys 1 and 3 doubled
    // empty input: zero rows, zero violations, no null sums
    val empty = Validation.duplicateSurplus(df.filter(col("k") > 99), Seq("k"), "e")
      .as[(String, Long, Long)].collect().head
    assert(empty == (("e", 0L, 0L)))
  }

  test("logHistogram: small values exact, bucket lower bound within 2^-subBits") {
    import graft.ops.Sketches
    val m = 4
    val vals = (0L to 15L) ++ Seq(16L, 17L, 100L, 1000L, 123456L, (1L << 40) + 12345L)
    val df = vals.map(v => ("g", v)).toDF("g", "v")
    val sk = Sketches.logHistogram(df, Seq("g"), col("v"), m)
    // readback: every value's bucket lower bound brackets it
    val lows = Sketches.logHistogram(df.withColumn("orig", col("v")), Seq("orig"),
        col("v"), m)
      .select(col("orig"),
        Sketches.logHistBucketLower(col("bucket"), m).as("low"))
      .as[(Long, Long)].collect()
    lows.foreach { case (v, low) =>
      assert(low <= v, s"v=$v low=$low")
      assert(v.toDouble < (low.toDouble + 1.0) * (1.0 + math.pow(2.0, -m)) + 1,
        s"v=$v low=$low outside relative bound")
      if (v < 16) assert(low == v, s"small value $v not exact (low=$low)")
    }
    // total count preserved
    assert(sk.agg(sum("count")).as[Long].collect()(0) == vals.size)
  }

  test("logHistMerge of split scans ≡ sketch of the union") {
    import graft.ops.Sketches
    val rnd = new scala.util.Random(53)
    val a = Seq.fill(800)(("g" + rnd.nextInt(3), rnd.nextInt(100000).toLong))
    val b = Seq.fill(700)(("g" + rnd.nextInt(3), rnd.nextInt(1000).toLong))
    val sa = Sketches.logHistogram(a.toDF("g", "v"), Seq("g"), col("v"), 4)
    val sb = Sketches.logHistogram(b.toDF("g", "v"), Seq("g"), col("v"), 4)
    val merged = Sketches.logHistMerge(sa, sb, Seq("g"))
      .orderBy("g", "bucket").as[(String, Long, Long)].collect().toSeq
    val union = Sketches.logHistogram((a ++ b).toDF("g", "v"), Seq("g"),
        col("v"), 4)
      .orderBy("g", "bucket").as[(String, Long, Long)].collect().toSeq
    assert(merged == union)
  }

  test("logHistQuantiles: readout brackets the exact percentile-disc value") {
    import graft.ops.{Sampling, Sketches}
    val m = 5 // 2^-5 ≈ 3.1% relative error
    val rnd = new scala.util.Random(67)
    // mixed magnitudes: uniform small + log-uniform large
    val rows = (1L to 3000L).map { i =>
      val v = if (i % 3 == 0) rnd.nextInt(30).toLong
              else math.round(math.pow(10.0, rnd.nextDouble() * 6))
      (i, s"g${i % 4}", v)
    }
    val df = rows.toDF("id", "g", "v")
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val exact = Sampling.discreteQuantiles(df, "g", "id", col("v"), ps)
      .orderBy("g").as[(String, Long, Long, Long)].collect()
    val sk = Sketches.logHistogram(df, Seq("g"), col("v"), m)
    val est = Sketches.logHistQuantiles(sk, Seq("g"), m, ps)
      .orderBy("g").as[(String, Long, Long, Long)].collect()
    exact.zip(est).foreach { case ((g1, e50, e90, e99), (g2, s50, s90, s99)) =>
      assert(g1 == g2)
      Seq((e50, s50), (e90, s90), (e99, s99)).foreach { case (e, s) =>
        assert(s <= e, s"group $g1: est $s above exact $e")
        assert(e < (s + 1) * (1.0 + math.pow(2.0, -m)),
          s"group $g1: exact $e outside bucket of est $s")
      }
    }
  }

  test("sufficientStats: exact fit on a planted line; shard sums merge") {
    val df = Seq(
      ("a", Some(1.0), 3.0), ("a", Some(2.0), 5.0),
      ("a", Some(3.0), 7.0),                       // y = 2x + 1
      ("b", Some(1.0), 4.0), ("b", Some(2.0), 4.0), // flat: slope 0
      ("b", None, 9.0))                             // null x dropped
      .toDF("g", "x", "y")
    val r = graft.ops.Profiling.sufficientStats(df, Seq("g"), "x", "y")
      .orderBy("g").collect()
    val a = r(0)
    assert(a.getLong(1) == 3 && a.getDouble(2) == 6.0 && a.getDouble(3) == 15.0)
    assert(a.getDouble(7) == 2.0, "slope")        // exact: integer arithmetic
    assert(a.getDouble(8) == 1.0, "intercept")
    assert(math.abs(a.getDouble(9) - 1.0) < 1e-12, "r on a perfect line")
    val b = r(1)
    assert(b.getLong(1) == 2, "null x excluded")
    assert(b.getDouble(7) == 0.0 && b.getDouble(8) == 4.0)
    assert(b.isNullAt(9), "r undefined when y has zero variance")

    // mergeability: shard-level sums combine to the full-table sums
    val full = graft.ops.Profiling
      .sufficientStats(df.filter(col("g") === "a"), Seq("g"), "x", "y")
      .select("n", "sum_x", "sum_y", "sum_xx", "sum_xy", "sum_yy")
      .as[(Long, Double, Double, Double, Double, Double)].head()
    val shards = Seq(
      df.filter(col("g") === "a" && col("x") <= 1.5),
      df.filter(col("g") === "a" && col("x") > 1.5))
      .map(graft.ops.Profiling.sufficientStats(_, Seq("g"), "x", "y")
        .select("n", "sum_x", "sum_y", "sum_xx", "sum_xy", "sum_yy")
        .as[(Long, Double, Double, Double, Double, Double)].head())
    val merged = shards.reduce((p, q) => (p._1 + q._1, p._2 + q._2,
      p._3 + q._3, p._4 + q._4, p._5 + q._5, p._6 + q._6))
    assert(merged == full)
  }

  test("chunkDedup ≡ brute-force reference on random corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("w1", "w2", "w3")
    val ct = 4 // chunkTokens
    // short docs, tiny vocab: many cross-doc duplicate chunks, plus
    // empty and whitespace-only docs to pin the 0-chunk rows
    val docs = (1L to 60L).map { i =>
      val body =
        if (i % 17 == 0) ""
        else if (i % 19 == 0) "   "
        else Seq.fill(1 + rnd.nextInt(11))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      i -> body
    }
    // reference: explode every doc into ct-token chunks, winner per
    // distinct chunk = lexicographically smallest (id, chunk_idx)
    val chunks = docs.flatMap { case (id, text) =>
      val t = text.trim
      if (t.isEmpty) Seq.empty
      else t.split("\\s+").toSeq.grouped(ct).zipWithIndex
        .map { case (c, idx) => (c.mkString(" "), id, idx) }.toSeq
    }
    val winner = chunks.groupBy(_._1)
      .map { case (c, occ) => c -> occ.map(o => (o._2, o._3)).min }
    val want = docs.map { case (id, text) =>
      val mine = chunks.filter(_._2 == id)
      (id, mine.size.toLong,
        mine.count(o => winner(o._1) == ((o._2, o._3))).toLong)
    }.sortBy(_._1)
    val got = Dedup.chunkDedup(docs.toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens = ct)
      .orderBy("id").select("id", "n_chunks", "n_kept")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("meanPoolVectors ≡ naive per-group mean on random ragged groups") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 200).map { i =>
      val g = s"g${rnd.nextInt(7)}"
      // exact integer-valued doubles: sums are order-independent
      val v: Seq[Double] =
        if (i % 23 == 0) null
        else Seq.fill(6)(rnd.nextInt(1000).toDouble)
      (g, v)
    }
    val want = rows.filter(_._2 != null).groupBy(_._1).map { case (g, rs) =>
      g -> (0 until 6).map(j => rs.map(_._2(j)).sum / rs.size)
    }
    val got = Similarity.meanPoolVectors(
        rows.toDF("grp", "v"), "grp", "v")
      .as[(String, Seq[Double])].collect().toMap
    assert(got.keySet == want.keySet)
    for ((g, exp) <- want) assert(got(g) == exp, s"group $g")
  }

  test("hashedTfVectors ≡ sparse hashedTf; cosine of a doc with itself = 1") {
    val docs = Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "beta beta delta"),
      (3L, "   "), // whitespace-only: no vector row
      (4L, "alpha beta alpha gamma")) // duplicate of doc 1
      .toDF("doc_id", "text")
    val dim = 16
    val sparse = TextAnalysis.hashedTf(docs, "doc_id", "text", dim)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val dense = TextAnalysis.hashedTfVectors(docs, "doc_id", "text", dim)
      .as[(Long, Seq[Double])].collect().toMap
    assert(dense.keySet == Set(1L, 2L, 4L))
    for ((id, vec) <- dense; (pos, tf) <- sparse(id))
      assert(vec(pos) == tf.toDouble, s"doc $id pos $pos")
    for ((id, vec) <- dense)
      assert(vec.sum == sparse(id).values.sum.toDouble)
    // the dense form drives the similarity ops: identical docs at
    // cosine 1, and a doc against itself likewise
    val v = TextAnalysis.hashedTfVectors(docs, "doc_id", "text", dim)
    val cos = v.as("a").crossJoin(v.as("b"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        Similarity.cosine(col("a.tf_vec"), col("b.tf_vec")).as("c"))
      .as[(Long, Long, Double)].collect()
    assert(cos.filter(r => r._1 == r._2)
      .forall(r => math.abs(r._3 - 1.0) < 1e-12))
    assert(math.abs(cos.find(r => r._1 == 1L && r._2 == 4L).get._3 - 1.0)
      < 1e-12)
  }

  test("content-defined chunks reassemble and survive a prefix shift") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (2L, "PREFIX-SHIFT the quick brown fox jumps over the lazy dog and runs far away home"),
      (3L, ""),
      (4L, "tiny")).toDF("doc_id", "text")
    val chunks = docs.select(col("doc_id"), col("text"),
      TextAnalysis.cdcChunks(col("text"), window = 4, divisor = 8).as("cs"))
    // chunks concatenate back to the original text, in order
    val reassembled = chunks.select(col("doc_id"),
      concat_ws("", transform(col("cs"), c => c.getField("chunk"))).as("r"),
      col("text")).as[(Long, String, String)].collect()
    reassembled.foreach { case (id, r, t) =>
      assert(r == t, s"doc $id chunks do not reassemble") }
    // empty doc -> zero chunks; sub-window doc -> one whole-text chunk
    val byId = chunks.select(col("doc_id"),
      transform(col("cs"), c => c.getField("chunk")).as("c"))
      .as[(Long, Seq[String])].collect().toMap
    assert(byId(3L).isEmpty && byId(4L) == Seq("tiny"))
    // shift-robustness: the prefixed copy shares most chunk content
    // with the original (boundaries re-anchor after the edit) --
    // fixed-size windows at the same granularity share NOTHING
    val shared = byId(1L).toSet & byId(2L).toSet
    assert(shared.nonEmpty,
      s"no shared chunks after prefix shift: ${byId(1L)} vs ${byId(2L)}")
    val fixedA = byId(1L).mkString.grouped(8).toSet
    val fixedB = byId(2L).mkString.grouped(8).toSet
    assert(shared.mkString.length > (fixedA & fixedB).mkString.length,
      "content-defined chunking no better than fixed windows here")
  }

  test("removeBoilerplateLines: shared lines drop, unique content survives in order") {
    import org.apache.spark.sql.functions._
    val nav = "HOME | ABOUT | CONTACT"
    val docs = Seq(
      (1L, s"$nav\nalpha one\nalpha two\n(c) 2026"),
      (2L, s"$nav\nbeta one\n(c) 2026"),
      (3L, s"$nav\ngamma one\ngamma two\n(c) 2026"),
      (4L, s"$nav\n(c) 2026")).toDF("doc_id", "text")
    val out = Dedup.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // nav + copyright appear in all 4 docs -> removed everywhere;
    // per-doc content lines survive byte-for-byte, in order
    assert(out(1L) == ((4L, 2L, "alpha one\nalpha two")))
    assert(out(2L) == ((3L, 2L, "beta one")))
    assert(out(3L) == ((4L, 2L, "gamma one\ngamma two")))
    // a doc that is ALL boilerplate cleans to the empty string
    assert(out(4L) == ((2L, 2L, "")))
  }

  test("simhashMd5Df native ≡ shuffle form, incl null/empty/whitespace docs") {
    val rnd = new scala.util.Random(5)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, ""), (4L, "   "), (5L, "\ta b\n"),
      (6L, (0 until 300).map(_ => rnd.alphanumeric.take(6).mkString).mkString(" ")),
      (7L, "dup dup dup dup dup"))
      .toDF("doc_id", "text")
      // a genuinely NULL text row (fold: NULL simhash)
      .unionByName(Seq(Tuple1(3L)).toDF("doc_id")
        .withColumn("text", org.apache.spark.sql.functions.lit(null)
          .cast("string")))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val native = m(Dedup.simhashMd5Df(docs, "doc_id", "text"))
    val fold = m(Dedup.simhashMd5DfFold(docs, "doc_id", "text"))
    assert(native == fold, s"$native vs $fold")
    assert(native(3L) == null && native(2L) == 0L)
    // the native plan is a narrow map: no Exchange anywhere
    val plan = Dedup.simhashMd5Df(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }

  test("removeBoilerplateLines: adversarial hot key broadcasts, never a skewed shuffle join") {
    import org.apache.spark.sql.functions._
    // one line planted in EVERY doc — the by-construction hottest key;
    // the old lines⋈counts shuffle on lfp would send every copy of it
    // to a single partition
    val hot = "(c) 2026 MegaCorp — all rights reserved"
    val docs = (1L to 400L).map(i => (i, s"$hot\nunique line $i\nbody $i text"))
      .toDF("doc_id", "text")
    val out = Dedup.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3)
    // default path: the boiler-key verdict arrives via broadcast — the
    // exploded lines are never re-partitioned by the skewed lfp key
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast verdict join, got:\n$plan")
    val got = out.as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.size == 400)
    got.foreach { case (id, (nLines, nRemoved, cleaned)) =>
      assert(nLines == 3L && nRemoved == 1L, s"doc $id")
      assert(cleaned == s"unique line $id\nbody $id text", s"doc $id")
    }
    // the shuffle fallback (broadcastBoilers = false) stays value-identical
    val fb = Dedup.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3,
        broadcastBoilers = false)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(fb == got)
  }

  test("cooccurrence: doc-level support, Apriori prefilter, lexicographic cap") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b d"), (3L, "b a"), (4L, "a c"),
      (5L, "x x x"), // within-doc repeats collapse; x stays infrequent
      (6L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurrence(docs, "doc_id", "text",
        minDocs = 2, totalDocs = 6)
      .as[(String, String, Long, Long)].collect().toSet
    // (b,c) share only doc 1 — both tokens ARE frequent but the PAIR
    // is below support; d/x never reach pair generation. Lift:
    // (a,b) 1e6·3·6/(4·3) = 1.5e6; (a,c) 1e6·2·6/(4·2) = 1.5e6 —
    // both above independence (1e6)
    assert(out == Set(("a", "b", 3L, 1500000L), ("a", "c", 2L, 1500000L)))
    // deterministic lexicographic cap: with 2 tokens/doc, doc 1 keeps
    // {a,b} (c truncated) → c's df falls to 1 and every c-pair dies
    val capped = TextAnalysis.cooccurrence(docs, "doc_id", "text",
        minDocs = 2, totalDocs = 6, maxDocTokens = 2)
      .as[(String, String, Long, Long)].collect().toSet
    assert(capped == Set(("a", "b", 3L, 1500000L)))
  }

  test("perceptualNearDup: shifted copy detected, unrelated payload spared") {
    import org.apache.spark.sql.functions._
    val t1 = "the quick brown fox jumps over the lazy dog while the rain " +
      "in spain falls mainly on the plain and all good men come to the " +
      "aid of the party"
    val t3 = "pack my box with five dozen liquor jugs as quartz glyphs " +
      "vex and the wizard quickly jinxed the gnomes before they " +
      "vaporized again tonight ok"
    // id 2 is t1 with two bytes PREPENDED — a header-shifted copy; the
    // positional byte grid of round-10's stub decode would scramble,
    // but the translation-invariant gram histogram keeps it 3 bits
    // from the original (python-pinned). t3 sits 29-30 bits away.
    val docs = Seq((1L, t1), (2L, "ab" + t1), (3L, t3)).toDF("doc_id", "text")
    val media = Multimodal.packFromText(docs, "doc_id", "text")
    val pairs = Multimodal.perceptualNearDup(media)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 3L)), s"got $pairs")
    // the kernel value itself is pinned against an independent
    // reference implementation (python hashlib)
    val h1 = media.filter(col("media_id") === 1L)
      .select(Multimodal.perceptualHash(col("media"))).head().getLong(0)
    assert(h1 == 5522298681951892877L)
  }

  test("perceptualNearDup band mask is Long-safe for wide bands") {
    import org.apache.spark.sql.functions._
    // the Int form returned 0 for width 32 (bands=2) — every row then
    // hashed to one bucket and candidates degenerated to all-pairs
    assert(Multimodal.bandMask(8) == 0xFFL)
    assert(Multimodal.bandMask(16) == 0xFFFFL)
    assert(Multimodal.bandMask(32) == 0xFFFFFFFFL)
    assert(Multimodal.bandMask(64) == -1L)
    // end-to-end at bands=2: identical payloads pair up, distant ones
    // don't — and the wide-band path yields the same verdicts as the
    // default 8-band form at the same threshold
    val t1 = "the quick brown fox jumps over the lazy dog while the rain " +
      "in spain falls mainly on the plain tonight again"
    val t3 = "pack my box with five dozen liquor jugs as quartz glyphs " +
      "vex and the wizard quickly jinxed the gnomes again"
    val docs = Seq((1L, t1), (2L, t1), (3L, t3)).toDF("doc_id", "text")
    val media = Multimodal.packFromText(docs, "doc_id", "text")
    val wide = Multimodal.perceptualNearDup(media, bands = 2, maxHamming = 1)
      .as[(Long, Long, Long)].collect().toSet
    val deflt = Multimodal.perceptualNearDup(media, maxHamming = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(wide == Set((1L, 2L, 0L)), s"got $wide")
    assert(wide == deflt)
  }

  test("perceptualHash native ≡ fold twin, incl short/empty/null payloads") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val docs = (Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, ""), (3L, "abc"), (4L, "abcd"),
      (5L, (0 until 200).map(_ => rnd.alphanumeric.take(5).mkString).mkString(" ")))
      .toDF("doc_id", "text"))
      .unionByName(Seq(Tuple1(6L)).toDF("doc_id")
        .withColumn("text", lit(null).cast("string")))
    val media = Multimodal.packFromText(docs, "doc_id", "text")
    def m(c: org.apache.spark.sql.Column) =
      media.select(col("media_id"), c.as("h")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val native = m(Multimodal.perceptualHash(col("media")))
    val fold = m(Multimodal.perceptualHashFold("media"))
    assert(native == fold, s"$native vs $fold")
    assert(native(2L) == 0L && native(3L) == 0L) // < 4 bytes → no grams
    assert(native(6L) == null)                   // null payload → null
  }

  /** Brute-force winnowing reference (the SIGMOD 2003 definition,
    * computed directly): per window of w gram hashes, select the
    * minimum, ties → rightmost. */
  private def bruteWinnow(toks: Seq[String], k: Int, w: Int): Set[(Int, Long)] =
    if (toks.length < k) Set.empty
    else {
      val grams = toks.sliding(k).map(_.mkString(" ")).toVector
      val hs = grams.map { g =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.substring(0, 15), 16)
      }
      val nW = math.max(1, grams.length - w + 1)
      (0 until nW).map { s =>
        val win = s until math.min(s + w, grams.length)
        val m = win.map(hs).min
        val p = win.filter(i => hs(i) == m).max
        (p, hs(p))
      }.toSet
    }

  test("winnowingFingerprints ≡ the per-window brute force") {
    val rnd = new scala.util.Random(131)
    val vocab = (0 until 12).map(i => s"w$i")
    val docs = (0 until 12).map { i =>
      val len = rnd.nextInt(14) // includes < k and < w+k cases
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    } :+ (99L, "a b c") // exactly k tokens → one gram, one window
    val df = docs.toDF("doc_id", "text")
    for ((k, w) <- Seq((4, 4), (3, 2))) {
      val got = TextAnalysis.winnowingFingerprints(df, "doc_id", "text", k, w)
        .as[(Long, Int, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
      val want = docs.map { case (id, t) =>
        id -> bruteWinnow(t.split("\\s+").toSeq.filter(_.nonEmpty), k, w)
      }.filter(_._2.nonEmpty).toMap
      assert(got == want, s"(k=$k,w=$w)")
    }
  }

  test("winnowingPairs: a shared run of w+k-1 tokens is ALWAYS detected") {
    // the paper's guarantee: any common substring of >= w+k-1 tokens
    // spans a full window, and that window selects the same
    // fingerprint in both documents
    val run = "r1 r2 r3 r4 r5 r6 r7" // w+k-1 = 7 tokens for k=4,w=4
    val a = s"a1 a2 a3 a4 a5 $run a6 a7 a8 a9"
    val b = s"b1 b2 $run b3 b4 b5 b6 b7 b8 b9 b10"
    val c = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"
    val pairs = Winnowing.winnowingPairs(
        Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text"),
        "doc_id", "text", k = 4, w = 4, minShared = 1, maxDf = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("winnowingPairs guarantee property: random (k, w), random hosts, " +
      "every planted run of w+k-1 tokens detected") {
    val rnd = new scala.util.Random(401)
    for (trial <- 0 until 6) {
      val k = 2 + rnd.nextInt(4) // 2..5
      val w = 2 + rnd.nextInt(5) // 2..6
      val runLen = w + k - 1
      val run = (0 until runLen).map(i => s"shared_${trial}_$i")
      def hostTokens(tag: String) =
        (0 until 3 + rnd.nextInt(10)).map(i => s"${tag}_$i")
      val a = (hostTokens("a") ++ run ++ hostTokens("aa")).mkString(" ")
      val b = (hostTokens("b") ++ run ++ hostTokens("bb")).mkString(" ")
      val pairs = Winnowing.winnowingPairs(
          Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
          "doc_id", "text", k = k, w = w, minShared = 1, maxDf = 64)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)),
        s"trial $trial (k=$k, w=$w): planted run of $runLen tokens missed")
    }
  }

  test("winnowingPairs: maxDf drops boilerplate fingerprints") {
    // the same 8-token template in EVERY doc; pairs exist at high
    // maxDf and vanish when the cap excludes corpus-wide hashes
    val tmpl = "t1 t2 t3 t4 t5 t6 t7 t8"
    val docs = (0 until 6).map(i =>
      (i.toLong, s"u${i}a u${i}b u${i}c $tmpl u${i}d u${i}e u${i}f"))
      .toDF("doc_id", "text")
    val loose = Winnowing.winnowingPairs(docs, "doc_id", "text", 4, 4,
      minShared = 1, maxDf = 64).count()
    val tight = Winnowing.winnowingPairs(docs, "doc_id", "text", 4, 4,
      minShared = 1, maxDf = 3).count()
    assert(loose > 0, "template fingerprints should pair without the cap")
    assert(tight == 0, "df-capped fingerprints should not pair")
  }

  test("incrementalWinnowPairs: batch probes the index without " +
      "re-fingerprinting; params mismatch fails loudly") {
    val run = "r1 r2 r3 r4 r5 r6 r7"
    val idx = Winnowing.winnowIndex(
      Seq((1L, s"a1 a2 a3 a4 a5 $run a6 a7 a8 a9"),
        (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"))
        .toDF("doc_id", "text"),
      "doc_id", "text", k = 4, w = 4)
    val batch = Seq((10L, s"b1 b2 $run b3 b4 b5 b6 b7 b8 b9 b10"))
      .toDF("doc_id", "text")
    val pairs = Winnowing.incrementalWinnowPairs(batch, idx, "doc_id", "text",
        k = 4, w = 4, minShared = 1, maxDf = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 1L)), s"got $pairs")
    val err = intercept[IllegalArgumentException] {
      Winnowing.incrementalWinnowPairs(batch, idx, "doc_id", "text",
        k = 5, w = 4, minShared = 1, maxDf = 64).collect()
    }
    assert(err.getMessage.contains("params"), err.getMessage)
  }

  test("incrementalWinnowPairs: an index assembled from MIXED params " +
      "fails loudly (not just a mismatched first row)") {
    val a = Seq((1L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"))
      .toDF("doc_id", "text")
    val b = Seq((2L, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10 e11 e12"))
      .toDF("doc_id", "text")
    // appended index halves built with DIFFERENT (k, w) — the
    // append-per-batch workflow's likeliest corruption; a limit(1)
    // probe can land on the matching half and pass
    val mixed = Winnowing.winnowIndex(a, "doc_id", "text", k = 4, w = 4)
      .unionByName(Winnowing.winnowIndex(b, "doc_id", "text", k = 5, w = 4))
    val batch = Seq((10L, "b1 b2 b3 b4 b5 b6 b7 b8")).toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      Winnowing.incrementalWinnowPairs(batch, mixed, "doc_id", "text",
        k = 4, w = 4, minShared = 1, maxDf = 64).collect()
    }
    assert(err.getMessage.contains("mixed or mismatched"), err.getMessage)
  }

  test("writeWinnowIndex: disjoint per-file h-ranges; pruned probe opens " +
      "fewer files and returns identical pairs") {
    import graft.ops.DataSkipping
    // 120 docs of fully distinct vocab → a few thousand distinct
    // uniformly-spread fingerprint hashes across 32 range-clustered files
    val docs = (0 until 120).map(i =>
      (i.toLong, (0 until 40).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winnowix-")
      .toString + "/ix"
    Winnowing.writeWinnowIndex(spark,
      Winnowing.winnowIndex(docs, "doc_id", "text", k = 4, w = 4),
      dir, nFiles = 32)
    // enforced layout: each file owns a tight DISJOINT h-slice — the
    // property that makes the hash-set probe prune
    val stats = DataSkipping.statsManifest(spark, dir)
      .filter($"column" === "h")
      .select($"file", $"minLong", $"maxLong")
      .as[(String, Option[Long], Option[Long])].collect()
      .map(r => (r._2.get, r._3.get)).sortBy(_._1)
    assert(stats.length >= 16, s"expected a multi-file fleet: ${stats.length}")
    stats.sliding(2).foreach { case Array((_, prevMax), (nextMin, _)) =>
      assert(prevMax < nextMin,
        s"file h-ranges must be disjoint: $prevMax !< $nextMin")
    }
    // batch: a planted 7-token run from doc 7 (guaranteed ≥1 shared
    // fingerprint at w+k−1) inside fresh text
    val run = (10 until 17).map(j => s"t7_$j").mkString(" ")
    val batch = Seq((1000000L, s"x1 x2 $run x3 x4 x5 x6 x7"))
      .toDF("doc_id", "text")
    val full = Winnowing.incrementalWinnowPairs(batch,
        spark.read.parquet(dir), "doc_id", "text",
        k = 4, w = 4, minShared = 1, maxDf = 64)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val pruned = Winnowing.incrementalWinnowPairsPruned(spark, batch, dir,
        "doc_id", "text", k = 4, w = 4, minShared = 1, maxDf = 64)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(full.nonEmpty && full.map(_._2).contains(7L), s"full: $full")
    assert(pruned == full, s"pruned $pruned != full $full")
    // the probe's hash set must open a small fraction of the fleet
    val keys = TextAnalysis.winnowingFingerprints(batch, "doc_id", "text",
        4, 4).select($"h").distinct().as[Long].collect()
    val (kept, total) = DataSkipping.prunedFilesForKeys(spark, dir, "h",
      keys.toSeq)
    assert(kept.size < total / 2,
      s"pruning should skip most files: kept ${kept.size} of $total " +
        s"for ${keys.length} probe hashes")
  }

  test("incrementalWinnowPairsPruned: the probe-key cap fires without " +
      "materializing an over-cap key set") {
    val docs = (0 until 5).map(i =>
      (i.toLong, (0 until 30).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winnowix-")
      .toString + "/ix"
    Winnowing.writeWinnowIndex(spark,
      Winnowing.winnowIndex(docs, "doc_id", "text", k = 4, w = 4),
      dir, nFiles = 2)
    val batch = Seq((99L, (0 until 40).map(j => s"q$j").mkString(" ")))
      .toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      Winnowing.incrementalWinnowPairsPruned(spark, batch, dir,
        "doc_id", "text", k = 4, w = 4, minShared = 1,
        maxProbeKeys = 2L).collect()
    }
    assert(err.getMessage.contains("maxProbeKeys"), err.getMessage)
  }

  test("incrementalWinnowPairsPruned: params mismatch fails loudly even " +
      "though a mismatched index would prune to nothing") {
    val docs = (0 until 20).map(i =>
      (i.toLong, (0 until 30).map(j => s"v${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winnowix-")
      .toString + "/ix"
    Winnowing.writeWinnowIndex(spark,
      Winnowing.winnowIndex(docs, "doc_id", "text", k = 5, w = 4),
      dir, nFiles = 4)
    val batch = Seq((99L, "y1 y2 y3 y4 y5 y6 y7 y8")).toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      Winnowing.incrementalWinnowPairsPruned(spark, batch, dir,
        "doc_id", "text", k = 4, w = 4, minShared = 1).collect()
    }
    assert(err.getMessage.contains("params"), err.getMessage)
    // the guard above came from the O(1) sidecar writeWinnowIndex
    // records — not from scanning the index
    assert(err.getMessage.contains("sidecar"), err.getMessage)
  }

  test("winnow params sidecar: written by writeWinnowIndex; a " +
      "sidecar-less dir falls back to the distinct-params scan") {
    val docs = (0 until 10).map(i =>
      (i.toLong, (0 until 30).map(j => s"s${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("winnowix-")
      .toString + "/ix"
    Winnowing.writeWinnowIndex(spark,
      Winnowing.winnowIndex(docs, "doc_id", "text", k = 4, w = 4),
      dir, nFiles = 2)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(Winnowing.readParamsSidecar(fs, root).contains("4:4"))
    // legacy layout: delete the sidecar — the probe must still catch
    // a params mismatch (via the scan), and a matching probe still runs
    fs.delete(new org.apache.hadoop.fs.Path(root,
      Winnowing.paramsSidecarName), false)
    val run = (5 until 12).map(j => s"s3_$j").mkString(" ")
    val batch = Seq((777L, s"z1 z2 $run z3 z4 z5 z6 z7"))
      .toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      Winnowing.incrementalWinnowPairsPruned(spark, batch, dir,
        "doc_id", "text", k = 5, w = 4, minShared = 1).collect()
    }
    assert(err.getMessage.contains("params") &&
      !err.getMessage.contains("sidecar"), err.getMessage)
    val pairs = Winnowing.incrementalWinnowPairsPruned(spark, batch, dir,
        "doc_id", "text", k = 4, w = 4, minShared = 1)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(_._2).contains(3L), pairs.mkString(", "))
    // a truncated sidecar (no END) reads as absent, never as params
    val out = fs.create(new org.apache.hadoop.fs.Path(root,
      Winnowing.paramsSidecarName), true)
    out.write("4:4".getBytes("UTF-8")); out.close()
    assert(Winnowing.readParamsSidecar(fs, root).isEmpty)
  }

  test("scrubContaminationSpans: seeds widen, overlap-merge, excise") {
    val corpus = Seq(
      (1L, "w1 w2 leak1 leak2 leak3 w3 w4 w5 w6 w7 w8 w9"),
      (2L, "clean text with no benchmark overlap at all"),
      (3L, "")).toDF("doc_id", "text")
    val bench = Seq((100L, "leak1 leak2 leak3 leak4")).toDF("doc_id", "text")
    val out = Winnowing.scrubContaminationSpans(corpus, bench,
        "doc_id", "text", n = 3, radius = 2)
      .as[(Long, Int, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: grams "leak1 leak2 leak3" (pos 2) matches; widened span
    // [0, 6] removes w1 w2 leak1 leak2 leak3 w3 w4 → 5 tokens kept
    assert(out(1L) == ((1L, 12, 1L, 7L, "w5 w6 w7 w8 w9")), s"${out(1L)}")
    assert(out(2L) == ((2L, 8, 0L, 0L,
      "clean text with no benchmark overlap at all")))
    assert(out(3L) == ((3L, 0, 0L, 0L, "")))
  }

  test("scrubContaminationSpans: adjacent seeds merge into one span") {
    // benchmark 4-token run → two overlapping corpus trigram matches
    // at pos 3 and 4 merge to ONE span [1, 8]
    val corpus = Seq(
      (1L, "k1 k2 k3 q1 q2 q3 q4 k4 k5 k6 k7 k8")).toDF("doc_id", "text")
    val bench = Seq((9L, "q1 q2 q3 q4")).toDF("doc_id", "text")
    val out = Winnowing.scrubContaminationSpans(corpus, bench,
        "doc_id", "text", n = 3, radius = 2)
      .as[(Long, Int, Long, Long, String)].collect().head
    assert(out == ((1L, 12, 1L, 8L, "k1 k6 k7 k8")), s"$out")
  }

  test("scrubContaminationSpans: radius 0 excises exactly the gram") {
    val corpus = Seq((1L, "w1 w2 leak1 leak2 leak3 w3 w4"))
      .toDF("doc_id", "text")
    val bench = Seq((9L, "leak1 leak2 leak3")).toDF("doc_id", "text")
    val out = Winnowing.scrubContaminationSpans(corpus, bench,
        "doc_id", "text", n = 3, radius = 0)
      .as[(Long, Int, Long, Long, String)].collect().head
    assert(out == ((1L, 7, 1L, 3L, "w1 w2 w3 w4")), s"$out")
  }

  test("incrementalWinnowPairs: within-batch pairs report once, ordered") {
    val run = "r1 r2 r3 r4 r5 r6 r7"
    val idx = Winnowing.winnowIndex(
      Seq((1L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"))
        .toDF("doc_id", "text"),
      "doc_id", "text", k = 4, w = 4)
    val batch = Seq(
      (10L, s"b1 b2 $run b3 b4 b5 b6"),
      (11L, s"d1 $run d2 d3 d4 d5 d6 d7")).toDF("doc_id", "text")
    val pairs = Winnowing.incrementalWinnowPairs(batch, idx, "doc_id", "text",
        k = 4, w = 4, minShared = 1, maxDf = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((10L, 11L)), s"got $pairs") // once, id_a < id_b
  }

  test("embeddingDrift ≡ brute JVM computation on random vectors") {
    val rnd = new scala.util.Random(509)
    def vecs(n: Int) = (0 until n).map(_ =>
      Seq.fill(6)(rnd.nextFloat() * 2f - 1f))
    val aRows = (0 until 3).flatMap(g => vecs(2 + g).map(v => (g, v)))
    val bRows = (0 until 3).flatMap(g => vecs(4 - g).map(v => (g, v)))
    val out = graft.ops.Profiling.embeddingDrift(
        aRows.toDF("label", "embedding"), bRows.toDF("label", "embedding"),
        "label", "embedding")
      .as[(Int, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    def cent(rows: Seq[(Int, Seq[Float])], g: Int): Seq[Long] = {
      val vs = rows.filter(_._1 == g).map(_._2)
      (0 until 6).map { d =>
        val s = vs.map(v => math.floor(v(d).toDouble * 1048576.0).toLong).sum
        s / vs.length // JVM / truncates toward zero, same as div
      }
    }
    for (g <- 0 until 3) {
      val ds = cent(aRows, g).zip(cent(bRows, g)).map { case (x, y) =>
        math.abs(x - y) }
      val (_, na, nb, l1, linf) = out(g)
      assert(na == aRows.count(_._1 == g) && nb == bRows.count(_._1 == g))
      assert(l1 == ds.sum, s"label $g l1: got $l1 want ${ds.sum}")
      assert(linf == ds.max, s"label $g linf: got $linf want ${ds.max}")
    }
  }

  test("embeddingDrift: exact scaled-integer centroid shift") {
    val a = Seq((7, Seq(1.0f, 0.0f)), (7, Seq(0.0f, 1.0f)),
      (8, Seq(-0.5f, 0.25f))).toDF("label", "embedding")
    val b = Seq((7, Seq(1.0f, 1.0f)), (8, Seq(0.5f, 0.25f)))
      .toDF("label", "embedding")
    val out = graft.ops.Profiling.embeddingDrift(a, b, "label", "embedding")
      .as[(Int, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // label 7: A centroid (2^19, 2^19) [1048576/2 div 2], B (2^20, 2^20)
    //   → per-dim shift 524288, l1 = 1048576, linf = 524288
    assert(out(7) == ((7, 2L, 1L, 1048576L, 524288L)), s"${out(7)}")
    // label 8: dims shift (1048576, 0) — negative side exercises the
    //   truncating div agreement
    assert(out(8) == ((8, 1L, 1L, 1048576L, 1048576L)), s"${out(8)}")
  }

  test("embeddingDrift: ragged dimensions fail loudly; one-sided groups " +
      "drop silently (nothing to compare)") {
    def messages(t: Throwable): String =
      if (t == null) "" else t.toString + messages(t.getCause)
    // cross-side raggedness: dim 2 exists only in snapshot a
    val e1 = intercept[Exception] {
      graft.ops.Profiling.embeddingDrift(
        Seq((1, Seq(1f, 0f, 0f))).toDF("label", "embedding"),
        Seq((1, Seq(1f, 0f))).toDF("label", "embedding"),
        "label", "embedding").collect()
    }
    assert(messages(e1).contains("ragged dimensions"), messages(e1))
    // within-side raggedness: one truncated vector inside snapshot a
    // (dim 2's centroid would silently average only the long vectors)
    val e2 = intercept[Exception] {
      graft.ops.Profiling.embeddingDrift(
        Seq((2, Seq(1f, 0f, 1f)), (2, Seq(1f, 0f)))
          .toDF("label", "embedding"),
        Seq((2, Seq(0f, 0f, 0f))).toDF("label", "embedding"),
        "label", "embedding").collect()
    }
    assert(messages(e2).contains("ragged dimensions"), messages(e2))
    // a group present in only ONE snapshot is not ragged: no drift to
    // measure — dropped, and well-formed groups are unaffected
    val out = graft.ops.Profiling.embeddingDrift(
        Seq((1, Seq(1f, 0f)), (9, Seq(1f, 1f))).toDF("label", "embedding"),
        Seq((1, Seq(0f, 0f))).toDF("label", "embedding"),
        "label", "embedding")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1, 1L, 1L, 1048576L, 1048576L)), s"$out")
  }
}
