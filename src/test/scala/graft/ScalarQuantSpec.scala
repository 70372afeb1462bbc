package graft

import graft.ops.{ScalarQuant, Sketches, TextAnalysis}
import org.apache.spark.sql.functions._

class ScalarQuantSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("native sq_encode / sq_reconstruct ≡ zip_with folds element-for-element") {
    val e = Tables.embeddings(spark, dir)
    val stats = ScalarQuant.dimStats(e, "embedding")
    val base = e.select(col("vec_id"),
        graft.ops.KMeans.quantize(col("embedding")).as("qv"))
      .crossJoin(broadcast(stats))
    val enc = base.select(col("vec_id"),
      graft.plans.NativeCols.sqEncode(col("qv"), col("st"), 255).as("n"),
      ScalarQuant.encodeFoldCodes(col("qv"), col("st"), 255).as("f"))
    enc.as[(Long, Seq[Int], Seq[Int])].collect().foreach { case (id, n, f) =>
      assert(n == f, s"vec $id encode")
    }
    val rec = enc.select(col("vec_id"), col("n").as("codes"))
      .crossJoin(broadcast(stats))
      .select(col("vec_id"),
        graft.plans.NativeCols.sqReconstruct(col("codes"), col("st"), 255).as("n"),
        ScalarQuant.reconstructFold(col("codes"), col("st"), 255).as("f"))
    rec.as[(Long, Seq[Long], Seq[Long])].collect().foreach { case (id, n, f) =>
      assert(n == f, s"vec $id reconstruct")
    }
  }

  test("encode: codes stay in [0, levels]; corpus round-trips within one step") {
    val e = Tables.embeddings(spark, dir)
    val stats = ScalarQuant.dimStats(e, "embedding")
    val codes = ScalarQuant.encode(e, stats, "vec_id", "embedding")

    val bad = codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") > 255).count()
    assert(bad == 0, "codes escaped [0, 255]")

    // de-quantize (×255 scaled): |recon − 255·q| ≤ (mx − mn) per dim —
    // the affine map's one-step error bound, which is what makes SQ8 a
    // fidelity-preserving compression rather than a lossy hash
    val st = stats.crossJoin(
      e.select(col("vec_id"),
        graft.ops.KMeans.quantize(col("embedding")).as("qv")))
    val viol = st.select(
      explode(zip_with(col("qv"), col("st"), (x, s) => {
        val span = s.getField("mx") - s.getField("mn")
        val code = greatest(lit(0L), least(lit(255L),
          call_function("div", (x - s.getField("mn")) * 255,
            greatest(span, lit(1L)))))
        val recon = s.getField("mn") * 255 + code * span
        abs(recon - x * 255) > greatest(span, lit(255L))
      })).as("v")).filter(col("v")).count()
    assert(viol == 0, "reconstruction error exceeded one quantization step")
  }

  test("adcTopK ranks cluster-mates first on separable synthetic vectors") {
    // 3 well-separated clusters of 8 vectors; each query's top-5 must
    // come entirely from its own cluster — the property SQ8 must keep
    // after compressing floats to bytes
    val dim = 16
    val rows = for {
      c <- 0 until 3
      i <- 0 until 8
    } yield {
      val base = Array.tabulate(dim)(j => if (j % 3 == c) 1.0f else 0.05f)
      val v = base.zipWithIndex.map { case (x, j) =>
        x + 0.01f * ((i + j) % 5)
      }
      (c * 100L + i, v.toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
    val stats = ScalarQuant.dimStats(e, "embedding")
    val codes = ScalarQuant.encode(e, stats, "vec_id", "embedding")
    val top = ScalarQuant.adcTopK(
      e.filter(col("vec_id").isin(3L, 103L, 203L)), codes, stats,
      "vec_id", "embedding", topK = 5)
    val offCluster = top.filter(
      call_function("div", col("query_id"), lit(100L)) =!=
        call_function("div", col("neighbor_id"), lit(100L))).count()
    assert(offCluster == 0, "SQ8 ranking leaked across separated clusters")
  }

  test("hardNegatives: same-label twins excluded, different-label twin ranks first") {
    val e = Tables.embeddings(spark, dir)
    val anchor = e.filter(col("vec_id") === 3L)
    // two planted near-copies of the anchor: one SHARES its label (a
    // positive — must never be mined), one differs (the hardest
    // possible negative — must rank first)
    val sameLabel = anchor.select(
      lit(500000L).as("vec_id"), col("embedding"), col("label"))
    val diffLabel = anchor.select(
      lit(600000L).as("vec_id"), col("embedding"),
      (col("label") + 1).as("label"))
    val corpus = e.select("vec_id", "embedding", "label")
      .unionByName(sameLabel).unionByName(diffLabel)
    val mined = graft.ops.Similarity.hardNegatives(
      anchor, corpus, "vec_id", "embedding", "label", k = 5)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(!mined.map(_._2).contains(500000L),
      "a same-label positive leaked into the mined negatives")
    assert(mined.contains((1, 600000L)),
      s"identical-vector different-label twin not ranked first: ${mined.toSeq}")
    // every mined negative really has a different label than the anchor
    val anchorLabel = anchor.select("label").collect().head.getInt(0)
    val minedLabels = corpus
      .filter(col("vec_id").isin(mined.map(_._2): _*))
      .select("label").collect().map(_.getInt(0))
    assert(minedLabels.forall(_ != anchorLabel))
  }

  test("bottomKByGroup ≡ independent per-group bottomK") {
    val d = Tables.documents(spark, dir)
    val grouped = Sketches.bottomKByGroup(
      d, "source", TextAnalysis.fingerprint(col("text")), k = 8)
    val sources = d.select(col("source")).distinct().as[String].collect()
    sources.foreach { src =>
      val solo = Sketches.bottomK(
        d.filter(col("source") === src)
          .select(TextAnalysis.fingerprint(col("text")).as("key"))
          .distinct(),
        "key", 8)
        .select(col("key"), col("hv"))
      val fromGrouped = grouped.filter(col("source") === src)
        .select(col("key"), col("hv"))
      assert(fromGrouped.exceptAll(solo).isEmpty &&
        solo.exceptAll(fromGrouped).isEmpty,
        s"grouped sketch diverged from solo bottomK for $src")
    }
  }

  test("kmvPairOverlap is exact when k covers the union") {
    // |A| = 30, |B| = 30, |A∩B| = 10 → union 50, jaccard = 10/50
    val a = (0 until 30).map(i => ("A", s"key$i"))
    val b = (20 until 50).map(i => ("B", s"key$i"))
    val df = (a ++ b).toDF("g", "k")
    val sk = Sketches.bottomKByGroup(df, "g", col("k"), k = 100)
    val r = Sketches.kmvPairOverlap(sk, "g", k = 100).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("union_k") == 50L)
    assert(row.getAs[Long]("inter_count") == 10L)
    assert(row.getAs[Long]("jaccard_ppm") == 200000L)
  }

  test("kmvPairOverlap estimate lands near truth at k ≪ union") {
    // 400-key universe, 50% pairwise overlap; k = 64 → σ ≈ 1/8, and
    // the md5 sample is a fixed function so this asserts THE value,
    // not a distribution: deterministic forever
    val a = (0 until 300).map(i => ("A", s"doc$i"))
    val b = (100 until 400).map(i => ("B", s"doc$i"))
    val df = (a ++ b).toDF("g", "k")
    val sk = Sketches.bottomKByGroup(df, "g", col("k"), k = 64)
    val row = Sketches.kmvPairOverlap(sk, "g", k = 64).collect().head
    val est = row.getAs[Long]("jaccard_ppm").toDouble / 1e6
    val truth = 200.0 / 400.0
    assert(math.abs(est - truth) < 0.25,
      s"KMV Jaccard estimate $est too far from $truth")
  }

  test("kmvPairOverlap refuses a quadratic group fan-out, naming the cost") {
    // 5 "groups" against maxGroups=3: the guard fires at plan time
    // with the pair count spelled out, instead of an OOM at execution
    val df = (0 until 5).flatMap(g => (0 until 4).map(i => (s"g$g", s"k$g-$i")))
      .toDF("g", "k")
    val sk = Sketches.bottomKByGroup(df, "g", col("k"), k = 8)
    val e = intercept[IllegalArgumentException] {
      Sketches.kmvPairOverlap(sk, "g", k = 8, maxGroups = 3)
    }
    assert(e.getMessage.contains("5 groups") &&
      e.getMessage.contains("quadratic"), e.getMessage)
    // raising the bound explicitly is the sanctioned path
    assert(Sketches.kmvPairOverlap(sk, "g", k = 8, maxGroups = 5)
      .count() == 10L)
  }
}
