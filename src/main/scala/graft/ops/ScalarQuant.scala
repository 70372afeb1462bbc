package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization for embedding columns — the simplest of
  * the production ANN compression schemes (the "SQ8" index family in
  * FAISS/Milvus terms, per-dimension affine codes): each float becomes
  * ONE byte via a per-dimension (min, max) affine map, and candidate
  * scoring reads codes plus a dim-sized broadcast stats row instead of
  * raw floats. A 64-float embedding (256 B) compresses to 64 B — a
  * 100 TB embedding corpus scans 4× less data per query, with far
  * better fidelity per byte than [[ProductQuant]]'s M=4 codes when
  * recall matters more than ratio.
  *
  * Exactness discipline (same as [[KMeans]]/[[ProductQuant]]): vectors
  * quantize by `floor(x·scale)` into integers; per-dimension min/max
  * are integer aggregates; codes are exact integer division
  * `((q−mn)·levels) div max(mx−mn, 1)`; ADC scores are the integer
  * dot product of the query with the integer reconstruction
  * `mn·levels + code·(mx−mn)` (i.e. `levels ×` the affine
  * de-quantization, kept scaled so no division ever happens). The
  * whole stats → encode → score → rank pipeline is value-checkable in
  * ANSI SQL.
  *
  * Scale shape: stats is one posexplode aggregate whose state is
  * bounded by `dim` (map-side combinable min/max), collapsed to a
  * single broadcast array row; encoding is a narrow map; scoring is a
  * broadcast of the (small) query side across the codes scan with a
  * per-query top-k window (WindowGroupLimit keeps per-task state at
  * k). Nothing is O(n²) on the corpus, and the corpus is read ONCE
  * per stage.
  */
object ScalarQuant {

  /** Exact integer division (`div`, never `/`→double — the repo's
    * exactness idiom). */
  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** Per-dimension (min, max) of the ×`scale`-quantized corpus,
    * collapsed to ONE `st: array<struct<pos,mn,mx>>` row (position
    * order) for broadcasting — the same one-row-codebook shape as
    * `Similarity.assignCells`. The aggregate's state is `dim` cells
    * per task regardless of corpus size. */
  def dimStats(corpus: DataFrame, vecCol: String,
      scale: Int = 1000): DataFrame =
    corpus
      .select(posexplode(KMeans.quantize(col(vecCol), scale))
        .as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"), col("mx"))))
        .as("st"))

  /** Encode each vector as `dim` codes in [0, levels]: per dimension,
    * `clamp(((q − mn) · levels) div max(mx − mn, 1))`. Vectors from
    * the stats corpus always land inside the range; out-of-corpus
    * vectors (a query batch) clamp at the edges, the standard SQ
    * disposition. A narrow map against the broadcast stats row.
    * @return (id, codes: array<int>)
    */
  def encode(corpus: DataFrame, stats: DataFrame, idCol: String,
      vecCol: String, levels: Int = 255, scale: Int = 1000,
      keep: Seq[String] = Seq.empty): DataFrame =
    corpus
      .select(col(idCol).as("id") +:
        KMeans.quantize(col(vecCol), scale).as("qv") +: keep.map(col): _*)
      .crossJoin(broadcast(stats))
      .select(col("id") +:
        // native one-pass codec (graft.plans.SqEncodeExpression) —
        // the zip_with form evaluated an interpreted lambda per
        // dimension over the whole corpus at every index build;
        // ScalarQuantSpec proves native ≡ fold code-for-code
        graft.plans.NativeCols.sqEncode(col("qv"), col("st"), levels)
          .as("codes") +: keep.map(col): _*)

  /** zip_with twin of the native [[encode]] codec — spec reference. */
  private[graft] def encodeFoldCodes(qv: Column, st: Column,
      levels: Int): Column =
    zip_with(qv, st, (x, s) =>
      greatest(lit(0L), least(lit(levels.toLong),
        idiv((x - s.getField("mn")) * levels,
          greatest(s.getField("mx") - s.getField("mn"), lit(1L)))))
        .cast("int"))

  /** Integer reconstruction of a code array against the broadcast
    * stats row: element j = `mn[j]·levels + code[j]·(mx[j]−mn[j])` —
    * `levels ×` the affine de-quantization, kept scaled so the ADC
    * dot stays in exact integer arithmetic. */
  private[ops] def reconstruct(codes: Column, st: Column,
      levels: Int): Column =
    // native (graft.plans.SqReconstructExpression): this runs once per
    // CANDIDATE on the ADC scoring path
    graft.plans.NativeCols.sqReconstruct(codes, st, levels)

  /** zip_with twin of the native [[reconstruct]] — spec reference. */
  private[graft] def reconstructFold(codes: Column, st: Column,
      levels: Int): Column =
    zip_with(codes, st, (c, s) =>
      s.getField("mn") * levels +
        c.cast("long") * (s.getField("mx") - s.getField("mn")))

  /** Asymmetric top-k over SQ8 codes: queries keep their full
    * quantized vectors, candidates contribute only their byte codes;
    * the score is the exact integer dot product of the query with the
    * `levels`-scaled reconstruction — monotone in the de-quantized
    * dot, so ranking ≡ ranking of the affine approximation. Ties
    * break on neighbor id.
    * @return (query_id, rank, neighbor_id, score)
    */
  def adcTopK(queries: DataFrame, codes: DataFrame, stats: DataFrame,
      idCol: String, vecCol: String, topK: Int,
      levels: Int = 255, scale: Int = 1000): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      KMeans.quantize(col(vecCol), scale).as("qv")))
    val recon = codes.crossJoin(broadcast(stats))
      .select(col("id").as("neighbor_id"),
        reconstruct(col("codes"), col("st"), levels).as("rv"))
    val scored = q.join(recon, col("query_id") =!= col("neighbor_id"))
      .withColumn("score", KMeans.dotL(col("qv"), col("rv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
  }
}
