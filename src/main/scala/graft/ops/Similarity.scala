package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  * Baseline: brute-force cosine top-k. Scale path: LSH (random
  * hyperplane) bucketing so the candidate join is keyed, not O(n²).
  */
object Similarity {

  /** Cosine similarity between two float-array columns, computed in
    * double precision with a left-to-right fold (deterministic).
    * Zero-norm vectors score NULL — under Spark 4's default ANSI mode
    * an unguarded division would abort the whole job on the first
    * all-zero embedding.
    *
    * Native codegen expression ([[graft.plans.CosineSimExpression]]):
    * one compiled loop per pair instead of three interpreted
    * higher-order-function folds. Bit-identical to [[cosineFold]]
    * (same fold order — cross-checked by VectorExprsSpec).
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.NativeCols.cosineSim(a, b)

  /** The original column-DSL fold form of [[cosine]] — kept as the
    * semantic reference the native expression is verified against. */
  def cosineFold(a: Column, b: Column): Column = {
    def dbl(c: Column) = transform(c, _.cast("double"))
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)
    val da = dbl(a); val db = dbl(b)
    dot(da, db) / nullif(sqrt(dot(da, da)) * sqrt(dot(db, db)), lit(0.0))
  }

  /** L2-normalize a float-array column (unit vector, double
    * precision). Zero-norm vectors map to NULL — the same ANSI-safe
    * disposition as [[cosine]]. A narrow map: normalizing at write
    * time turns downstream cosine into a plain dot product. */
  def l2Normalize(vec: Column): Column = {
    val d = transform(vec, _.cast("double"))
    val norm = sqrt(aggregate(transform(d, x => x * x), lit(0.0), _ + _))
    when(norm > 0, transform(d, x => x / norm))
  }

  /** Mean-pool vectors per group — the chunk-embeddings → document-
    * embedding reduction. Computed as posexplode → per-(group,
    * position) partial-mean aggregate → reassemble in position order:
    * one keyed shuffle with map-side combine, memory O(dim) per
    * group. NEVER collect_list of whole vectors (that materializes a
    * group's every vector in one aggregation buffer — the shape that
    * OOMs when a group holds thousands of chunks at 100 TB).
    * Rows with NULL vectors are ignored; vectors within a group must
    * share a length.
    */
  def meanPoolVectors(df: DataFrame, groupCol: String,
                      vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(groupCol).as("grp"),
        posexplode(transform(col(vecCol), _.cast("double")))
          .as(Seq("pos", "x")))
      .groupBy(col("grp"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("grp"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as("pooled"))
      .select(col("grp").as(groupCol), col("pooled"))

  /** Brute-force cosine top-k: each query row against the whole
    * corpus. The corpus side stays partitioned; queries broadcast
    * (queries ≪ corpus is the realistic shape). Top-k per query via
    * window over (cos desc, id) — ties break deterministically.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane: component j of plane p =
    * a hash of (p, j) mapped into [-0.5, 0.5). Same plane on every
    * executor without shipping state.
    */
  private def planeComponent(p: Int, j: Column): Column =
    (pmod(xxhash64(lit(p), j), lit(1000000L)).cast("double") / 1000000.0) - 0.5

  /** Sign-LSH bucket key: `numPlanes` sign bits of dot(vec, plane).
    * Native codegen ([[graft.plans.LshBucketExpression]]) — the DSL
    * fold form is kept as [[lshBucketFold]] for the equivalence spec.
    */
  def lshBucket(vec: Column, numPlanes: Int = 12): Column =
    graft.plans.NativeCols.lshBucket(vec, numPlanes)

  /** Column-DSL reference form of [[lshBucket]]. */
  def lshBucketFold(vec: Column, numPlanes: Int = 12): Column = {
    val bits = (0 until numPlanes).map { p =>
      val dotp = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") * planeComponent(p, j)),
        lit(0.0), _ + _)
      when(dotp > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Embedding-cosine near-duplicate pairs, brute force within a
    * blocking column (the exact baseline; LSH/IVF are the scale
    * variants). Pairs (id_a < id_b) with cosine ≥ threshold.
    */
  def cosineNearDuplicates(corpus: DataFrame, idCol: String, vecCol: String,
                           threshold: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** IVF-style ANN: a deterministic coarse quantizer (every
    * `corpusSize/k`-th vector by id is a centroid — stand-in for a
    * trained codebook), vectors assigned to their nearest centroid,
    * queries probe the `nProbe` nearest cells. The candidate join is
    * keyed by cell — the inverted-file layout that scales: each query
    * touches nProbe/k of the corpus.
    */
  /** Deterministic "codebook" for the coarse quantizer: the lowest-id
    * vector of each id%nCells class — a stand-in for a trained
    * codebook that the SQL oracle can recompute exactly. Broadcast:
    * nCells vectors, never a shuffle. */
  private def deterministicCentroids(corpus: DataFrame, idCol: String,
                                     vecCol: String, nCells: Int): DataFrame =
    broadcast(
      corpus.withColumn("cell", pmod(col(idCol), lit(nCells)).cast("int"))
        .groupBy(col("cell"))
        .agg(min_by(col(vecCol), col(idCol)).as("centroid")))

  /** Rank cells by cosine to each vector, keep the top n — the
    * cell-assignment stage shared by [[ivfTopK]] and
    * [[semanticNearDuplicates]].
    *
    * Scale shape: the codebook (nCells rows) is collapsed to ONE
    * broadcast array row, so scoring + top-n happen entirely inside
    * each row's own task (transform → array_sort → slice → explode) —
    * a narrow map with NO exchange. The previous form (crossJoin to
    * nCells scored rows + row_number window over id) re-shuffled the
    * full corpus nCells-wide through a sort; at 100 TB that 16×
    * exchange is the assignment-stage scale-killer. Tiebreak matches
    * the window form exactly — csim desc, then cell asc (struct sort
    * on (negated sim, cell)); NULL csim (zero-norm vectors) ranks
    * last via the Double.MaxValue sentinel, same as NULLS LAST under
    * a descending window order. */
  private def assignCells(df: DataFrame, centroids: DataFrame,
                          idCol: String, vec: String, n: Int): DataFrame = {
    val centArr = broadcast(centroids.agg(
      collect_list(struct(col("cell"), col("centroid"))).as("cents")))
    df.crossJoin(centArr)
      .withColumn("top", slice(array_sort(transform(col("cents"), c =>
        struct(
          coalesce(-cosine(col(vec), c.getField("centroid")),
            lit(Double.MaxValue)).as("negsim"),
          c.getField("cell").as("cell")))), 1, n))
      .drop("cents")
      .withColumn("cell", explode(col("top").getField("cell")))
      .drop("top")
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = deterministicCentroids(corpus, idCol, vecCol, nCells)
    def assign(df: DataFrame, vec: String, n: Int): DataFrame =
      assignCells(df, centroids, idCol, vec, n)

    val c = assign(corpus.select(col(idCol), col(vecCol)), vecCol, 1)
      .select(col("cell"), col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val q = assign(queries.select(col(idCol), col(vecCol)), vecCol, nProbe)
      .select(col("cell"), col(idCol).as("query_id"), col(vecCol).as("qvec"))

    val scored = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qvec"), col("neighbor_id"), col("cvec"))
      .distinct()
      .withColumn("cos", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Recall@k of an approximate ANN ranking against the exact one —
    * the retrieval-eval primitive that closes the ANN loop: every
    * index here (IVF, LSH, PQ, SQ8) trades recall for cost, and this
    * measures the trade IN-ENGINE so index parameters can be tuned on
    * a sample before committing a 100 TB build. Inputs are any two
    * (query_id, neighbor_id) rankings; output is per-query hits and
    * an exact-integer recall (ppm — the repo's exactness idiom, so
    * the whole evaluation is value-checkable cross-engine).
    *
    * Scale shape: one keyed equi-join of two k-row-per-query
    * rankings + a map-side-combinable count — cost ∝ |queries|·k,
    * independent of the corpus.
    * @return (query_id, hits, recall_ppm)
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id"))
          .withColumn("hit", lit(1L)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        count(lit(1)).as("__n_exact"))
      // denominator = least(k, |exact neighbors|): on a corpus smaller
      // than k+1 a query HAS fewer than k true neighbors, and dividing
      // by the fixed k would cap its recall below 10⁶ even for a
      // perfect approximate ranking
      .withColumn("recall_ppm",
        call_function("div", col("hits") * 1000000L,
          least(lit(k.toLong), col("__n_exact"))))
      .drop("__n_exact")
  }

  /** Semantic decontamination — the EMBEDDING sibling of the text
    * decontam ops ([[Dedup]]'s exact shingle containment and fuzzy
    * Jaccard forms): flag corpus documents whose embedding scores
    * ≥ `threshold` cosine against ANY benchmark vector. This is the
    * leakage class n-grams structurally miss — paraphrases,
    * translations, and format-shuffled copies of eval items share
    * almost no shingles but sit next to the benchmark in embedding
    * space.
    *
    * Scale shape: benchmark/eval sets are SMALL by construction
    * (10²–10⁵ items), so the benchmark side BROADCASTS and the corpus
    * is touched in one narrow pass — no shuffle of the corpus at all;
    * the per-doc winner is a map-side-combinable min_by aggregate
    * keyed by the doc id. For a benchmark too large to broadcast,
    * compose [[assignCells]] probing (the [[hardNegatives]] candidate
    * shape) instead of this cross-join form.
    *
    * @return flagged docs only: (id, bench_id, n_matches) — bench_id
    *         is the best match (highest cosine, ties → lowest id),
    *         n_matches the number of benchmark vectors ≥ threshold
    */
  def semanticContamination(corpus: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchIdCol: String, benchVecCol: String,
      threshold: Double): DataFrame = {
    val b = broadcast(bench.select(col(benchIdCol).as("bench_id"),
      col(benchVecCol).as("bvec")))
    corpus.select(col(idCol).as("id"), col(vecCol).as("cvec"))
      .crossJoin(b)
      .withColumn("cos", cosine(col("cvec"), col("bvec")))
      .filter(col("cos") >= threshold)
      .groupBy(col("id"))
      .agg(
        min_by(col("bench_id"),
          struct((-col("cos")).as("nc"), col("bench_id"))).as("bench_id"),
        count(lit(1)).as("n_matches"))
  }

  /** Hard-negative mining — the contrastive-training data-prep op
    * (DPR / SimCSE pipelines): for each anchor, the `k` most similar
    * corpus vectors whose LABEL DIFFERS — maximally confusable
    * negatives, the ones worth a gradient. Candidates come from the
    * anchor's `nProbe` probed IVF cells ([[ivfTopK]]'s keyed shape —
    * per anchor only nProbe/nCells of the corpus is touched, never
    * all-pairs), the label-mismatch filter runs before the exact
    * cosine, and ranking ties break on neighbor id.
    * @return (query_id, rank, neighbor_id)
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int,
                    nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = deterministicCentroids(corpus, idCol, vecCol, nCells)
    val c = assignCells(
      corpus.select(col(idCol), col(vecCol), col(labelCol)),
      centroids, idCol, vecCol, 1)
      .select(col("cell"), col(idCol).as("neighbor_id"),
        col(vecCol).as("cvec"), col(labelCol).as("neg_label"))
    val q = assignCells(
      queries.select(col(idCol), col(vecCol), col(labelCol)),
      centroids, idCol, vecCol, nProbe)
      .select(col("cell"), col(idCol).as("query_id"),
        col(vecCol).as("qvec"), col(labelCol).as("anchor_label"))
    val scored = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id") &&
        col("anchor_label") =!= col("neg_label"))
      .select(col("query_id"), col("qvec"), col("neighbor_id"), col("cvec"))
      .distinct()
      .withColumn("cos", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** SemDeDup-style semantic near-dup detection: embeddings are
    * assigned to their nearest coarse-quantizer cell
    * ([[deterministicCentroids]] — same codebook as [[ivfTopK]], so
    * the whole pipeline is SQL-oracle-checkable), then exact cosine
    * runs only WITHIN each cell and pairs ≥ threshold are reported.
    *
    * Scale shape: the all-pairs stage is confined to a cell, and
    * nCells grows with the corpus (a trained codebook targets a
    * roughly constant cell population), so per-cell work stays
    * bounded while the cell join is a keyed equi-join — never
    * all-pairs on the corpus. This is the semantic sibling of
    * [[graft.ops.Dedup.minhashNearDuplicates]]'s band/bucket shape.
    */
  def semanticNearDuplicates(corpus: DataFrame, idCol: String, vecCol: String,
                             threshold: Double, nCells: Int = 16): DataFrame = {
    val centroids = deterministicCentroids(corpus, idCol, vecCol, nCells)
    val assigned = assignCells(
      corpus.select(col(idCol), col(vecCol)), centroids, idCol, vecCol, 1)
    val a = assigned.select(col("cell"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = assigned.select(col("cell"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("cell"), col("id_a"), col("id_b"), col("cos"))
  }

  /** Multi-table sign-LSH ANN: `numTables` independent hash tables of
    * `numPlanes` sign bits each, a candidate = a corpus vector
    * colliding with the query in ANY table; exact cosine + top-k over
    * the deduped candidates. A single table recalls P(collide) =
    * (1−θ/π)^planes per neighbor — near-useless for top-k (measured
    * 3% vs the exact ranking at 8 planes); L tables lift that to
    * 1−(1−p)^L (measured ≥70% at 8×8 — pinned by AnnQualitySpec).
    *
    * One native `lshBucket` call computes all tables: table t's key is
    * bit-window [t·planes, (t+1)·planes) of the 64-plane bucket (the
    * windows are disjoint plane sets, hence independent tables).
    * Multi-probe = `probes` single-bit flips within each window.
    *
    * Scale shape: keyed equi-join on (table, bucket), candidates
    * ≈ L · |corpus| / 2^planes per query — never all-pairs.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numPlanes: Int = 8, probes: Int = 0,
              numTables: Int = 8): DataFrame = {
    require(numPlanes * numTables <= 64, "at most 64 planes across tables")
    val total = numPlanes * numTables
    val mask = if (numPlanes == 64) -1L else (1L << numPlanes) - 1

    def tableKeys(vec: Column): Column = {
      val full = lshBucket(vec, total)
      array((0 until numTables).map { t =>
        struct(lit(t).as("t"),
          shiftrightunsigned(full, t * numPlanes).bitwiseAND(lit(mask)).as("b"))
      }: _*)
    }

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("tk", explode(tableKeys(col("cvec"))))
      .select(col("tk.t").as("t"), col("tk.b").as("bucket"),
        col("neighbor_id"), col("cvec"))

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("tk", explode(tableKeys(col("qvec"))))
      .withColumn("bucket", explode(array_distinct(array(
        (col("tk.b") +:
          (0 until probes).map(p =>
            col("tk.b").bitwiseXOR(shiftleft(lit(1L), p)))): _*))))
      .select(col("tk.t").as("t"), col("bucket"), col("query_id"), col("qvec"))

    val scored = q.join(c, Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qvec"), col("neighbor_id"), col("cvec"))
      .distinct()
      .withColumn("cos", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Plane component (t, p, j) of the md5-derived LSH family: the
    * first 15 hex chars of md5("t,p,j") mod 1000001, recentred to
    * [-500000, 500000]. Integer-valued so the sign of a plane dot
    * against a ×1000-quantized vector is EXACT at any summation
    * order — the property that lets a SQL engine recompute the same
    * buckets bit-for-bit (a float plane would make near-zero dots
    * engine-dependent). */
  private def md5PlaneComp(t: Int, p: Int, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$t,$p,$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000001L - 500000L
  }

  /** Multi-table sign-LSH ANN with md5-derived planes — the
    * cross-engine-checkable sibling of [[lshTopK]] (whose xxhash64
    * plane chain has no SQL equivalent). Same candidate structure —
    * `numTables` independent tables of `numPlanes` sign bits, a
    * candidate = a collision in ANY table, exact cosine + top-k over
    * deduped candidates — but each plane is a CONSTANT integer vector
    * derived from md5("t,p,j"), folded into the plan as literals, and
    * the sign test runs on ×1000-quantized vectors in exact integer
    * arithmetic. A DuckDB oracle recomputes the identical buckets
    * from its own md5, making the whole LSH pipeline (bucketing →
    * collision join → ranking) value-checkable, not just
    * recall-bounded.
    *
    * Scale shape: identical to [[lshTopK]] — bucketing is a narrow
    * map (planes are literals, no join to fetch them), candidates
    * come from a keyed (table, bucket) equi-join, top-k windows only
    * over per-query candidates.
    */
  def lshTopKMd5(queries: DataFrame, corpus: DataFrame,
                 idCol: String, vecCol: String, k: Int, dim: Int,
                 numPlanes: Int = 8, numTables: Int = 8,
                 probes: Int = 2): DataFrame = {
    require(numPlanes < 63, "bucket bits must fit a long")
    // native one-pass bucketing (graft.plans.Md5LshKeysExpression):
    // the fold form below evaluated numTables×numPlanes interpreted
    // aggregate(zip_with) folds per vector; VectorExprsSpec proves
    // native ≡ fold bucket-for-bucket
    val keys = graft.plans.NativeCols.md5LshKeys(
      col(vecCol), dim, numPlanes, numTables)

    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("cvec"), posexplode(keys).as(Seq("t", "bucket")))
      .select(col("t"), col("bucket"), col("neighbor_id"), col("cvec"))
    // multi-probe: each query also looks in the single-bit-flip
    // buckets of its own — same recall lever as [[lshTopK]]'s probes
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qvec"), posexplode(keys).as(Seq("t", "b0")))
      .withColumn("bucket", explode(array_distinct(array(
        (col("b0") +:
          (0 until probes).map(p =>
            col("b0").bitwiseXOR(shiftleft(lit(1L), p)))): _*))))
      .select(col("t"), col("bucket"), col("query_id"), col("qvec"))

    val scored = q.join(c, Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qvec"), col("neighbor_id"), col("cvec"))
      .distinct()
      .withColumn("cos", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Fold-form twin of the native md5-LSH bucketing — the spec's
    * equivalence reference (array of per-table bucket longs). */
  private[graft] def lshTableKeysMd5Fold(vec: Column, dim: Int,
      numPlanes: Int, numTables: Int): Column = {
    val quant = transform(vec, x => floor(x.cast("double") * 1000).cast("long"))
    array((0 until numTables).map { t =>
      (0 until numPlanes).map { p =>
        val plane = typedlit((0 until dim).map(j => md5PlaneComp(t, p, j)))
        val dot = aggregate(
          zip_with(quant, plane, (x, y) => x * y), lit(0L), _ + _)
        when(dot > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }
}
