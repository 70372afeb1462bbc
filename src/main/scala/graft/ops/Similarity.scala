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
    */
  def cosine(a: Column, b: Column): Column = {
    def dbl(c: Column) = transform(c, _.cast("double"))
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)
    val da = dbl(a); val db = dbl(b)
    dot(da, db) / (sqrt(dot(da, da)) * sqrt(dot(db, db)))
  }

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

  /** Sign-LSH bucket key: `numPlanes` sign bits of dot(vec, plane). */
  def lshBucket(vec: Column, numPlanes: Int = 12): Column = {
    val bits = (0 until numPlanes).map { p =>
      val dotp = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") * planeComponent(p, j)),
        lit(0.0), _ + _)
      when(dotp > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** LSH-bucketed ANN: join query and corpus on bucket key (equality
    * on all sign bits), then exact cosine + top-k within candidates.
    * Misses are possible (it's approximate); multi-probe = union over
    * `probes` single-bit flips of the query bucket.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              numPlanes: Int = 12, probes: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("bucket", lshBucket(col("cvec"), numPlanes))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("qbucket", lshBucket(col("qvec"), numPlanes))
    // multi-probe: the exact bucket plus single-bit neighbors
    val probeBuckets = array(
      (col("qbucket") +:
        (0 until probes).map(p =>
          col("qbucket").bitwiseXOR(shiftleft(lit(1L), p)))): _*)
    val q = q0.withColumn("bucket", explode(array_distinct(probeBuckets)))
    val scored = q.join(c, Seq("bucket"))
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
}
