package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salted equi-join for skewed keys. AQE's skew-join handles most
  * cases at runtime, but salting is the explicit, planner-independent
  * form: the probe side scatters each hot key across `salt` synthetic
  * sub-keys, the build side replicates `salt`×, and the join runs on
  * (key, salt) — no single reducer ever owns a whole hot key. The
  * result set is IDENTICAL to the plain join (salt never changes
  * matching), which is exactly what the oracle checks.
  */
object SkewJoin {

  /** @param big   probe side (large, possibly skewed on `keys`)
    * @param small build side (replicated `salt`× — keep it broadcast-
    *              sized or the replication cost dominates)
    * @param keys  equi-join column names common to both sides
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int = 8): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    // deterministic spread: hash ALL probe-side columns, so same-key
    // rows scatter while reruns salt identically (rand() would
    // re-sample per retry and break task determinism)
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, keys :+ "__salt", "inner").drop("__salt")
  }
}
