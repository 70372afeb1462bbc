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
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "input already has a __salt column")
    // spread by row position, not row content: content hashes send
    // byte-identical duplicate rows of a hot key (the at-least-once
    // ingest shape salting exists for) to ONE reducer. The id is
    // partition-deterministic (partitionId << 33 | row index), so
    // task retries re-derive the same salts; and whichever salt a row
    // gets, it matches the same replicated build row — the salt can
    // never change the join result, only the distribution.
    val bigS = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, keys :+ "__salt", "inner").drop("__salt")
  }
}
