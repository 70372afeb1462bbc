package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Keyed-routing functions (SURVEY §2.9 F1, §2.3 P5). */
object Routing {

  /** F1: the reference's deterministic partitioner —
    * `unpack('N', md5(join('|', parts))) % n`
    * (`replayer/connemara_replay.pl:942-944,956-958`): first 4 bytes
    * of the md5 as an unsigned big-endian int, mod n. Reproduced
    * bit-for-bit: first 8 hex chars parsed base-16.
    */
  def md5Route(n: Int, parts: Column*): Column =
    pmod(
      conv(substring(md5(concat_ws("|", parts: _*)), 1, 8), 16, 10).cast("long"),
      lit(n.toLong))

  /** P5: db/slot restriction predicate —
    * `(database NOT IN (…)) OR ((database, source_slotname) IN (…))`
    * built from the per-db slot config
    * (`replayer/connemara_replay.pl:779-799`): a database with a
    * configured slot only accepts rows from that slot; unconfigured
    * databases pass freely.
    */
  def dbSlotRestriction(slotByDb: Map[String, String],
                        database: Column, slot: Column): Column =
    if (slotByDb.isEmpty) lit(true)
    else {
      val restricted = slotByDb.keys.toSeq
      val pairOk = slotByDb.toSeq
        .map { case (d, s) => database === d && slot === s }
        .reduce(_ || _)
      !database.isin(restricted: _*) || pairOk
    }
}
