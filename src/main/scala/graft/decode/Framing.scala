package graft.decode

import scala.util.matching.Regex

/** wal2json chunk framing (SURVEY §2.1 S2): classify each streamed
  * chunk as first / regular / last and reassemble transactions — the
  * C receiver's PCRE state machine
  * (`connemara_replication/src/connemara_replication.c:33-104,
  * 736-754, 882-926`), including the regexes its CUnit tests pin
  * (`connemara_replication/tests/connemara_basic_test.c:5-25`).
  */
object Framing {

  sealed trait MessageType
  case object First extends MessageType
  case object Regular extends MessageType
  case object Last extends MessageType

  // first chunk: the transaction envelope opener with xid + timestamp
  private val firstRe: Regex =
    """(?s)^\{"xid":(\d+),"timestamp":"([\d\-: ]*(\.\d+)?([+-]\d+)?)".*""".r
  // last chunk: the envelope closer
  private val lastRe: Regex = """^\s*\]\s*\}\s*$""".r
  // regular chunk: one change record, optionally comma-prefixed
  private val regularRe: Regex = """(?s)^\s*,?\s*(\{.*\})\s*$""".r

  def isFirst(chunk: String): Boolean = firstRe.pattern.matcher(chunk).matches()
  def isLast(chunk: String): Boolean = lastRe.pattern.matcher(chunk).matches()

  def classify(chunk: String): MessageType =
    if (isFirst(chunk)) First
    else if (isLast(chunk)) Last
    else Regular

  /** Extract (xid, timestamp-text) from a first chunk. */
  def firstHeader(chunk: String): Option[(Long, String)] =
    firstRe.findFirstMatchIn(chunk).map(m => (m.group(1).toLong, m.group(2)))

  /** Split a string of comma-separated top-level JSON objects into
    * the individual objects (brace/quote aware). */
  private[decode] def splitTopLevelObjects(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    var depth = 0; var inq = false; var esc = false; var start = -1
    s.zipWithIndex.foreach { case (c, i) =>
      if (esc) esc = false
      else if (inq) c match {
        case '\\' => esc = true
        case '"'  => inq = false
        case _    => ()
      } else c match {
        case '"' => inq = true
        case '{' => if (depth == 0) start = i; depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0 && start >= 0) { out += s.substring(start, i + 1); start = -1 }
        case _ => ()
      }
    }
    out.toSeq
  }

  // ---------------------------------------------------------------
  // wal2json v2 (one complete JSON object per message, discriminated
  // by an "action" key: B=begin C=commit I/U/D=change T=truncate
  // M=message). The reference detects v2 indirectly: its first
  // START_REPLICATION attempt passes `"include-unchanged-toast"
  // 'false'` and a server that rejects the deprecated option (wal2json
  // >= 2) gets a retry without it
  // (`connemara_replication/src/connemara_replication.c:540-560`).
  // ---------------------------------------------------------------

  sealed trait Format
  case object V1 extends Format
  case object V2 extends Format

  private val v2ActionRe: Regex =
    """(?s)^\s*\{\s*"action"\s*:\s*"([BCIUDTM])".*""".r
  private val xidRe: Regex = """"xid"\s*:\s*(\d+)""".r
  private val tsRe: Regex = """"timestamp"\s*:\s*"([^"]*)"""".r

  /** v2 action letter of a message, if it is one. */
  def v2Action(chunk: String): Option[String] =
    v2ActionRe.findFirstMatchIn(chunk).map(_.group(1))

  /** A v1 stream opens with the transaction envelope (`{"xid":…`);
    * a v2 stream's messages each carry `"action"`. Detected from the
    * first message, as the receiver would after the option retry. */
  def detectFormat(firstChunk: String): Format =
    if (v2Action(firstChunk).isDefined) V2 else V1

  /** START_REPLICATION option negotiation
    * (`connemara_replication.c:497-560`): the base option set plus the
    * formerly-needed, newly-deprecated `include-unchanged-toast`; a
    * server that rejects the first attempt (wal2json >= 2.0) gets one
    * retry without it. `accepts` plays the server; returns the
    * accepted option list, or None when even the fallback is refused
    * (the receiver exits). `filterTables` appends the server-side
    * `filter-tables` pushdown when present (`:534-539`). */
  def negotiateStartOptions(
      accepts: Seq[(String, String)] => Boolean,
      filterTables: Option[String] = None): Option[Seq[(String, String)]] = {
    val base = Seq(
      "write-in-chunks" -> "true",
      "include-types" -> "false",
      "include-xids" -> "true",
      "include-timestamp" -> "true") ++
      filterTables.map("filter-tables" -> _)
    val first = base :+ ("include-unchanged-toast" -> "false")
    if (accepts(first)) Some(first)
    else if (accepts(base)) Some(base)
    else None
  }

  /** Reassemble a v2 message stream: B opens a transaction (carrying
    * xid + timestamp under the same include-xids/include-timestamp
    * options as v1), I/U/D messages inside the window are attributed
    * to it, C closes it. Changes outside a B…C window and non-DML
    * actions (T/M) are dropped, as the v1 path drops orphan chunks. */
  def reassembleV2(chunks: Iterator[String]): Iterator[(Long, String, String)] = {
    var current: Option[(Long, String)] = None
    chunks.flatMap { chunk =>
      v2Action(chunk) match {
        case Some("B") =>
          current = for {
            x <- xidRe.findFirstMatchIn(chunk).map(_.group(1).toLong)
            t <- tsRe.findFirstMatchIn(chunk).map(_.group(1))
          } yield (x, t)
          Seq.empty
        case Some("C") =>
          current = None
          Seq.empty
        case Some("I") | Some("U") | Some("D") =>
          current match {
            case Some((xid, ts)) => Seq((xid, ts, chunk.trim))
            case None            => Seq.empty
          }
        case _ => Seq.empty // T/M/non-v2 noise inside a v2 stream
      }
    }
  }

  /** Format-dispatching reassembly: peeks the first chunk, then runs
    * the v1 chunk automaton or the v2 message loop. */
  def reassembleAuto(chunks: Iterator[String]): Iterator[(Long, String, String)] = {
    val buf = chunks.buffered
    if (buf.hasNext && detectFormat(buf.head) == V2) reassembleV2(buf)
    else reassemble(buf)
  }

  /** Reassemble a chunk stream into complete per-change payloads with
    * their transaction context: (xid, timestampText, changeJson).
    * A first chunk may already carry change records after
    * `"change": [` (including a complete single-chunk envelope) —
    * those are emitted, and a trailing `]}` closes the transaction.
    * Chunks outside a first…last window are dropped, as the receiver
    * drops them.
    */
  def reassemble(chunks: Iterator[String]): Iterator[(Long, String, String)] = {
    var current: Option[(Long, String)] = None
    chunks.flatMap { chunk =>
      classify(chunk) match {
        case First =>
          current = firstHeader(chunk)
          val inline = current match {
            case Some((xid, ts)) =>
              val afterOpen = chunk.indexOf('[', chunk.indexOf("\"change\""))
              if (afterOpen < 0) Seq.empty
              else splitTopLevelObjects(chunk.substring(afterOpen + 1))
                .map(obj => (xid, ts, obj))
            case None => Seq.empty
          }
          if (chunk.trim.endsWith("]}")) current = None // complete envelope
          inline
        case Last =>
          current = None
          Seq.empty
        case Regular =>
          current match {
            case Some((xid, ts)) =>
              // a Regular chunk may carry SEVERAL change records
              // (`{...},{...}`) — split like the First-chunk path
              // does; the greedy `regularRe` capture would glue them
              // into one unparseable payload
              splitTopLevelObjects(chunk).map(obj => (xid, ts, obj))
            case None => Seq.empty
          }
      }
    }
  }
}
