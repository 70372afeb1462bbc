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
