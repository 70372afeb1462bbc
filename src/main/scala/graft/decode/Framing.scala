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

  /** Reassemble a chunk stream into complete per-change payloads with
    * their transaction context: (xid, timestampText, changeJson).
    * Chunks outside a first…last window are dropped, as the receiver
    * drops them.
    */
  def reassemble(chunks: Iterator[String]): Iterator[(Long, String, String)] = {
    var current: Option[(Long, String)] = None
    chunks.flatMap { chunk =>
      classify(chunk) match {
        case First =>
          current = firstHeader(chunk)
          // the opener may carry the first change after "change": [
          Seq.empty
        case Last =>
          current = None
          Seq.empty
        case Regular =>
          current match {
            case Some((xid, ts)) =>
              regularRe.findFirstMatchIn(chunk)
                .map(m => (xid, ts, m.group(1))).toSeq
            case None => Seq.empty
          }
      }
    }
  }
}
