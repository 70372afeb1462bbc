package graft

import graft.decode.Framing
import org.scalatest.funsuite.AnyFunSuite

/** Framing classification — the reference's CUnit vectors verbatim
  * (`connemara_replication/tests/connemara_basic_test.c:5-25`,
  * quoted in FIXTURES.md §3).
  */
class FramingSpec extends AnyFunSuite {

  test("is_first_message: CUnit vectors") {
    assert(Framing.isFirst(
      """{"xid":1234,"timestamp":"2021-03-17 10:04:29.123456+01", "change": ["""))
    assert(Framing.isFirst("""{"xid":1,"timestamp":"2021-03-17 10:04:29+01","change":[]}"""))
    assert(!Framing.isFirst(""",{"kind":"insert"}"""))
    assert(!Framing.isFirst("]}"))
  }

  test("is_last_message: CUnit vectors") {
    assert(Framing.isLast("]}"))
    assert(Framing.isLast(" ]} "))
    assert(!Framing.isLast("""{"xid":1234,"timestamp":"x","change":["""))
    assert(!Framing.isLast(""",{"kind":"delete"}"""))
  }

  test("first header extracts xid and the timestamp grammar (F3)") {
    assert(Framing.firstHeader(
      """{"xid":1234,"timestamp":"2021-03-17 10:04:29.123456+01", "change": [""")
      .contains((1234L, "2021-03-17 10:04:29.123456+01")))
  }

  test("reassemble: single-chunk envelope and inline first-chunk changes") {
    val chunks = Iterator(
      // complete envelope in ONE chunk — changes must not be lost
      """{"xid":5,"timestamp":"2021-01-01 00:00:00+00","change":[{"kind":"insert","v":1},{"kind":"update","v":2}]}""",
      // orphan regular after a complete envelope: dropped, not
      // mis-attributed to xid 5
      """,{"kind":"orphan"}""",
      // first chunk carrying its first change inline, continued
      """{"xid":6,"timestamp":"2021-01-01 00:01:00+00","change":[{"kind":"insert","v":3}""",
      """,{"kind":"delete","v":4}""",
      "]}")
    val out = Framing.reassemble(chunks).toSeq
    assert(out == Seq(
      (5L, "2021-01-01 00:00:00+00", """{"kind":"insert","v":1}"""),
      (5L, "2021-01-01 00:00:00+00", """{"kind":"update","v":2}"""),
      (6L, "2021-01-01 00:01:00+00", """{"kind":"insert","v":3}"""),
      (6L, "2021-01-01 00:01:00+00", """{"kind":"delete","v":4}""")))
  }

  test("reassemble: transaction context carried onto each change") {
    val chunks = Iterator(
      """{"xid":7,"timestamp":"2021-03-17 10:04:29+01", "change": [""",
      """{"kind":"insert","schema":"public","table":"t"}""",
      """,{"kind":"delete","schema":"public","table":"t"}""",
      "]}",
      """,{"kind":"orphan-outside-txn"}""", // dropped: no open transaction
      """{"xid":8,"timestamp":"2021-03-17 10:05:00+01", "change": [""",
      """{"kind":"update"}""",
      "]}")
    val out = Framing.reassemble(chunks).toSeq
    assert(out == Seq(
      (7L, "2021-03-17 10:04:29+01", """{"kind":"insert","schema":"public","table":"t"}"""),
      (7L, "2021-03-17 10:04:29+01", """{"kind":"delete","schema":"public","table":"t"}"""),
      (8L, "2021-03-17 10:05:00+01", """{"kind":"update"}""")))
  }

  test("v2: action classification and format detection") {
    assert(Framing.v2Action("""{"action":"B","xid":1234,"timestamp":"2021-03-17 10:04:29.123456+01"}""").contains("B"))
    assert(Framing.v2Action("""{"action":"I","schema":"public","table":"t","columns":[]}""").contains("I"))
    assert(Framing.v2Action("""{"action":"C"}""").contains("C"))
    assert(Framing.v2Action("""{"xid":1,"timestamp":"x","change":[""".stripMargin).isEmpty)
    assert(Framing.detectFormat("""{"action":"B","xid":1}""") == Framing.V2)
    assert(Framing.detectFormat("""{"xid":1,"timestamp":"x","change":[""") == Framing.V1)
  }

  test("v2: reassemble attributes changes to the open B…C window") {
    val msgs = Iterator(
      """{"action":"B","xid":11,"timestamp":"2021-03-17 10:04:29.123456+01"}""",
      """{"action":"I","schema":"public","table":"t","columns":[{"name":"id","value":1}]}""",
      """{"action":"U","schema":"public","table":"t","columns":[{"name":"id","value":1}],"identity":[{"name":"id","value":1}]}""",
      """{"action":"C"}""",
      """{"action":"D","schema":"public","table":"t","identity":[{"name":"id","value":9}]}""", // orphan: dropped
      """{"action":"B","xid":12,"timestamp":"2021-03-17 10:05:00+01"}""",
      """{"action":"T","schema":"public","table":"t"}""", // truncate: not DML, dropped
      """{"action":"D","schema":"public","table":"t","identity":[{"name":"id","value":2}]}""",
      """{"action":"C"}""")
    val out = Framing.reassembleV2(msgs).toSeq
    assert(out.map(t => (t._1, t._2)) == Seq(
      (11L, "2021-03-17 10:04:29.123456+01"),
      (11L, "2021-03-17 10:04:29.123456+01"),
      (12L, "2021-03-17 10:05:00+01")))
    assert(out(0)._3.contains(""""action":"I""""))
    assert(out(2)._3.contains(""""value":2"""))
  }

  test("v2: reassembleAuto dispatches by first message; v1 unchanged") {
    val v2 = Iterator(
      """{"action":"B","xid":3,"timestamp":"2021-01-01 00:00:00+00"}""",
      """{"action":"I","schema":"s","table":"t","columns":[]}""",
      """{"action":"C"}""")
    assert(Framing.reassembleAuto(v2).toSeq.map(_._1) == Seq(3L))
    val v1 = Iterator(
      """{"xid":5,"timestamp":"2021-01-01 00:00:00+00","change":[{"kind":"insert","v":1}]}""")
    assert(Framing.reassembleAuto(v1).toSeq ==
      Seq((5L, "2021-01-01 00:00:00+00", """{"kind":"insert","v":1}""")))
  }

  test("v2: start-option negotiation retries without include-unchanged-toast") {
    // v1 server: accepts the deprecated option on the first attempt
    val v1Opts = Framing.negotiateStartOptions(_ => true)
    assert(v1Opts.exists(_.contains("include-unchanged-toast" -> "false")))
    // v2 server: rejects the deprecated option, accepts the fallback
    val v2Opts = Framing.negotiateStartOptions(
      opts => !opts.exists(_._1 == "include-unchanged-toast"))
    assert(v2Opts.isDefined)
    assert(!v2Opts.get.exists(_._1 == "include-unchanged-toast"))
    assert(v2Opts.get.contains("write-in-chunks" -> "true"))
    // filter-tables pushdown rides along in both attempts
    val filtered = Framing.negotiateStartOptions(_ => true, Some("public.*"))
    assert(filtered.exists(_.contains("filter-tables" -> "public.*")))
    // a server refusing both attempts → None (receiver exits)
    assert(Framing.negotiateStartOptions(_ => false).isEmpty)
  }

  test("reassemble: one Regular chunk carrying several change records") {
    val chunks = Iterator(
      """{"xid":9,"timestamp":"2021-03-17 11:00:00+01", "change": [""",
      """,{"kind":"insert","v":1},{"kind":"update","v":2}""", // two in one chunk
      """,{"kind":"delete","v":"br{}ace \"q\""}""",           // braces/quotes inside
      "]}")
    val out = Framing.reassemble(chunks).toSeq
    assert(out == Seq(
      (9L, "2021-03-17 11:00:00+01", """{"kind":"insert","v":1}"""),
      (9L, "2021-03-17 11:00:00+01", """{"kind":"update","v":2}"""),
      (9L, "2021-03-17 11:00:00+01", """{"kind":"delete","v":"br{}ace \"q\""}""")))
  }
}
