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
