package graft

import java.sql.Timestamp

import graft.stream.EventStreams
import graft.stream.EventStreams.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  // base divisible by 30 s so tumbling windows align at sec 0/30/60…
  private val base = 1699999980000L
  private def ts(sec: Long) = new Timestamp(base + sec * 1000)

  test("windowedStats: tumbling 30s event-time windows over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.windowedStats(
      mem.toDF().withColumnRenamed("ts", "ts"), "ts")
      .writeStream.format("memory").queryName("winstats")
      .outputMode(OutputMode.Append()).start()

    mem.addData(
      Event(1, ts(0), "click", 1.0),
      Event(2, ts(10), "click", 2.0),
      Event(1, ts(35), "view", 5.0))
    q.processAllAvailable()
    // advance watermark far enough to close the first windows
    mem.addData(Event(9, ts(1000), "click", 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("winstats")
      .select(col("window_start").cast("long") - base / 1000,
        col("event_type"), col("n_events"), col("total_value"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(rows.contains((0L, "click", 2L, 3.0)))
    assert(rows.contains((30L, "view", 1L, 5.0)))
  }

  test("dedupStream: re-delivered keys dropped within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.dedupStream(mem.toDF(), Seq("user_id", "event_type"),
      watermark = "1 minute")
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append()).start()

    mem.addData(
      Event(1, ts(0), "click", 1.0),
      Event(1, ts(5), "click", 1.0),  // duplicate delivery within horizon
      Event(2, ts(5), "view", 7.0))
    q.processAllAvailable()
    mem.addData(Event(1, ts(8), "click", 1.0)) // dup again, later batch
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("dedup")
      .select("user_id", "event_type").as[(Long, String)].collect().toSeq
    assert(rows.sorted == Seq((1L, "click"), (2L, "view")))
  }

  test("sessionize: gap-based sessions with event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapSeconds = 20)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    // user 1: two events 10s apart (one session), then a 100s gap
    // (new session); user 2: a single event
    mem.addData(
      Event(1, ts(0), "click", 1.0),
      Event(1, ts(10), "click", 2.0),
      Event(2, ts(5), "view", 7.0))
    q.processAllAvailable()
    mem.addData(Event(1, ts(110), "click", 4.0))
    q.processAllAvailable()
    // push the watermark far ahead so every open session times out
    mem.addData(Event(9, ts(5000), "noise", 0.0))
    q.processAllAvailable()
    mem.addData(Event(9, ts(9000), "noise", 0.0))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sessions").as[Session].collect()
      .map(s => (s.user_id,
        (s.session_start.getTime - base) / 1000,
        (s.session_end.getTime - base) / 1000,
        s.n_events, s.total_value))
      .toSet
    assert(sessions.contains((1L, 0L, 10L, 2L, 3.0)))   // first session closed by gap
    assert(sessions.contains((1L, 110L, 110L, 1L, 4.0))) // second closed by timeout
    assert(sessions.contains((2L, 5L, 5L, 1L, 7.0)))
  }
}
