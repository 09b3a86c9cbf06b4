package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class EventStreamSpec extends SparkSpecBase {
  import spark.implicits._
  import EventStream._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked dedup drops re-delivered event ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = dedupEvents(in.toDF(), "event_id", "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      Event(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      Event(2L, ts("2024-01-01 10:01:00"), 1L, "click", 2.0))
    q.processAllAvailable()
    in.addData( // re-delivery of id 1 + a new event
      Event(1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
      Event(3L, ts("2024-01-01 10:02:00"), 2L, "buy", 3.0))
    q.processAllAvailable()
    val out = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    q.stop()
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("tumbling-window per-type stats aggregate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = windowedTypeStats(in.toDF(), "ts", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete()).start()
    in.addData(
      Event(1L, ts("2024-01-01 10:01:00"), 1L, "click", 1.5),
      Event(2L, ts("2024-01-01 10:05:00"), 2L, "click", 2.5),
      Event(3L, ts("2024-01-01 10:11:00"), 1L, "click", 4.0))
    q.processAllAvailable()
    val rows = spark.table("win_out")
      .selectExpr("window.start", "event_type", "n", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set(
      (ts("2024-01-01 10:00:00"), "click", 2L, 4.0),
      (ts("2024-01-01 10:10:00"), "click", 1L, 4.0)))
  }

  test("mergeSessions transition: gap splits, in-gap extends (pure function)") {
    val (closed0, open0) = mergeSessions(None, Seq(0L, 1000L, 2000L), 5000L)
    assert(closed0.isEmpty && open0.contains(SessionState(0L, 2000L, 3)))
    val (closed1, open1) = mergeSessions(open0, Seq(10000L, 11000L), 5000L)
    assert(closed1 == Seq(SessionState(0L, 2000L, 3)))
    assert(open1.contains(SessionState(10000L, 11000L, 2)))
  }

  test("sessionize emits a closed session when a later event opens the next one") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = sessionize(in.toDS(), gapMs = 5 * 60 * 1000, watermark = "10 seconds")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    in.addData(
      Event(1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
      Event(2L, ts("2024-01-01 10:02:00"), 7L, "click", 1.0))
    q.processAllAvailable()
    in.addData(Event(3L, ts("2024-01-01 11:00:00"), 7L, "click", 1.0))
    q.processAllAvailable()
    val out = spark.table("sess_out").as[Session].collect().toSeq
    q.stop()
    assert(out == Seq(Session(7L,
      ts("2024-01-01 10:00:00").getTime, ts("2024-01-01 10:02:00").getTime, 2)))
  }

  test("sessionizeBatch equals the streaming merge semantics on the events fixture") {
    import org.apache.spark.sql.functions._
    val gap = 1800000L
    val ev = tbl("events")
    val got = EventStream.sessionizeBatch(ev, "user_id", unix_millis(col("ts")), gap)
      .select($"user_id", $"session_start_ms", $"session_end_ms", $"n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    // expected: fold each user's sorted timestamps through the SAME pure
    // transition the streaming path uses; closed ++ open = all sessions
    val perUser = ev.select($"user_id", unix_millis($"ts").as("tms"))
      .as[(Long, Long)].collect().groupBy(_._1)
    val expected = perUser.flatMap { case (u, rows) =>
      val (closed, open) = EventStream.mergeSessions(None, rows.map(_._2).sorted.toSeq, gap)
      (closed ++ open).map(s => (u, s.start, s.end, s.nEvents.toLong))
    }.toSet
    assert(got == expected)
    // session ids are 1-based and time-ordered per user
    val ids = EventStream.sessionizeBatch(ev, "user_id", unix_millis(col("ts")), gap)
      .groupBy($"user_id")
      .agg(min($"session_id").as("lo"), max($"session_id").as("hi"),
        count(lit(1)).as("n"))
      .filter($"lo" =!= 1 || $"hi" =!= $"n")
    assert(ids.isEmpty)
  }
}
