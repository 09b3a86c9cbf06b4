package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class TransitionStreamSpec extends SparkSpecBase {
  import spark.implicits._
  import TransitionStream._

  private def ev(u: Long, id: Long, item: Int, t: String) =
    ItemEvent(u, id, item, Timestamp.valueOf(t))

  private def run(name: String, batches: Seq[Seq[ItemEvent]], gapUs: Long)
      : Seq[(Long, Int, Int)] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ItemEvent]
    val q = transitions(in.toDS(), gapUs, "1 hour")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .select(col("user_id"), col("src_item"), col("dst_item"))
      .as[(Long, Int, Int)].collect().toSeq.sorted
  }

  test("state carries the last item across micro-batches") {
    val out = run("ts_carry", Seq(
      Seq(ev(1L, 1L, 10, "2024-01-01 10:00:00"),
        ev(1L, 2L, 20, "2024-01-01 10:05:00")),
      Seq(ev(1L, 3L, 30, "2024-01-01 10:10:00")) // chains onto item 20
    ), gapUs = 3600L * 1000000L)
    assert(out == Seq((1L, 10, 20), (1L, 20, 30)))
  }

  test("a session gap suppresses the transition but still advances state") {
    val out = run("ts_gap", Seq(
      Seq(ev(1L, 1L, 10, "2024-01-01 10:00:00")),
      Seq(ev(1L, 2L, 20, "2024-01-01 12:00:00"), // > gap: no 10→20
        ev(1L, 3L, 30, "2024-01-01 12:10:00"))   // 20→30 emits
    ), gapUs = 1800L * 1000000L)
    assert(out == Seq((1L, 20, 30)))
  }

  test("users never cross; in-batch events are event-time sorted") {
    val out = run("ts_users", Seq(
      Seq(ev(2L, 4L, 99, "2024-01-01 10:00:00"),
        // user 1's batch arrives out of order
        ev(1L, 2L, 20, "2024-01-01 10:05:00"),
        ev(1L, 1L, 10, "2024-01-01 10:00:00"))
    ), gapUs = 3600L * 1000000L)
    assert(out == Seq((1L, 10, 20)))
  }

  test("batch parity: streaming pair multiset equals Markov.transitions") {
    val events = tbl("events").select(col("user_id"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"),
        col("ts"))
      .as[ItemEvent].collect().toSeq
      .sortBy(e => (TransitionStream.micros(e.ts), e.event_id))
    // split in ts order (the per-user in-order delivery contract)
    val batches = events.grouped(math.max(1, events.size / 3)).toSeq
    val streamed = run("ts_parity", batches, gapUs = 1800000000L)
      .groupBy(identity).view.mapValues(_.size).toMap
    val batch = graft.rank.Markov.transitions(
        tbl("events").select(col("user_id"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("item"),
          unix_micros(col("ts")).as("ts_us")),
        "user_id", "item", "ts_us", "event_id", gap = 1800000000L)
      .select(col("src_item"), col("dst_item"), col("n")).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val streamedPairs = streamed.map { case ((_, s, d), n) => ((s, d), n.toLong) }
      .groupBy(_._1).view.mapValues(_.values.sum).toMap
    assert(streamedPairs == batch,
      s"stream ${streamedPairs.size} pair keys vs batch ${batch.size}")
  }
}
