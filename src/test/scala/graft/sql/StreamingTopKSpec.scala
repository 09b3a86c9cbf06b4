package graft.sql

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** TopKAggF under Structured Streaming (round 10): the aggregate's
  * serialize/deserialize pair is exactly what the state store needs, so
  * the SAME native heap that cuts batch retrieval exchanges maintains a
  * bounded per-group top-k ACROSS micro-batches — k-bounded state per
  * key in the store, no retained candidate rows. That is the streaming
  * leaderboard/served-recs-refresh shape (RecsTable.streamRefresh keeps
  * whole rows; this keeps only k (id, score) pairs per key).
  */
class StreamingTopKSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming graft_topk equals the batch form after arbitrary micro-batching") {
    graft.sql.GraftFunctions.register(spark)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Double)]
    val agg = in.toDF().toDF("user_id", "item_id", "score")
      .groupBy($"user_id")
      .agg(GraftFunctions.topKAgg($"score", $"item_id", 3).as("top"))
    val q = agg.writeStream.format("memory").queryName("stream_topk")
      .outputMode(OutputMode.Complete()).start()
    // three micro-batches with cross-batch displacement: user 1's batch-3
    // score 9.0 must evict its batch-1 survivor 2.0
    in.addData((1L, 10L, 2.0), (1L, 11L, 5.0), (2L, 20L, 1.0))
    q.processAllAvailable()
    in.addData((1L, 12L, 4.0), (2L, 21L, 1.0)) // tie on score for user 2
    q.processAllAvailable()
    in.addData((1L, 13L, 9.0), (2L, 22L, 0.5))
    q.processAllAvailable()
    val streamed = spark.table("stream_topk")
      .select($"user_id", posexplode($"top"))
      .select($"user_id", ($"pos" + 1).as("rk"), $"col.id".as("item_id"),
        $"col.score".as("score"))
      .orderBy("user_id", "rk").collect().map(_.toString).toSeq
    q.stop()
    val batch = Seq((1L, 10L, 2.0), (1L, 11L, 5.0), (2L, 20L, 1.0),
        (1L, 12L, 4.0), (2L, 21L, 1.0), (1L, 13L, 9.0), (2L, 22L, 0.5))
      .toDF("user_id", "item_id", "score")
      .groupBy($"user_id")
      .agg(GraftFunctions.topKAgg($"score", $"item_id", 3).as("top"))
      .select($"user_id", posexplode($"top"))
      .select($"user_id", ($"pos" + 1).as("rk"), $"col.id".as("item_id"),
        $"col.score".as("score"))
      .orderBy("user_id", "rk").collect().map(_.toString).toSeq
    assert(streamed == batch)
    // displacement actually happened: user 1's final top-3 is (9,5,4) —
    // the batch-1 survivor (score 2) is gone
    assert(streamed.count(_.startsWith("[1,")) == 3)
    assert(!streamed.exists(s => s.startsWith("[1,") && s.contains(",10,")))
    // tie on user 2 broke toward the smaller id (20 before 21)
    assert(streamed.filter(_.startsWith("[2,")).head.contains(",20,"))
  }
}
