package graft.rank

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PopularitySpec extends SparkSpecBase {
  import spark.implicits._

  private val day = 86400000000L // micros

  test("weights are exact dyadic: 2^(cap - floor(age/halfLife))") {
    // anchor = max ts = 100*day; ages 0, 6, 7, 14 days at halfLife 7
    val ev = Seq(
      ("a", 100L * day), // e=0 -> 2^40
      ("a", 94L * day),  // 6 days -> e=0 -> 2^40
      ("b", 93L * day),  // 7 days -> e=1 -> 2^39
      ("c", 86L * day)   // 14 days -> e=2 -> 2^38
    ).toDF("item", "ts")
    val out = Popularity.decayedScores(ev, "item", "ts", halfLifeDays = 7)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("a") == (1L << 40) * 2)
    assert(out("b") == (1L << 39))
    assert(out("c") == (1L << 38))
  }

  test("events past cap doublings contribute the floor weight 1, not 0") {
    val ev = Seq(("old", 0L), ("old", 1000L * day)).toDF("item", "ts")
    // age 1000 days, halfLife 1 -> e clamped at 40 -> weight 2^0 = 1
    val out = Popularity.decayedScores(ev, "item", "ts", halfLifeDays = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("old") == (1L << 40) + 1L)
  }

  test("ordering is score desc then item; recency beats raw count") {
    // 3 ancient events vs 1 fresh event
    val ev = Seq(
      ("stale", 0L), ("stale", 0L), ("stale", 0L),
      ("fresh", 400L * day)
    ).toDF("item", "ts")
    val rows = Popularity.decayedScores(ev, "item", "ts", halfLifeDays = 7)
      .select(col("item")).as[String].collect()
    assert(rows.head == "fresh" && rows.last == "stale")
  }

  test("n_events and last_seen ride the same aggregate") {
    val ev = Seq(("a", 5L * day), ("a", 9L * day)).toDF("item", "ts")
    val r = Popularity.decayedScores(ev, "item", "ts", halfLifeDays = 7).collect().head
    assert(r.getLong(1) == 2L && r.getLong(3) == 9L * day)
  }

  test("plan: one partial-aggregated shuffle, anchor broadcast") {
    val ev = tbl("events").select(
      get_json_object(col("props"), "$.k").cast("int").as("item"),
      unix_micros(col("ts")).as("ts_us"))
    val df = Popularity.decayedScores(ev, "item", "ts_us", halfLifeDays = 7)
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly 1 hash exchange:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"anchor should broadcast:\n$p")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"expected partial aggregation:\n$p")
  }
}
