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

  test("concentration: Gini matches the hand formula on known counts") {
    // counts: a=1, b=2, c=3 -> ranks 1,2,3; N=3, S=6
    // gini = (2*(1*1+2*2+3*3) - 4*6) / (3*6) = (28-24)/18 = 2/9
    val ev = ("a" +: Seq.fill(2)("b")) ++ Seq.fill(3)("c")
    val df = ev.map(Tuple1(_)).toDF("item")
    val r = Popularity.concentration(df, "item", topK = 1).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 6L)
    assert(r.getLong(2) == 4L && r.getLong(3) == 18L)
    assert(r.getDouble(4) == 4.0 / 18.0)
    assert(r.getLong(5) == 3L) // top-1 item c
    assert(r.getDouble(6) == 3.0 / 6.0)
  }

  test("concentration: a uniform distribution has Gini 0") {
    val df = (1 to 50).flatMap(i => Seq.fill(4)(s"i$i")).map(Tuple1(_)).toDF("item")
    val r = Popularity.concentration(df, "item").collect().head
    assert(r.getLong(2) == 0L && r.getDouble(4) == 0.0)
  }

  test("concentration: Gini is invariant to input partitioning (tie groups)") {
    val ev = tbl("events").select(
      get_json_object(col("props"), "$.k").cast("int").as("item"))
    val a = Popularity.concentration(ev, "item").collect().head
    val b = Popularity.concentration(ev.repartition(13), "item").collect().head
    assert(a == b)
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
