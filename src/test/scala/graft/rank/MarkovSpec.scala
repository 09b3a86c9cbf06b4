package graft.rank

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class MarkovSpec extends SparkSpecBase {
  import spark.implicits._

  // (user, event, item, ts)
  private def fixture = Seq(
    // user 1, one session: a -> b -> a -> b
    (1L, 1L, "a", 1000L), (1L, 2L, "b", 1100L),
    (1L, 3L, "a", 1200L), (1L, 4L, "b", 1300L),
    // user 2: a -> c, then a SESSION BREAK (gap > 500), then c -> b
    (2L, 5L, "a", 1000L), (2L, 6L, "c", 1200L),
    (2L, 7L, "c", 9000L), (2L, 8L, "b", 9100L)
  ).toDF("user_id", "event_id", "item", "ts")

  test("counts consecutive pairs per user, conditioned on the source item") {
    val m = Markov.transitions(fixture, "user_id", "item", "ts", "event_id", gap = 500L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // a->b twice (user 1), a->c once (user 2) => P(b|a) = 2/3
    assert(m(("a", "b")) == (2L, 3L, 2.0 / 3.0))
    assert(m(("a", "c")) == (1L, 3L, 1.0 / 3.0))
    // user 1's b->a; user 2's c->b
    assert(m(("b", "a")) == (1L, 1L, 1.0))
    assert(m(("c", "b")) == (1L, 1L, 1.0))
    assert(m.size == 4)
  }

  test("a session break (gap exceeded) cuts the transition") {
    val m = Markov.transitions(fixture, "user_id", "item", "ts", "event_id", gap = 500L)
    // user 2's c@1200 -> c@9000 crosses the gap: no c->c row
    assert(m.filter(col("src_item") === "c" && col("dst_item") === "c").count() == 0)
    // with an unbounded gap it appears
    val all = Markov.transitions(fixture, "user_id", "item", "ts", "event_id", gap = Long.MaxValue)
    assert(all.filter(col("src_item") === "c" && col("dst_item") === "c").count() == 1)
  }

  test("transitions never cross users") {
    // user 1 ends with b@4000; user 2 starts with a@1000 — even with an
    // unbounded gap, no b->a transition beyond user 1's own 3000->? none
    val solo = Seq((1L, 1L, "x", 100L), (2L, 2L, "y", 200L))
      .toDF("user_id", "event_id", "item", "ts")
    assert(Markov.transitions(solo, "user_id", "item", "ts", "event_id", Long.MaxValue).count() == 0)
  }

  test("probabilities per source sum to 1") {
    val m = Markov.transitions(fixture, "user_id", "item", "ts", "event_id", gap = 500L)
    val sums = m.groupBy(col("src_item")).agg(sum(col("p")).as("s")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))
  }

  test("nextItems ranks by count desc then dst asc, capped at k") {
    val m = Markov.transitions(fixture, "user_id", "item", "ts", "event_id", gap = 500L)
    val top = Markov.nextItems(m, 1).filter(col("src_item") === "a").collect()
    assert(top.length == 1 && top.head.getAs[String]("dst_item") == "b")
  }

  test("plan: exactly two exchanges — the user window and the src repartition") {
    val m = Markov.transitions(fixture, "user_id", "item", "ts", "event_id", gap = 500L)
    val plan = m.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, plan:\n$plan")
  }
}
