package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class FunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def us(s: String) = ts(s).getTime * 1000L

  private val events = Seq(
    // user 1: clean view -> click -> purchase
    (1L, "view", ts("2024-01-01 10:00:00")),
    (1L, "click", ts("2024-01-01 10:05:00")),
    (1L, "purchase", ts("2024-01-01 10:10:00")),
    // user 2: click BEFORE the first view doesn't count; a later one does
    (2L, "click", ts("2024-01-01 09:00:00")),
    (2L, "view", ts("2024-01-01 10:00:00")),
    (2L, "click", ts("2024-01-01 11:00:00")),
    // user 3: view only
    (3L, "view", ts("2024-01-01 08:00:00")),
    // user 4: never views -> not in the funnel at all
    (4L, "purchase", ts("2024-01-01 08:00:00")),
    // user 5: click at EXACTLY the view instant is excluded (strict >)
    (5L, "view", ts("2024-01-01 12:00:00")),
    (5L, "click", ts("2024-01-01 12:00:00")))
    .toDF("user_id", "event_type", "ts")

  private lazy val out = Funnel.completion(events, "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"))
    .collect().map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4))).toMap

  test("completes steps strictly in order, earliest-after semantics") {
    assert(out(1L) === ((Some(us("2024-01-01 10:00:00")),
      Some(us("2024-01-01 10:05:00")), Some(us("2024-01-01 10:10:00")), 3)))
    assert(out(2L)._2 === Some(us("2024-01-01 11:00:00")),
      "pre-view click must not count; the post-view one must")
    assert(out(2L)._4 === 2)
  }

  test("broken funnels carry nulls and the right count; non-starters are absent") {
    assert(out(3L) === ((Some(us("2024-01-01 08:00:00")), None, None, 1)))
    assert(!out.contains(4L), "user who never did step 1 is not a funnel row")
  }

  test("simultaneous next-step events are excluded (strict >)") {
    assert(out(5L)._2 === None && out(5L)._4 === 1)
  }

  test("matches the staged-CTE shape on the real events fixture") {
    val got = Funnel.completion(tbl("events"), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
    // every row's times are strictly increasing where present
    val bad = got.filter(
      ($"t_2".isNotNull && $"t_2" <= $"t_1") ||
        ($"t_3".isNotNull && ($"t_2".isNull || $"t_3" <= $"t_2")))
    assert(bad.count() === 0)
    assert(got.count() > 0)
  }
}
