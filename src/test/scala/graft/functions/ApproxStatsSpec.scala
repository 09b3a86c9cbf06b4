package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ApproxStatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("approxProfile distinct counts land within the HLL++ error bound of exact") {
    val ev = tbl("events", sfDirMid)
    val approx = ApproxStats.approxProfile(ev, Seq("event_type"), "user_id", "value")
      .select($"event_type", $"approx_distinct_user_id")
      .as[(String, Long)].collect().toMap
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("d"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, d) =>
      val a = approx(k).toDouble
      // rsd 5%: allow 4 standard deviations before calling it broken
      assert(math.abs(a - d) / d < 0.20, s"$k: approx $a vs exact $d")
    }
  }

  test("approxProfile quantiles are within rank tolerance of exact percentiles") {
    val ev = tbl("events", sfDirMid)
    val approx = ApproxStats.approxProfile(ev, Seq("event_type"), "user_id", "value",
        quantiles = Seq(0.5), accuracy = 10000)
      .select($"event_type", element_at($"approx_q_value", 1))
      .as[(String, Double)].collect().toMap
    // GK sketch at accuracy a guarantees rank error <= n/a; check the
    // returned value sits between the exact 0.48 and 0.52 quantiles
    val bounds = ev.groupBy($"event_type")
      .agg(percentile($"value", lit(0.48)).as("lo"), percentile($"value", lit(0.52)).as("hi"))
      .as[(String, Double, Double)].collect()
    bounds.foreach { case (k, lo, hi) =>
      assert(approx(k) >= lo && approx(k) <= hi,
        s"$k: approx median ${approx(k)} outside exact [0.48, 0.52] band [$lo, $hi]")
    }
  }

  test("approxDistinctEach sketches several columns in one pass without Expand") {
    val ev = tbl("events", sfDirMid)
    val out = ApproxStats.approxDistinctEach(ev, Seq("user_id", "event_type", "event_id"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), s"one HLL per column must not Expand the input:\n$p")
    val row = out.head()
    // event_id is unique per row; HLL at 5% rsd on 10k values
    val n = ev.count().toDouble
    assert(math.abs(row.getLong(2) - n) / n < 0.20)
    assert(row.getLong(1) == 5L, "5 event types: tiny cardinalities are exact in HLL++")
  }
}
