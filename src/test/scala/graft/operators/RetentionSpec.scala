package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RetentionSpec extends SparkSpecBase {
  import spark.implicits._

  private val day = 86400000000L

  test("cohorts by first-seen period; offsets count distinct active users") {
    // u1 first day 0, active days 0,1,3; u2 first day 0, active day 0 only;
    // u3 first day 1, active days 1,2
    val ev = Seq(
      (1L, 0L * day), (1L, 0L * day + 5L), (1L, 1L * day), (1L, 3L * day),
      (2L, 0L * day),
      (3L, 1L * day), (3L, 2L * day)
    ).toDF("user_id", "ts_us")
    val m = Retention.matrix(ev, "user_id", "ts_us", day)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(m((0L, 0L)) == (2L, 2L, 1.0))       // cohort day-0: u1, u2
    assert(m((0L, 1L)) == (1L, 2L, 0.5))       // only u1 returns day 1
    assert(m((0L, 3L)) == (1L, 2L, 0.5))
    assert(m((1L, 0L)) == (1L, 1L, 1.0))       // cohort day-1: u3
    assert(m((1L, 1L)) == (1L, 1L, 1.0))
    assert(m.size == 5)
  }

  test("same-period repeat events count a user once per cell") {
    val ev = Seq((1L, 0L), (1L, 100L), (1L, 200L)).toDF("user_id", "ts_us")
    val rows = Retention.matrix(ev, "user_id", "ts_us", day).collect()
    assert(rows.length == 1 && rows.head.getLong(2) == 1L)
  }

  test("plan: event-volume data crosses exactly two hash exchanges") {
    // AQE off so the shared user-repartition prints as ONE Exchange + a
    // ReusedExchange (the initial adaptive plan prints the shared subtree
    // twice and double-counts it)
    withSQLConf("spark.sql.adaptive.enabled" -> "false") {
      val ev = tbl("events").select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      val p = Retention.matrix(ev, "user_id", "ts_us", day)
        .queryExecution.executedPlan.toString
      // user repartition + (cohort,offset) agg + the matrix-sized cohort
      // window = 3 real exchanges, but only the first two see event-volume
      // rows (a ReusedExchange line quotes its target's descriptor, so
      // subtract those mentions from the raw match count)
      val n = "Exchange hashpartitioning".r.findAllIn(p).length -
        "ReusedExchange".r.findAllIn(p).length
      assert(n == 3, s"expected 3 hash exchanges (2 event-volume + 1 matrix-sized):\n$p")
      assert(p.contains("ReusedExchange"),
        s"first-seen and join must share the user repartition:\n$p")
      // the (cohort, offset, user) distinct must ride the user clustering,
      // not add its own exchange
      assert("Exchange hashpartitioning\\(cohort_period#\\d+L, offset#\\d+L, __u".r
        .findAllIn(p).isEmpty, s"distinct added its own exchange:\n$p")
    }
  }
}
