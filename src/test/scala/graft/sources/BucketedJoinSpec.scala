package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The point of bucketing is a plan property, so that's what we assert:
  * an equi-join of two tables bucketed on the join key runs with ZERO
  * exchanges, while the same join on plain parquet shuffles both sides.
  */
class BucketedJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange".r.findAllIn(
      df.queryExecution.executedPlan.toString).length

  private def orders = tbl("orders").select($"o_orderkey", $"o_custkey", $"o_totalprice")
  private def li = tbl("lineitem").select($"l_orderkey", $"l_quantity")

  /** Shared fixture: both tests read these catalog tables, so create them
    * once here — not inside the first test, which broke `testOnly -z` and
    * test reordering. */
  private lazy val bucketedTables: Unit = {
    BucketedTables.writeBucketed(orders, "orders_b", 4, "o_orderkey", Seq("o_orderkey"))
    BucketedTables.writeBucketed(li, "lineitem_b", 4, "l_orderkey", Seq("l_orderkey"))
  }

  test("join of co-bucketed tables has no exchange; plain parquet join shuffles") {
    bucketedTables
    // disable auto-broadcast so the join strategy question is real
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = BucketedTables.readBucketed(spark, "orders_b")
        .join(BucketedTables.readBucketed(spark, "lineitem_b"),
          $"o_orderkey" === $"l_orderkey")
      val plain = orders.join(li, $"o_orderkey" === $"l_orderkey")
      assert(exchanges(bucketed) == 0,
        s"bucketed join must not shuffle:\n${bucketed.queryExecution.executedPlan}")
      assert(exchanges(plain) >= 2, "plain join shuffles both sides")
      // and it still computes the same thing
      assert(bucketed.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("bucketed aggregation on the bucket key also skips the exchange") {
    bucketedTables
    val agg = BucketedTables.readBucketed(spark, "orders_b")
      .groupBy($"o_orderkey").agg(sum($"o_totalprice"))
    assert(exchanges(agg) == 0,
      s"groupBy on the bucket key must not shuffle:\n${agg.queryExecution.executedPlan}")
  }
}
