package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class AbTestSpec extends SparkSpecBase {
  import spark.implicits._

  test("assignment is deterministic, salt-sensitive, and roughly balanced") {
    val users = spark.range(1000L).toDF("u")
    val a1 = users.select(AbTest.arm(col("u"), "exp1").as("a")).collect().map(_.getInt(0))
    val a2 = users.select(AbTest.arm(col("u"), "exp1").as("a")).collect().map(_.getInt(0))
    val b = users.select(AbTest.arm(col("u"), "exp2").as("a")).collect().map(_.getInt(0))
    assert(a1.toSeq == a2.toSeq, "same salt => same assignment")
    assert(a1.toSeq != b.toSeq, "different salt => different assignment")
    val share = a1.count(_ == 1).toDouble / a1.length
    assert(share > 0.4 && share < 0.6, s"arm-1 share $share")
  }

  test("a unit converts if ANY of its rows satisfies the predicate") {
    val ev = Seq(
      (1L, "purchase", 10.0), (1L, "purchase", 300.0), // converts
      (2L, "purchase", 10.0),                          // does not
      (3L, "view", 500.0)                              // wrong type
    ).toDF("user_id", "event_type", "value")
    val r = AbTest.report(ev, "user_id",
      col("event_type") === "purchase" && col("value") >= 195.0, "s").collect().head
    val (n0, c0, n1, c1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n0 + n1 == 3L && c0 + c1 == 1L)
  }

  test("z matches a driver-side computation on hand counts") {
    // force known counts by choosing units whose arms we read back first
    val ev = tbl("events")
    val r = AbTest.report(ev, "user_id",
      col("event_type") === "purchase" && col("value") >= 195.0, "exp1")
      .collect().head
    val (n0, c0, n1, c1) =
      (r.getLong(0).toDouble, r.getLong(1).toDouble, r.getLong(2).toDouble, r.getLong(3).toDouble)
    val (p0, p1) = (c0 / n0, c1 / n1)
    val p = (c0 + c1) / (n0 + n1)
    val z = (p1 - p0) / math.sqrt((p * (1.0 - p)) * (1.0 / n0 + 1.0 / n1))
    assert(r.getDouble(4) == p0 && r.getDouble(5) == p1)
    assert(r.getDouble(6) == p1 - p0)
    assert(r.getDouble(7) == z, s"z ${r.getDouble(7)} != $z")
  }

  test("null-safe: units exist in both arms on the real fixture") {
    val r = AbTest.report(tbl("events"), "user_id", col("event_type") === "purchase", "exp1")
      .collect().head
    assert(r.getLong(0) > 0 && r.getLong(2) > 0)
  }
}
