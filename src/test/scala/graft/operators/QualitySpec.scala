package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpecBase {
  import spark.implicits._

  private def staged = Seq(
    (Some(1L), "BUILDING", 10.0),
    (Some(1L), "BUILDING", 10.0), // duplicate key
    (Some(2L), "AUTO", 99.0),
    (None, "AUTO", 5.0), // null key
    (None, "AUTO", 6.0), // second null key: must NOT count as a unique violation
    (Some(3L), "WEIRD", 1e9)) // bad segment + out of range
    .toDF("k", "seg", "bal")

  private val checks = Seq(
    Quality.notNull("k"),
    Quality.accepted("seg", Seq("BUILDING", "AUTO")),
    Quality.inRange("bal", 0.0, 1000.0))

  test("quarantine splits clean rows from annotated violations") {
    val (good, bad) = Quality.quarantine(staged, checks, Seq(Seq("k")))
    assert(good.as[(Option[Long], String, Double)].collect().toSet ==
      Set((Some(2L), "AUTO", 99.0)))
    val failures = bad.select($"k", $"failures").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Long]) -> r.getString(1)).toMap
    assert(failures(Some(1L)) == "unique_k")
    assert(failures(None) == "not_null_k",
      "null keys fail notNull only — dbt's unique test ignores them")
    assert(failures(Some(3L)) == "accepted_seg,range_bal")
  }

  test("null values pass range/accepted checks (dbt convention) — notNull rejects them") {
    val df = Seq((Some(1L), Option.empty[Double]), (Some(2L), Some(5.0)))
      .toDF("k", "bal")
    val a = Quality.audit(df, Seq(Quality.inRange("bal", 0, 10)))
    assert(a.filter($"failures" =!= "").isEmpty,
      "a null bal must not fail the range check")
    val b = Quality.audit(df, Seq(Quality.notNull("bal")))
    assert(b.filter($"failures" =!= "").count() == 1)
  }

  test("summary reports per-check violation counts like a dbt test run") {
    val s = Quality.summary(staged, checks, Seq(Seq("k")))
      .as[(String, Long)].collect().toMap
    assert(s == Map("unique_k" -> 2L, "not_null_k" -> 2L,
      "accepted_seg" -> 1L, "range_bal" -> 1L))
  }

  test("uniqueness detection is partitioning-invariant") {
    val many = spark.range(1000).select(($"id" % 500).as("k"))
    val a = Quality.audit(many.repartition(13), Nil, Seq(Seq("k")))
    assert(a.filter($"failures" === "").isEmpty,
      "every key appears twice — all rows must fail uniqueness")
  }

  test("trimOutliers keeps exactly the inside-quantile band") {
    val rows = spark.range(1, 101).select($"id".as("v")) // 1..100
    val kept = Quality.trimOutliers(rows, $"v", 0.1, 0.9)
      .as[Long].collect().sorted.toSeq
    // exact percentiles of 1..100: p10 = 10.9, p90 = 90.1
    assert(kept == (11L to 90L))
    intercept[IllegalArgumentException] {
      Quality.trimOutliers(rows, $"v", 0.9, 0.1)
    }
  }

  test("percentileBuckets assigns balanced tertiles with no corpus sort") {
    val rows = spark.range(1, 10).select($"id".as("v")) // 1..9
    val out = Quality.percentileBuckets(rows, $"v", 3)
    val got = out.select($"v", $"bucket").as[(Long, Int)].collect().toMap
    // tertile thresholds of 1..9: q(1/3) = 3.6666…, q(2/3) = 6.3333…
    assert((1L to 3L).forall(got(_) == 0))
    assert((4L to 6L).forall(got(_) == 1))
    assert((7L to 9L).forall(got(_) == 2))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Sort "),
      s"bucketing must be a comparison battery, not a corpus sort:\n$plan")
  }

  test("percentileBuckets: null metrics get null buckets, thresholds unaffected") {
    val rows = Seq(Some(1L), None, Some(2L), Some(3L)).toDF("v")
    val out = Quality.percentileBuckets(rows, $"v", 2)
      .select($"v", $"bucket").collect()
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(1), "null metric must give null bucket")
    // median of {1,2,3} = 2: 3 is above, 1 and 2 at/below
    val byV = out.filterNot(_.isNullAt(0)).map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byV == Map(1L -> 0, 2L -> 0, 3L -> 1))
    intercept[IllegalArgumentException] { Quality.percentileBuckets(rows, $"v", 1) }
  }
}
