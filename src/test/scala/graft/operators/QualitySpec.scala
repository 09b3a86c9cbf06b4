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

  // round-6 advisory regression pin for the q107 shape: a non-reference doc
  // with <2 tokens must still come out of the composed chain (scoreDocs →
  // oov_permille → percentileBuckets) as an n_bigrams = 0 / NULL-permille /
  // NULL-bucket row — exactly what the DuckDB oracle's documents-LEFT-JOIN-
  // stats `rated` CTE emits — and must leave the tertile thresholds (which
  // both engines compute over non-NULL metrics only) untouched.
  test("q107 chain keeps zero-bigram docs as NULL-bucket rows (oracle shape)") {
    import graft.functions.{NgramLm, TextOps}
    val docs = Seq(
      (0L, "src0", "alpha beta gamma alpha beta delta epsilon zeta"),
      (1L, "src1", "alpha beta gamma delta"), // all bigrams in-model-ish
      (2L, "src1", "solo"), // ONE token: no bigrams
      (3L, "src1", "zz yy xx ww vv"), // all-OOV bigrams
      (4L, "src1", "alpha beta unknown1 unknown2"))
      .toDF("doc_id", "source", "text")
    val model = NgramLm.fit(docs.filter($"source" === "src0"),
      TextOps.tokens($"text"), cache = false)
    val scored = NgramLm.scoreDocs(docs.filter($"source" =!= "src0"),
        "doc_id", TextOps.tokens($"text"), model)
      .withColumn("oov_permille",
        when($"n_bigrams" > 0,
          expr("(n_oov * 1000) div n_bigrams").cast("int")))
    val out = Quality.percentileBuckets(scored, $"oov_permille", 3)
      .select($"doc_id", $"n_bigrams", $"oov_permille", $"bucket").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L),
      "every non-src0 doc must survive, bigrams or not")
    val solo = out(2L)
    assert(solo.getLong(1) == 0L && solo.isNullAt(2) && solo.isNullAt(3),
      s"zero-bigram doc must be (0, NULL, NULL), got $solo")
    // thresholds over the three non-NULL permilles only — the NULL row must
    // not shift them (Spark percentile and DuckDB quantile_cont both skip
    // NULLs): buckets of the non-NULL rows are a proper 0/1/2 spread.
    val buckets = Seq(1L, 3L, 4L).map(id => out(id).getInt(3)).sorted
    assert(buckets == Seq(0, 1, 2), s"expected tertile spread, got $buckets")
  }

  test("percentileCalibrate: per-group (rank-1)/(n-1), singles at 0, ties broken") {
    val df = Seq(
      ("web", 1L, 0.9), ("web", 2L, 0.1), ("web", 3L, 0.5), ("web", 4L, 0.5),
      ("book", 5L, 42.0)) // raw scales wildly different across groups
      .toDF("src", "id", "z")
    val out = Quality.percentileCalibrate(df, "src", $"z", Seq($"id"))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(out(2L) === 0.0 && out(1L) === 1.0)
    // tied z=0.5 split by id: ranks 2 and 3 of 4 -> 1/3 and 2/3
    assert(out(3L) === 1.0 / 3 && out(4L) === 2.0 / 3)
    assert(out(5L) === 0.0, "single-member group calibrates to 0")
  }

  test("filterLines drops failing lines and rebuilds docs in order") {
    val lines = Seq(
      (1L, 0, "good alpha line"), (1L, 1, "## 123 $$%"), (1L, 2, "more words here"),
      (2L, 0, "## 123 $$%"),
      (3L, 0, "ok line text")
    ).toDF("id", "pos", "line")
    val keep = (size(split(col("line"), " ")) >= 3) &&
      (length(regexp_replace(col("line"), "[^A-Za-z]", "")) * 2 >= length(col("line")))
    val out = Quality.filterLines(lines, "id", "pos", "line", keep)
      .orderBy($"id").as[(Long, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, "good alpha line\nmore words here", 2),
      (2L, "", 0), // every line failed: doc survives empty, gate decides
      (3L, "ok line text", 1)))
  }

  test("filterLines keeps original positions' order under shuffled input") {
    val lines = Seq((1L, 2, "c c c"), (1L, 0, "a a a"), (1L, 1, "b b b"))
      .toDF("id", "pos", "line").repartition(5)
    val out = Quality.filterLines(lines, "id", "pos", "line", lit(true))
      .collect().head
    assert(out.getString(1) == "a a a\nb b b\nc c c")
  }
}
