package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The aggregate top-k (map-side k-bounded heap, functions.TopKAgg) must
  * produce EXACTLY the window form's rows for the same (score desc, id
  * asc) ordering — same survivors, same ranks — on ties, on Spark's
  * double total-order edge cases (NaN greatest, -0.0 < 0.0), and on any
  * input partitioning (partial/merge path). */
class TopKAggSpec extends SparkSpecBase {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) =
    Relational.topKPerGroup(df, Seq("g"), Seq(col("s").desc, col("id").asc), k)
      .select(col("g"), col("rk").cast("int").as("rk"), col("id"),
        col("s").cast("double").as("score"))
      .orderBy("g", "rk")

  private def aggForm(df: org.apache.spark.sql.DataFrame, k: Int) =
    Relational.topKPerGroupAgg(df, Seq("g"), col("s"), col("id"), k)
      .select(col("g"), col("rk"), col("id"), col("score"))
      .orderBy("g", "rk")

  test("equals the window top-k on deterministic md5 scores with duplicate-score ties") {
    val rows = for { g <- 1 to 7; i <- 1L to 200L } yield {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"tk|$g|$i".getBytes("UTF-8"))
      // coarse bucket -> plenty of exact score ties to exercise id-asc
      ((h(0) & 0x1f).toDouble, g, i)
    }
    val df = rows.toDF("s", "g", "id")
    for (k <- Seq(1, 3, 10, 250)) { // 250 > group size: keep-all path
      val w = windowForm(df, k).collect().toSeq
      val a = aggForm(df, k).collect().toSeq
      assert(a == w, s"k=$k mismatch")
    }
  }

  test("partitioning-invariant: repartitioned input merges to the identical result") {
    val rows = (1L to 5000L).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"tp|$i".getBytes("UTF-8"))
      (((h(0) & 0xff) * 256 + (h(1) & 0xff)).toDouble / 7.0, (i % 11).toInt, i)
    }
    val df = rows.toDF("s", "g", "id")
    val a = aggForm(df.repartition(17), 20).collect().toSeq
    val b = aggForm(df.coalesce(1), 20).collect().toSeq
    val w = windowForm(df, 20).collect().toSeq
    assert(a == b && a == w)
  }

  test("double total-order edges: NaN ranks above +Inf, -0.0 below +0.0, ids break all ties") {
    val df = Seq(
      (Double.NaN, 1, 10L), (Double.PositiveInfinity, 1, 11L),
      (0.0, 1, 12L), (-0.0, 1, 13L), (Double.NaN, 1, 9L),
      (Double.NegativeInfinity, 1, 14L), (5.0, 1, 15L)
    ).toDF("s", "g", "id")
    val a = aggForm(df, 4).collect().toSeq
    val w = windowForm(df, 4).collect().toSeq
    assert(a == w)
    // NaNs first (id asc), then +Inf, then 5.0
    assert(a.map(_.getLong(2)) == Seq(9L, 10L, 11L, 15L))
  }

  test("string ids: aggregate form equals the window form (graft_topk_str, round-11)") {
    // Categorify-string catalog shape: ids are strings whose BYTEWISE
    // order is exercised (prefixes, case, digits-vs-letters — lengths
    // differ so lexicographic != numeric), scores carry exact ties so
    // the id tie-break decides survivors.
    val rows = for { g <- 1 to 5; i <- 1L to 150L } yield {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ts|$g|$i".getBytes("UTF-8"))
      val id = (h(1) & 3) match {
        case 0 => s"sku-$i"
        case 1 => s"SKU$i"
        case 2 => i.toString
        case _ => s"sku-$i-x"
      }
      ((h(0) & 0x0f).toDouble, g, id)
    }
    val df = rows.toDF("s", "g", "id")
    for (k <- Seq(1, 5, 200)) {
      val w = Relational.topKPerGroup(df, Seq("g"),
          Seq(col("s").desc, col("id").asc), k)
        .select(col("g"), col("rk").cast("int").as("rk"), col("id"),
          col("s").cast("double").as("score"))
        .orderBy("g", "rk").collect().toSeq
      val a = Relational.topKPerGroupAgg(df, Seq("g"), col("s"), col("id"), k)
        .select(col("g"), col("rk"), col("id"), col("score"))
        .orderBy("g", "rk").collect().toSeq
      assert(a == w, s"string-id k=$k mismatch")
      // the dispatcher routes string ids to the same aggregate
      val b = Relational.topKPerGroupBest(
          df.select(col("g"), col("id"), col("s").cast("double").as("score")),
          Seq("g"), "score", "id", k)
        .select(col("g"), col("rk"), col("id"), col("score"))
        .orderBy("g", "rk").collect().toSeq
      assert(b == a, s"topKPerGroupBest string dispatch k=$k mismatch")
    }
    // partitioning invariance through the partial/merge (serialize) path
    val a17 = Relational.topKPerGroupAgg(df.repartition(17), Seq("g"),
        col("s"), col("id"), 10)
      .orderBy("g", "rk").collect().toSeq
    val a1 = Relational.topKPerGroupAgg(df.coalesce(1), Seq("g"),
        col("s"), col("id"), 10)
      .orderBy("g", "rk").collect().toSeq
    assert(a17 == a1)
    // the string form keeps the partial+final ObjectHashAggregate pair —
    // the exchange stays groups×k, same as the long heap
    val plan = Relational.topKPerGroupAgg(df, Seq("g"), col("s"), col("id"), 5)
      .queryExecution.executedPlan.toString
    val i = plan.indexOf("ObjectHashAggregate")
    assert(i >= 0 && plan.indexOf("ObjectHashAggregate", i + 1) > i,
      s"expected partial+final ObjectHashAggregate pair in:\n$plan")
    assert(plan.contains("graft_topk_str"))
  }

  test("topKPerGroupBest drops null score/id rows identically in BOTH forms (round-11 null contract)") {
    // group 1 has only 2 non-null candidates for k=3: both dispatch arms
    // must return the same 2 rows (the old window fallback ranked the
    // null rows NULLS LAST and emitted them)
    val longIds = Seq[(Integer, java.lang.Double, java.lang.Long)](
      (1, 2.0, 10L), (1, 1.0, 11L), (1, null, 12L), (1, 3.0, null),
      (2, 5.0, 20L), (2, 4.0, 21L), (2, 3.0, 22L), (2, 2.0, 23L))
      .toDF("g", "score", "id")
    val viaAgg = Relational.topKPerGroupBest(longIds, Seq("g"), "score", "id", 3)
      .orderBy("g", "rk").collect().toSeq
    // force the window arm with a non-dispatchable id type (decimal)
    val viaWin = Relational.topKPerGroupBest(
        longIds.select(col("g"), col("score"), col("id").cast("decimal(20,0)").as("id")),
        Seq("g"), "score", "id", 3)
      .select(col("g"), col("score"), col("id").cast("long").as("id"), col("rk"))
      .orderBy("g", "rk").collect().toSeq
    assert(viaAgg.map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))) ==
      viaWin.map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))))
    assert(viaAgg.count(_.getInt(0) == 1) == 2, "group 1 must emit only its 2 non-null rows")
  }

  test("shuffle volume is output-bounded: partial aggregation kicks in map-side") {
    // the plan must contain a partial ObjectHashAggregate BEFORE the
    // exchange — that is the entire point of the operator
    val df = (1L to 100L).map(i => (i.toDouble, (i % 3).toInt, i)).toDF("s", "g", "id")
    val plan = Relational.topKPerGroupAgg(df, Seq("g"), col("s"), col("id"), 5)
      .queryExecution.executedPlan.toString
    val aggIdx = plan.indexOf("ObjectHashAggregate")
    assert(aggIdx >= 0, s"expected ObjectHashAggregate in:\n$plan")
    assert(plan.indexOf("ObjectHashAggregate", aggIdx + 1) > aggIdx,
      s"expected partial+final aggregate pair in:\n$plan")
  }
}
