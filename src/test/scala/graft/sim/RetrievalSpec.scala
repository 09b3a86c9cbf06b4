package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** sim.Retrieval.topKDot — the fused serving primitive: row-parity with
  * the naive crossJoin+window plan, the seen-set contract, the budget
  * fallback seam, and the plan shape (no candidate materialization, and
  * the row-count repartition that defeats AQE's size-based coalescing —
  * the one-core trap of SCALE.md round 11). */
class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  // 40 queries x 120 catalog vectors, deterministic; a few ties by
  // construction (vectors repeat every 30 ids)
  private def vec(seed: Long, dim: Int): Seq[Float] =
    (0 until dim).map(i => (((seed * 31 + i * 7) % 13) - 6).toFloat)
  private lazy val queries =
    (1L to 40L).map(q => (q, vec(q, 8))).toDF("q_id", "qv")
  private lazy val catalog =
    (1L to 120L).map(c => (c, vec(c % 30, 8))).toDF("item_id", "cv")
  private lazy val seen =
    (for (q <- 1L to 40L; c <- 1L to 120L if (q + c) % 7 == 0)
      yield (q, c)).toDF("q_id", "item_id")

  private def naive(withSeen: Boolean) = {
    graft.sql.GraftFunctions.register(spark)
    val scored0 = queries.crossJoin(
        catalog.select($"item_id".as("c_id"), $"cv"))
      .select($"q_id", $"c_id",
        graft.sql.GraftFunctions.dotF32($"qv".cast("array<float>"),
          $"cv".cast("array<float>")).as("score"))
    val scored = if (withSeen)
      scored0.join(seen.select($"q_id", $"item_id".as("c_id")),
        Seq("q_id", "c_id"), "left_anti")
    else scored0
    graft.operators.Relational.topKPerGroup(scored, Seq("q_id"),
        Seq($"score".desc, $"c_id".asc), 5)
      .select($"q_id", $"rk".cast("int").as("rk"),
        $"c_id".as("item_id"), $"score")
  }

  test("row-identical to the naive crossJoin+window plan, with and without seen") {
    for (withSeen <- Seq(false, true)) {
      val fused = Retrieval.topKDot(queries, "q_id", "qv",
        catalog, "item_id", "cv", 5,
        seen = if (withSeen) Some(seen) else None).get
      val expected = naive(withSeen)
      assert(fused.exceptAll(expected).isEmpty
        && expected.exceptAll(fused).isEmpty,
        s"fused/naive diverge (withSeen=$withSeen)")
      assert(fused.count() == 40 * 5)
    }
  }

  test("catalog past the float budget returns None (the ANN handoff seam)") {
    assert(Retrieval.topKDot(queries, "q_id", "qv", catalog, "item_id",
      "cv", 5, catalogFloatLimit = 10L).isEmpty)
    assert(Retrieval.topKDot(queries, "q_id", "qv",
      catalog.filter(lit(false)), "item_id", "cv", 5).isEmpty)
    // a generous Long budget must not overflow the row cap into a refusal
    assert(Retrieval.topKDot(queries, "q_id", "qv", catalog, "item_id",
      "cv", 5, catalogFloatLimit = Long.MaxValue).nonEmpty)
  }

  test("plan: one fused Generate, no candidate join, and >1 scoring partition") {
    val fused = Retrieval.topKDot(queries, "q_id", "qv",
      catalog, "item_id", "cv", 3, seen = Some(seen)).get
    val physical = fused.queryExecution.executedPlan.toString
    assert(physical.contains("graft_topk_dot_f32"),
      "fused kernel missing from the physical plan")
    assert(!physical.contains("BroadcastNestedLoopJoin"),
      "candidate crossJoin leaked into the fused plan")
    // the row-count repartition must survive planning: with AQE's
    // size-based coalescing a ~KB query frame would fold to 1 partition
    // and run the whole scoring loop on one core
    assert(fused.rdd.getNumPartitions > 1,
      s"scoring stage collapsed to ${fused.rdd.getNumPartitions} partition(s)")
  }
}
