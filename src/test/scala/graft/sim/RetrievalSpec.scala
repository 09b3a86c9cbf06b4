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

  test("null catalog ids / vectors are filtered, not NPE'd (round-12 advice)") {
    val dirty = catalog.select($"item_id", $"cv")
      .unionByName(catalog.limit(1)
        .select(lit(200L).as("item_id"),
          lit(null).cast("array<float>").as("cv")))
      .unionByName(catalog.limit(1)
        .select(lit(null).cast("long").as("item_id"), $"cv"))
    val fused = Retrieval.topKDot(queries, "q_id", "qv",
      dirty, "item_id", "cv", 5).get
    val clean = Retrieval.topKDot(queries, "q_id", "qv",
      catalog, "item_id", "cv", 5).get
    assert(fused.exceptAll(clean).isEmpty && clean.exceptAll(fused).isEmpty,
      "null catalog rows changed the result instead of being dropped")
  }

  test("CatalogCache collects once per model generation and re-collects on hot-swap") {
    val gen1 = catalog
    val gen2 = catalog.limit(60)
    var current = gen1
    val cache = new Retrieval.CatalogCache(() => current, "item_id", "cv")
    val b1 = cache.get().get
    val b2 = cache.get().get
    val b3 = cache.get().get
    assert(cache.collects == 1, s"stable model re-collected (${cache.collects})")
    assert((b1 eq b2) && (b2 eq b3), "stable model handed out a new broadcast")
    current = gen2 // hot-swap: the supplier returns a NEW frame
    val b4 = cache.get().get
    assert(cache.collects == 2, "hot-swap did not re-collect")
    assert(!(b4 eq b1) && b4.value.n == 60)
  }

  // --- the ANN-served leg (round-11 verdict task 2) --------------------

  private def centroidsFor(nlist: Int) =
    Ivf.fitCentroids(catalog, "item_id", "cv", nlist, iters = 2)

  test("CellCatalogCache publishes once per index generation; None past budget") {
    val cents = centroidsFor(4)
    val gen1 = Retrieval.annIndex(catalog, "item_id", "cv", cents)
    val gen2 = Retrieval.annIndex(catalog.limit(60), "item_id", "cv", cents)
    var current = gen1
    val cache = new Retrieval.CellCatalogCache(() => current, "item_id",
      "cv", () => cents)
    val b1 = cache.get().get
    val b2 = cache.get().get
    assert(cache.collects == 1 && (b1 eq b2),
      s"stable index re-published (${cache.collects})")
    current = gen2
    val b3 = cache.get().get
    assert(cache.collects == 2 && !(b3 eq b1) && b3.value.ids.length == 60)
    // a generation past the budget parks the cache at None (the stream
    // falls back to the join plan) without re-collecting per call
    val tiny = new Retrieval.CellCatalogCache(() => gen1, "item_id", "cv",
      () => cents, indexFloatLimit = 10L)
    assert(tiny.get().isEmpty && tiny.get().isEmpty && tiny.collects == 1)
  }

  test("fused IVF kernel is row-identical to the join plan, with plan shapes pinned") {
    val cents = centroidsFor(6)
    val index = Retrieval.annIndex(catalog, "item_id", "cv", cents)
    for (sn <- Seq(None, Some(seen)); np <- Seq(2, 6)) {
      val fused = Retrieval.topKAnn(queries, "q_id", "qv", index, "item_id",
        "cv", cents, k = 4, nprobe = np, seen = sn)
      val joined = Retrieval.topKAnn(queries, "q_id", "qv", index, "item_id",
        "cv", cents, k = 4, nprobe = np, seen = sn,
        fusedIndexFloatLimit = 0L)
      assert(fused.exceptAll(joined).isEmpty && joined.exceptAll(fused).isEmpty,
        s"fused/join ANN plans diverge (seen=${sn.isDefined}, nprobe=$np)")
    }
    val fusedPlan = Retrieval.topKAnn(queries, "q_id", "qv", index, "item_id",
        "cv", cents, k = 4, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(fusedPlan.contains("graft_topk_dot_ivf_f32"),
      s"fused IVF kernel missing:\n$fusedPlan")
    assert(!fusedPlan.contains("BroadcastHashJoin") || !fusedPlan.contains("cid"),
      s"candidate cid join leaked into the fused plan:\n$fusedPlan")
    val joinPlan = Retrieval.topKAnn(queries, "q_id", "qv", index, "item_id",
        "cv", cents, k = 4, nprobe = 2, fusedIndexFloatLimit = 0L)
      .queryExecution.executedPlan.toString
    assert(!joinPlan.contains("graft_topk_dot_ivf_f32")
      && joinPlan.contains("graft_topk"),
      s"expected the probe-join + heap plan past the budget:\n$joinPlan")
  }

  test("topKAnn with nprobe = nlist reproduces the dense kernel's rows exactly") {
    val cents = centroidsFor(4)
    val index = Retrieval.annIndex(catalog, "item_id", "cv", cents)
    val ann = Retrieval.topKAnn(queries, "q_id", "qv", index, "item_id",
      "cv", cents, k = 5, nprobe = 4, seen = Some(seen))
    val dense = Retrieval.topKDot(queries, "q_id", "qv",
      catalog, "item_id", "cv", 5, seen = Some(seen)).get
    assert(ann.exceptAll(dense).isEmpty && dense.exceptAll(ann).isEmpty,
      "full-probe ANN diverged from the exact kernel")
  }

  test("topKAnn at nprobe < nlist holds a recall floor vs the exact kernel") {
    val cents = centroidsFor(8)
    val index = Retrieval.annIndex(catalog, "item_id", "cv", cents)
    val ann = Retrieval.topKAnn(queries, "q_id", "qv", index, "item_id",
        "cv", cents, k = 5, nprobe = 4)
      .select($"q_id", $"item_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = Retrieval.topKDot(queries, "q_id", "qv",
        catalog, "item_id", "cv", 5).get
      .select($"q_id", $"item_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = exact.map { case (q, ids) =>
      ids.intersect(ann.getOrElse(q, Set.empty)).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, f"recall@5 vs exact = $mean%.2f < 0.5 at nprobe=nlist/2")
  }

  test("topKAnnPq reranks exactly: returned scores equal full-width dots") {
    val model = IvfPq.fit(catalog, "item_id", "cv", nlist = 4, m = 4, k = 16,
      iters = 2)
    val encoded = IvfPq.index(catalog, "item_id", "cv", model)
    val out = Retrieval.topKAnnPq(queries, "q_id", "qv", encoded, "item_id",
      model, catalog, "cv", k = 3, nprobe = 4, overfetch = 4,
      seen = Some(seen))
    // every returned score must be the EXACT dot of the full-width pair —
    // quantization may pick the longlist but never the emitted score
    graft.sql.GraftFunctions.register(spark)
    val joined = out
      .join(queries.select($"q_id", $"qv"), Seq("q_id"))
      .join(catalog.select($"item_id", $"cv"), Seq("item_id"))
      .select($"score",
        graft.sql.GraftFunctions.dotF32($"qv".cast("array<float>"),
          $"cv".cast("array<float>")).as("exact"))
      .collect()
    assert(joined.nonEmpty && joined.forall(r => r.getDouble(0) == r.getDouble(1)),
      "an ADC score leaked into the reranked output")
    // seen exclusion holds through the coded path
    val viol = out.join(seen, Seq("q_id", "item_id"), "left_semi").count()
    assert(viol == 0, s"$viol seen pairs in the ANN output")
    // and the reranked set holds a recall floor vs exact
    val annSets = out.select($"q_id", $"item_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = Retrieval.topKDot(queries, "q_id", "qv",
        catalog, "item_id", "cv", 3, seen = Some(seen)).get
      .select($"q_id", $"item_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = exact.map { case (q, ids) =>
      ids.intersect(annSets.getOrElse(q, Set.empty)).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, f"IVFADC recall@3 vs exact = $mean%.2f < 0.5")
  }
}
