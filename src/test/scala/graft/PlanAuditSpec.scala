package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Executable plan audit: the physical-plan properties SCALE.md claims are
  * asserted here, so a regression fails the suite instead of silently
  * invalidating the docs. String-matching the executed plan is acceptable
  * because build.sbt pins Spark 4.1.2.
  */
class PlanAuditSpec extends SparkSpecBase {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan (q01)") {
    val p = plan(graft.queries.StarQueries.defs("q01_pricing_summary")(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      s"missing pushed filter:\n$p")
  }

  test("column pruning: q03 lineitem scan reads only the 3 needed columns") {
    val p = plan(graft.queries.StarQueries.defs("q03_join3_revenue")(spark, sfDir))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"),
      s"lineitem scan not pruned:\n$p")
  }

  test("dimension joins broadcast (q03)") {
    val p = plan(graft.queries.StarQueries.defs("q03_join3_revenue")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("top-k per group uses WindowGroupLimit, not a full sort of non-winners") {
    val p = plan(graft.queries.StarQueries.defs("q07_topk_per_group")(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), s"missing WindowGroupLimit:\n$p")
  }

  test("recommend: the wide candidate stream crosses exactly one exchange") {
    import graft.rank._
    val (tr, _) = Interactions.splitByTime(Interactions.fromStar(spark, sfDir), "2000-01-01")
    val p = plan(Cooccur.recommend(tr, Cooccur.itemNeighbors(tr, 20), 10))
    // every deliberate wide exchange is a REPARTITION_BY_COL marker (the
    // same subplan prints once per join side pre-AQE, so bound, don't pin)
    val markers = "REPARTITION_BY_COL".r.findAllIn(p).count(_ => true)
    assert(markers >= 2 && markers <= 5, s"unexpected repartition count $markers:\n$p")
    // the load-bearing property: no anti-join-style exchange on
    // (user_id, item_b) between the score aggregation and the window
    assert(!"hashpartitioning\\(user_id#\\d+L?, item_b".r.findFirstIn(p).isDefined,
      s"anti-join-style (user_id, item_b) exchange crept back in:\n$p")
  }

  test("blockedNearDup: the corpus crosses one reused (block, sub) exchange") {
    val emb = tbl("embeddings")
    val df = graft.sim.BlockedNearDup.pairs(emb, "vec_id", "embedding", "label",
      maxBlock = 16, threshold = 0.3, dim = 64)
    // AQE's pre-execution plan prints both sides unreused (reuse happens at
    // stage materialization); disable it to audit the static rule
    val p = withSQLConf("spark.sql.adaptive.enabled" -> "false")(plan(df))
    // both self-join sides hang off the SAME repartition lineage — the
    // second side must be a ReusedExchange, not a second full-width shuffle
    assert(p.contains("ReusedExchange"), s"self-join sides don't share the exchange:\n$p")
    // the deliberate wide exchange is on (label, __sub) — hot blocks spread
    // across tasks; a block-only partitioning would serialize a hot block
    assert("hashpartitioning\\(label#\\d+, __sub".r.findFirstIn(p).isDefined,
      s"missing (label, __sub) repartition:\n$p")
    // block-size side is broadcast, not shuffled back into the corpus
    assert(p.contains("BroadcastHashJoin"), s"sizes join not broadcast:\n$p")
  }

  test("lshTopK (probes=0) has no aggregation between scoring and the top-k window") {
    val emb = tbl("embeddings")
    val p = plan(graft.sim.Knn.lshTopK(emb, "vec_id", "embedding",
      dim = 64, bits = 4, k = 5, tables = 4))
    assert(p.contains("WindowGroupLimit"), s"missing WindowGroupLimit:\n$p")
    assert(!p.contains("HashAggregate(keys=[query_id"),
      s"pair-dedup aggregation crept back in:\n$p")
  }
}
