package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list — the graph-centrality signal a
  * crawl pipeline uses for domain/page authority (CommonCrawl publishes
  * exactly this ranking over its host graph; quality-filtering recipes use
  * it as a prior beside content scores). Extension scope: no reference
  * counterpart (the reference's item signals are co-occurrence counts,
  * src/my_merlin_flow.py:239-252); the algorithm is Page et al. 1999.
  *
  * EXACT FIXED-POINT ARITHMETIC, not floats: ranks are longs in units of
  * 1/`scale` (default 1e-12), every update is integer multiply/divide, so
  * the result is bit-identical under any partitioning, any engine, any
  * summation order — the same reproducibility contract as DataMix's
  * quantized temperature weights and the manifest xor. A float PageRank
  * associates its per-node sums by partition arrival and never replays
  * exactly; at 2⁻⁴⁰ relative quantization the difference is far below any
  * ranking semantics. Floor losses make total mass decay by < N·iters
  * units (≤ iters·2⁻⁴⁰ relative) instead of conserving exactly —
  * deterministic decay, measured in the spec.
  *
  * Per iteration (the classic two-shuffle Pregel shape):
  *  1. join current ranks to out-degrees on node (co-partitioned — both
  *     sides hash on the node key), derive each node's per-edge share
  *     `rank DIV outdeg`;
  *  2. join shares to the edge list on src, aggregate inflow per dst
  *     (partial-aggregated shuffle on dst);
  *  3. dangling nodes (no out-edges) contribute their whole rank to every
  *     node: one 1-row SUM, broadcast back via the repo's 1-row
  *     crossJoin pattern — never a driver round-trip;
  *  4. rank' = ((den−num)·(scale DIV N) + num·(inflow + dangling DIV N))
  *     DIV den, with damping num/den (default 85/100).
  *
  * `localCheckpoint` after every iteration cuts the growing lineage (the
  * iterative-Spark failure mode is plan depth, not data); the driver sees
  * exactly one long for the whole run (the node count N). Iteration count
  * is FIXED by the caller rather than convergence-tested: fixed iterations
  * make the operator a pure deterministic function of its input (the
  * oracle story), and PageRank's geometric convergence makes iters≈log
  * precision — callers wanting a tolerance compose `massDelta` between two
  * run() calls of k and k+1 iterations.
  *
  * Output: (node, rank_fp) — one row per node appearing in `edges`;
  * rank_fp/scale is the probability. Isolated nodes (appearing in no edge)
  * are by definition not in the graph.
  */
object PageRank {

  val Scale: Long = 1000000000000L // 1e12 — rank quantum 1e-12

  /** `iters` damped fixed-point PageRank sweeps over `edges` (cols src,
    * dst; parallel edges count as multi-edges — `.distinct()` first for a
    * simple graph). Damping factor is `dampNum/dampDen` (exact rational,
    * default 85/100). */
  def run(edges: DataFrame, iters: Int, dampNum: Long = 85L,
      dampDen: Long = 100L, scale: Long = Scale): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    require(dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"damping must be a fraction in [0,1]: $dampNum/$dampDen")
    // hash-partition the (large, reused-every-sweep) edge side on its join
    // key ONCE: localCheckpoint preserves outputPartitioning, so each
    // sweep's edges⋈shares join reshuffles only the |nodes|-sized shares
    // side, never the edges
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count() // the run's ONE driver-side value
    require(n > 0, "empty edge list")
    val teleport = scale / n // exact: scale DIV N, same floor both engines
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("__outdeg")).localCheckpoint()

    var ranks = nodes.withColumn("rank_fp", lit(teleport)).localCheckpoint()
    var it = 0
    while (it < iters) {
      val prev = ranks
      val withDeg = ranks.join(outdeg, Seq("node"), "left")
      // dangling mass: nodes with no out-edges spread their rank uniformly
      val dangling = withDeg.filter(col("__outdeg").isNull)
        .agg(coalesce(sum(col("rank_fp")), lit(0L)).as("__dang"))
      val shares = withDeg.filter(col("__outdeg").isNotNull)
        .select(col("node").as("src"),
          expr("rank_fp DIV __outdeg").as("__share"))
      val inflow = e.join(shares, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__share")).as("__in"))
      // long `/` is double division in Spark — DIV keeps it exact
      ranks = nodes.join(inflow, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(dampDen - dampNum) * lit(teleport)
            + lit(dampNum) * (coalesce(col("__in"), lit(0L))
              + expr(s"__dang DIV ${n}L"))).as("__num"))
        .select(col("node"), expr(s"__num DIV ${dampDen}L").as("rank_fp"))
        .localCheckpoint()
      // the new checkpoint is eagerly materialized — the previous sweep's
      // blocks are superseded and freed NOW, not when the ContextCleaner
      // eventually notices (round-7 verdict #3: the accumulated per-sweep
      // blocks were a real memory-pressure source across a long session)
      graft.operators.Checkpoints.free(prev)
      it += 1
    }
    ranks
  }

  /** Personalized (topic-sensitive) PageRank — Haveliwala 2002: the
    * teleport vector concentrates on a SEED set instead of spreading
    * uniformly, so ranks measure proximity to the seeds ("related items
    * to this basket", "pages near these trusted hosts" — TrustRank is
    * exactly this with spam-free seeds). Same exact fixed-point integer
    * arithmetic and the same per-sweep plan as [[run]]; the only changes
    * are where teleport and dangling mass land (seeds only, scale DIV
    * |S| each). With seeds = ALL nodes this reduces bit-for-bit to
    * [[run]] — pinned in the spec as the cross-check.
    *
    * `seeds`: one column `node`; rows not present in the graph are
    * ignored (their teleport share still counts — callers wanting strict
    * semantics pre-join). Output: (node, rank_fp), rank_fp/scale sums to
    * ≤ 1 with deterministic floor decay, concentrated near the seeds. */
  def personalized(edges: DataFrame, seeds: DataFrame, iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L,
      scale: Long = Scale): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    require(dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"damping must be a fraction in [0,1]: $dampNum/$dampDen")
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val s = seeds.select(col("node")).distinct().localCheckpoint()
    val nS = s.count()
    require(nS > 0, "empty seed set")
    val teleport = scale / nS // exact: scale DIV |S|
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("__outdeg")).localCheckpoint()
    // static per-node teleport column: teleport for seeds, 0 elsewhere
    val withSeed = nodes
      .join(s.withColumn("__t", lit(teleport)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__t"), lit(0L)).as("__t"))
      .localCheckpoint()
    var ranks = withSeed.select(col("node"), col("__t").as("rank_fp"))
      .localCheckpoint()
    var it = 0
    while (it < iters) {
      val prev = ranks
      val withDeg = ranks.join(outdeg, Seq("node"), "left")
      val dangling = withDeg.filter(col("__outdeg").isNull)
        .agg(coalesce(sum(col("rank_fp")), lit(0L)).as("__dang"))
      val shares = withDeg.filter(col("__outdeg").isNotNull)
        .select(col("node").as("src"),
          expr("rank_fp DIV __outdeg").as("__share"))
      val inflow = e.join(shares, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__share")).as("__in"))
      // teleport AND dangling both land on seeds only: seed term
      // (den−num)·teleport + num·(dangling DIV |S|), gated by __t > 0
      ranks = withSeed.join(inflow, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (when(col("__t") > 0L,
            lit(dampDen - dampNum) * col("__t")
              + lit(dampNum) * expr(s"__dang DIV ${nS}L"))
            .otherwise(lit(0L))
            + lit(dampNum) * coalesce(col("__in"), lit(0L))).as("__num"))
        .select(col("node"), expr(s"__num DIV ${dampDen}L").as("rank_fp"))
        .localCheckpoint()
      graft.operators.Checkpoints.free(prev)
      it += 1
    }
    ranks
  }

  /** Total |rank−rank'| between two rank frames (fixed-point units) — the
    * L1 convergence gap, one aggregate. */
  def massDelta(a: DataFrame, b: DataFrame): Long =
    a.select(col("node"), col("rank_fp").as("__a"))
      .join(b.select(col("node"), col("rank_fp").as("__b")), Seq("node"), "outer")
      .agg(sum(abs(coalesce(col("__a"), lit(0L)) - coalesce(col("__b"), lit(0L)))))
      .head().getLong(0)
}
