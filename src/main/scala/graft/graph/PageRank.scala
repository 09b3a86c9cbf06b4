package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

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

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Collect the multi-edge list grouped by dst (in-adjacency, with
    * multiplicity) under an edge budget — probed with a distributed
    * aggregate BEFORE any driver collect, the walksFused convention.
    * Returns (inAdj, outdeg, nodeType) or None past the budget / for
    * non-integral id types. */
  private def collectGraph(edges: DataFrame, maxEdges: Long):
      Option[(java.util.HashMap[Long, Array[Long]],
        java.util.HashMap[Long, Long], DataType)] = {
    val srcT = edges.schema("src").dataType
    val dstT = edges.schema("dst").dataType
    if (!integral(srcT) || srcT != dstT || maxEdges <= 0) return None
    val grouped = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .groupBy(col("v"))
      .agg(collect_list(col("u")).as("ins"), count(lit(1)).as("cnt"))
      .localCheckpoint()
    val probe = grouped.agg(coalesce(sum(size(col("ins"))), lit(0L)),
      coalesce(sum(col("cnt")), lit(0L)),
      coalesce(sum(when(col("v").isNull, 1L).otherwise(0L)), lit(0L))).head()
    val m = probe.getLong(0)
    // null endpoints (collect_list would silently drop a null src; a null
    // dst is a degenerate group) keep run()'s exact — if odd — semantics
    // by refusing the fused form entirely
    if (m == 0L || m > maxEdges || m != probe.getLong(1)
        || probe.getLong(2) != 0L) {
      graft.operators.Checkpoints.free(grouped)
      return None
    }
    val rows = grouped.collect()
    graft.operators.Checkpoints.free(grouped)
    val inAdj = new java.util.HashMap[Long, Array[Long]](rows.length * 2)
    val outdeg = new java.util.HashMap[Long, Long](rows.length * 4)
    rows.foreach { r =>
      val v = r.getLong(0)
      val ins = r.getSeq[Long](1).toArray
      inAdj.put(v, ins)
      ins.foreach(u => outdeg.merge(u, 1L, (a, b) => a + b))
    }
    Some((inAdj, outdeg, srcT))
  }

  /** The exact damped sweep over driver-held maps — bit-identical longs to
    * [[run]]'s per-iteration plan (floor divisions on non-negative longs,
    * addition exact and order-free). */
  private def sweep(inAdj: java.util.HashMap[Long, Array[Long]],
      outdeg: java.util.HashMap[Long, Long],
      ranks: java.util.HashMap[Long, Long], iters: Int,
      teleportOf: Long => Long, seedCount: Long, uniform: Boolean,
      dampNum: Long, dampDen: Long, n: Long): Unit = {
    var it = 0
    while (it < iters) {
      var dang = 0L
      ranks.forEach((node, r) => if (!outdeg.containsKey(node)) dang += r)
      val prev = new java.util.HashMap[Long, Long](ranks)
      ranks.replaceAll { (node, _) =>
        var in = 0L
        val ins = inAdj.get(node)
        if (ins != null) {
          var i = 0
          while (i < ins.length) {
            in += prev.get(ins(i)) / outdeg.get(ins(i)); i += 1
          }
        }
        val num =
          if (uniform)
            (dampDen - dampNum) * teleportOf(node) +
              dampNum * (in + dang / n)
          else {
            val t = teleportOf(node)
            (if (t > 0L) (dampDen - dampNum) * t + dampNum * (dang / seedCount)
             else 0L) + dampNum * in
          }
        num / dampDen
      }
      it += 1
    }
  }

  /** Budget-fused [[run]]: when the multi-edge list fits `maxEdges`, the
    * graph is a BOUNDED ARTIFACT (the IVF-index/codebook collect class) —
    * the whole damped iteration is iters·O(m) exact long arithmetic, the
    * same order of work as one collect of the graph, so the per-sweep
    * join+checkpoint scaffolding (which dominated the wall ~100×) is pure
    * overhead at this size. Probed distributed-first; bit-identical ranks
    * (spec-pinned); None past the budget or for non-integral ids — the
    * 100 TB plan stays [[run]]'s shuffled sweeps. */
  def runFused(edges: DataFrame, iters: Int, dampNum: Long = 85L,
      dampDen: Long = 100L, scale: Long = Scale,
      maxEdges: Long = 4000000L): Option[DataFrame] = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    require(dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"damping must be a fraction in [0,1]: $dampNum/$dampDen")
    collectGraph(edges, maxEdges).map { case (inAdj, outdeg, nodeT) =>
      val spark = edges.sparkSession
      import spark.implicits._
      val ranks = new java.util.HashMap[Long, Long]()
      inAdj.forEach((v, _) => ranks.put(v, 0L))
      outdeg.forEach((u, _) => ranks.put(u, 0L))
      val n = ranks.size.toLong
      val teleport = scale / n
      ranks.replaceAll((_, _) => teleport)
      sweep(inAdj, outdeg, ranks, iters, _ => teleport, n, uniform = true,
        dampNum, dampDen, n)
      val b = Seq.newBuilder[(Long, Long)]
      ranks.forEach((node, r) => b += ((node, r)))
      spark.createDataset(b.result()).toDF("node", "rank_fp")
        .select(col("node").cast(nodeT).as("node"), col("rank_fp"))
    }
  }

  /** Budget dispatcher for [[run]]. */
  def runAuto(edges: DataFrame, iters: Int, dampNum: Long = 85L,
      dampDen: Long = 100L, scale: Long = Scale,
      maxEdges: Long = 4000000L): DataFrame =
    runFused(edges, iters, dampNum, dampDen, scale, maxEdges)
      .getOrElse(run(edges, iters, dampNum, dampDen, scale))

  /** Budget-fused [[personalized]] — same seam, seed-concentrated
    * teleport/dangling. The seed set rides the same budget (it is at most
    * node-sized in any sane call; a seed frame the driver cannot hold
    * falls back). Seeds absent from the graph still count toward |S|
    * (exactly [[personalized]]'s semantics). */
  def personalizedFused(edges: DataFrame, seeds: DataFrame, iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L, scale: Long = Scale,
      maxEdges: Long = 4000000L): Option[DataFrame] = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    require(dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"damping must be a fraction in [0,1]: $dampNum/$dampDen")
    val seedT = seeds.schema("node").dataType
    if (!integral(seedT)) return None
    collectGraph(edges, maxEdges).flatMap { case (inAdj, outdeg, nodeT) =>
      val spark = edges.sparkSession
      import spark.implicits._
      val sDistinct = seeds.select(col("node").cast("long").as("node")).distinct()
      val nS = sDistinct.limit((math.min(maxEdges, (Int.MaxValue - 2).toLong)
        .toInt) + 1).count()
      if (nS == 0L || nS > maxEdges) None
      else {
        // |S| counts every distinct seed row, including a null (which can
        // never match a graph node) — exactly personalized()'s s.count()
        val seedRows = sDistinct.collect()
        val seedSet = new java.util.HashSet[Long]()
        seedRows.foreach(r => if (!r.isNullAt(0)) seedSet.add(r.getLong(0)))
        val teleport = scale / seedRows.length
        val ranks = new java.util.HashMap[Long, Long]()
        inAdj.forEach((v, _) => ranks.put(v, 0L))
        outdeg.forEach((u, _) => ranks.put(u, 0L))
        ranks.replaceAll((node, _) => if (seedSet.contains(node)) teleport else 0L)
        sweep(inAdj, outdeg, ranks, iters,
          node => if (seedSet.contains(node)) teleport else 0L,
          seedRows.length.toLong, uniform = false, dampNum, dampDen,
          ranks.size.toLong)
        val b = Seq.newBuilder[(Long, Long)]
        ranks.forEach((node, r) => b += ((node, r)))
        Some(spark.createDataset(b.result()).toDF("node", "rank_fp")
          .select(col("node").cast(nodeT).as("node"), col("rank_fp")))
      }
    }
  }

  /** Budget dispatcher for [[personalized]]. */
  def personalizedAuto(edges: DataFrame, seeds: DataFrame, iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L, scale: Long = Scale,
      maxEdges: Long = 4000000L): DataFrame =
    personalizedFused(edges, seeds, iters, dampNum, dampDen, scale, maxEdges)
      .getOrElse(personalized(edges, seeds, iters, dampNum, dampDen, scale))

  /** Total |rank−rank'| between two rank frames (fixed-point units) — the
    * L1 convergence gap, one aggregate. */
  def massDelta(a: DataFrame, b: DataFrame): Long =
    a.select(col("node"), col("rank_fp").as("__a"))
      .join(b.select(col("node"), col("rank_fp").as("__b")), Seq("node"), "outer")
      .agg(sum(abs(coalesce(col("__a"), lit(0L)) - coalesce(col("__b"), lit(0L)))))
      .head().getLong(0)
}
