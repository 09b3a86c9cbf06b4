package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Exact triangle counting + local clustering coefficients over an
  * undirected graph — the degree-ordered orientation algorithm (the
  * MapReduce classic, Suri & Vassilvitskii 2011 / Cohen 2009): orient
  * every edge from its lower-(degree, id) endpoint to the higher, build
  * wedges only from each node's ORIENTED out-neighbors, and close them
  * against oriented edges. Every triangle is counted exactly once — at
  * its lowest-ranked vertex — and the orientation bounds out-degrees by
  * O(√m), so the wedge space is O(m^1.5) no matter how skewed the raw
  * degree distribution is (a celebrity node of degree 10⁷ contributes
  * ZERO wedges from its own adjacency: every triangle through it is
  * charged to a smaller endpoint). That bound is what makes the count
  * feasible at 100 TB; the naive wedge join is Σ deg² and dies on the
  * first hub.
  *
  * Two plans behind one budget seam (the serving-ladder convention):
  *  - FUSED (graph fits the edge budget): the oriented adjacency is built
  *    driver-side from ONE map-side-deduped shuffle, broadcast, and each
  *    apex's wedges close as sorted-array intersections inside a
  *    mapPartitions loop — the O(m^1.5) wedge set NEVER materializes as
  *    rows (the TopKDotF32 lesson: a materialized candidate row costs
  *    ~25× the arithmetic it carries). Same counts, bit-for-bit.
  *  - COMPOSED (past the budget, or non-integral node ids): canonicalize
  *    (distinct min/max pairs, self-loops dropped) → degree table →
  *    orient → one self-join on the wedge apex (the two sides share the
  *    exchange) → one closing join against the oriented edges — itself
  *    broadcast under the budget so the wedge rows at least close
  *    map-side — → explode corners → per-node count.
  * All counts exact longs; the coefficient is one guarded IEEE division.
  */
object Triangles {

  private def lexLess(d1: Column, n1: Column, d2: Column, n2: Column): Column =
    d1 < d2 || (d1 === d2 && n1 < n2)

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Per-node triangle participation and local clustering coefficient.
    * Input edges may be directed/duplicated/self-looped — canonicalized
    * here. Output: (node, degree, triangles, coeff) with
    * coeff = 2·triangles / (degree·(degree−1)), NULL below degree 2.
    * Dispatches fused ↔ composed on `edgeLimit` (distinct undirected
    * edges; default 8M ≈ a couple hundred MB of broadcast adjacency). */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String,
      edgeLimit: Long = 8000000L): DataFrame =
    perNodeFused(edges, srcCol, dstCol, edgeLimit)
      .getOrElse(perNodeComposed(edges, srcCol, dstCol, edgeLimit))

  /** The fused plan: one shuffle (groupBy collect_set — map-side deduped),
    * one budget aggregate BEFORE any driver collect, one bounded driver
    * artifact (the oriented adjacency, ≤ `maxEdges` longs in id-sorted
    * arrays — the IVF-index/codebook class of collect, never unbounded),
    * one broadcast; then every apex intersects its out-neighborhood
    * against each out-neighbor's in a distributed loop with per-partition
    * count pre-aggregation, so the only remaining exchanges are |V| apex
    * ids out and ≤|V| partial counts back. Returns None — callers fall
    * back to the composed plan — past the budget or when the id columns
    * are not one shared integral type (the driver orientation keys and
    * ranks by long). */
  def perNodeFused(edges: DataFrame, srcCol: String, dstCol: String,
      maxEdges: Long = 8000000L): Option[DataFrame] = {
    val srcT = edges.schema(srcCol).dataType
    val dstT = edges.schema(dstCol).dataType
    if (!integral(srcT) || srcT != dstT || maxEdges <= 0) return None
    val spark = edges.sparkSession
    import spark.implicits._
    // half-adjacency over canonical pairs: collect_set dedups map-side, so
    // the composed plan's distinct + degree-join double exchange is one
    // partial-aggregated shuffle keyed by the lower endpoint
    val grouped = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .groupBy(col("u")).agg(collect_set(col("v")).as("nbrs"))
      .localCheckpoint()
    val m = grouped.agg(coalesce(sum(size(col("nbrs"))), lit(0L)))
      .head().getLong(0)
    // Int-index bound (round-16, ADVICE r15): the packed transfer and the
    // CSR arrays index with Int — packed entries total ≤ 2·groups + m ≤ 3m
    // (each group contributes [u, len] + its neighbors), so a caller
    // passing maxEdges past ~Int.MaxValue/3 would overflow into negative
    // array sizes/indices instead of refusing. Cap the fused route
    // explicitly; oversized graphs fall back to the composed plan.
    val intIndexCap = (Int.MaxValue / 3 - 4).toLong
    if (m == 0L || m > maxEdges || m > intIndexCap) {
      graft.operators.Checkpoints.free(grouped)
      return None
    }
    // PACKED PRIMITIVE transfer (round 15 — the r14 PageRank lesson
    // applied here): the old boxed Dataset collect deserialized every
    // half-adjacency row through Row + Seq[Long] (per-element boxing on
    // the single-threaded driver), and the old driver structures were
    // java.util.HashMap[java.lang.Long, ...] — a boxed lookup per wedge
    // step in the kernel's hottest loop. Each partition now emits one
    // long[] stream of [u, len, v1..vlen] records (UnsafeArrayData →
    // toLongArray is a bulk copy), and the driver builds DENSE int-indexed
    // CSR arrays: node dictionary (sorted dedup), degrees, and the
    // (deg, id)-oriented out-adjacency, id-sorted per node. Counts,
    // orientation, and intersections are value-identical — only the
    // representation changed (spec-pinned vs the composed plan).
    val chunks = grouped.queryExecution.toRdd.mapPartitions { it =>
      val b = new scala.collection.mutable.ArrayBuilder.ofLong
      it.foreach { r =>
        val vs = r.getArray(1).toLongArray()
        b += r.getLong(0); b += vs.length.toLong
        var i = 0
        while (i < vs.length) { b += vs(i); i += 1 }
      }
      Iterator.single(b.result())
    }.collect()
    graft.operators.Checkpoints.free(grouped)
    // node dictionary: every endpoint, sorted + deduped
    val ids = new Array[Long](chunks.map(_.length).sum) // upper bound
    var p = 0
    chunks.foreach { c =>
      var i = 0
      while (i < c.length) {
        val len = c(i + 1).toInt
        ids(p) = c(i); p += 1
        var j = 0
        while (j < len) { ids(p) = c(i + 2 + j); p += 1; j += 1 }
        i += 2 + len
      }
    }
    val sorted = java.util.Arrays.copyOf(ids, p)
    java.util.Arrays.parallelSort(sorted)
    var n = 0
    var si = 0
    while (si < sorted.length) {
      if (n == 0 || sorted(n - 1) != sorted(si)) { sorted(n) = sorted(si); n += 1 }
      si += 1
    }
    val nodes = java.util.Arrays.copyOf(sorted, n)
    def idx(id: Long): Int = java.util.Arrays.binarySearch(nodes, id)
    // exact degrees per dense id
    val deg = new Array[Long](n)
    chunks.foreach { c =>
      var i = 0
      while (i < c.length) {
        val len = c(i + 1).toInt
        val ui = idx(c(i))
        deg(ui) += len.toLong
        var j = 0
        while (j < len) { deg(idx(c(i + 2 + j))) += 1L; j += 1 }
        i += 2 + len
      }
    }
    // (deg, id)-orientation: count oriented out-degrees, then fill CSR
    val outCnt = new Array[Int](n)
    chunks.foreach { c =>
      var i = 0
      while (i < c.length) {
        val len = c(i + 1).toInt
        val ui = idx(c(i)); val du = deg(ui)
        var j = 0
        while (j < len) {
          val vi = idx(c(i + 2 + j)); val dv = deg(vi)
          val lo = if (du < dv || (du == dv && nodes(ui) < nodes(vi))) ui else vi
          outCnt(lo) += 1
          j += 1
        }
        i += 2 + len
      }
    }
    val off = new Array[Int](n + 1)
    var oi = 0
    while (oi < n) { off(oi + 1) = off(oi) + outCnt(oi); oi += 1 }
    val nbr = new Array[Int](off(n))
    val fill = java.util.Arrays.copyOf(off, n)
    chunks.foreach { c =>
      var i = 0
      while (i < c.length) {
        val len = c(i + 1).toInt
        val ui = idx(c(i)); val du = deg(ui)
        var j = 0
        while (j < len) {
          val vi = idx(c(i + 2 + j)); val dv = deg(vi)
          val (lo, hi) =
            if (du < dv || (du == dv && nodes(ui) < nodes(vi))) (ui, vi)
            else (vi, ui)
          nbr(fill(lo)) = hi; fill(lo) += 1
          j += 1
        }
        i += 2 + len
      }
    }
    // id-sorted out-neighbor runs: set intersection needs one shared
    // order, and dense-id order (= id order) is it
    oi = 0
    while (oi < n) {
      java.util.Arrays.sort(nbr, off(oi), off(oi + 1)); oi += 1
    }
    val bcNodes = spark.sparkContext.broadcast(nodes)
    val bcOff = spark.sparkContext.broadcast(off)
    val bcNbr = spark.sparkContext.broadcast(nbr)
    val slices = spark.sparkContext.defaultParallelism
    val partials = spark.range(0L, n.toLong, 1L, slices)
      .as[Long]
      .mapPartitions { it =>
        val nodesL = bcNodes.value; val offL = bcOff.value; val nbrL = bcNbr.value
        // per-partition counts over dense ids — primitive map, no boxing
        val counts = new scala.collection.mutable.LongMap[Long]()
        def bump(i: Int): Unit =
          counts.update(i.toLong, counts.getOrElse(i.toLong, 0L) + 1L)
        it.foreach { xl =>
          val x = xl.toInt
          var i = offL(x)
          val xEnd = offL(x + 1)
          while (i < xEnd) {
            val y = nbrL(i)
            // two-pointer merge: common out-neighbors of x and y each
            // close one triangle {x, y, c}, charged to all three corners
            var pp = offL(x); var q = offL(y)
            val qEnd = offL(y + 1)
            while (pp < xEnd && q < qEnd) {
              if (nbrL(pp) < nbrL(q)) pp += 1
              else if (nbrL(pp) > nbrL(q)) q += 1
              else { bump(x); bump(y); bump(nbrL(pp)); pp += 1; q += 1 }
            }
            i += 1
          }
        }
        counts.iterator.map { case (i, c) => (nodesL(i.toInt), c) }
      }.toDF("n", "__tri")
      .groupBy(col("n")).agg(sum(col("__tri")).as("triangles"))
    val degDf = spark.createDataset(
      { val b = Seq.newBuilder[(Long, Long)]
        var i = 0
        while (i < n) { b += ((nodes(i), deg(i))); i += 1 }
        b.result() })
      .toDF("n", "degree")
    Some(degDf.join(partials, Seq("n"), "left")
      .select(col("n").cast(srcT).as("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2L,
          (coalesce(col("triangles"), lit(0L)) * 2L).cast("double")
            / (col("degree") * (col("degree") - 1L))).as("coeff")))
  }

  /** The composed (all-DataFrame) plan — any id type, any graph size. */
  def perNodeComposed(edges: DataFrame, srcCol: String, dstCol: String,
      broadcastEdgeLimit: Long = 8000000L): DataFrame = {
    // materialize the canonical edge set ONCE: deg, the orientation join,
    // and (via `oriented`) three join branches all read it, and `edges` is
    // often an expensive upstream join (q155's co-purchase self-join)
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct().localCheckpoint()
    val m = und.count() // one long: drives the closing-join regime gate
    val deg = und.select(col("u").as("n"))
      .unionAll(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("degree"))
    val withDeg = und
      .join(deg.select(col("n").as("u"), col("degree").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("degree").as("dv")), Seq("v"))
    // orient lo-(deg, id) -> hi; carry the head's rank for the wedge order.
    // Checkpointed: e1/e2 share one exchange on the apex, but the closing
    // side keys on (b-pair) — without the cut the whole distinct+deg+orient
    // lineage would run again for it.
    val lo = lexLess(col("du"), col("u"), col("dv"), col("v"))
    val oriented = withDeg.select(
      when(lo, col("u")).otherwise(col("v")).as("a"),
      when(lo, col("v")).otherwise(col("u")).as("b"),
      when(lo, col("dv")).otherwise(col("du")).as("db"))
      .localCheckpoint()
    // wedges at apex a: unordered out-neighbor pairs, ranked b1 < b2
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.a") === col("e2.a") &&
          lexLess(col("e1.db"), col("e1.b"), col("e2.db"), col("e2.b")))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    // closing join: the wedge side is O(m^1.5) ROWS — the plan's dominant
    // exchange — while the edge side is O(m). Under the budget, broadcast
    // the edges so the wedge set closes map-side and never shuffles; past
    // it, the shuffled equi-join (both at 100 TB: a graph whose edge list
    // alone exceeds executor memory shuffles, everything else shouldn't).
    val closingEdges = oriented.select(col("a").as("y"), col("b").as("z"))
    val tri = wedges.join(
      if (m <= broadcastEdgeLimit) broadcast(closingEdges) else closingEdges,
      Seq("y", "z"))
    val corners = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("triangles"))
    deg.join(corners, Seq("n"), "left")
      .select(col("n").as("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2L,
          (coalesce(col("triangles"), lit(0L)) * 2L).cast("double")
            / (col("degree") * (col("degree") - 1L))).as("coeff"))
  }

  /** Global triangle count (one row) — the corners sum / 3. */
  def globalCount(edges: DataFrame, srcCol: String, dstCol: String,
      edgeLimit: Long = 8000000L): DataFrame =
    perNode(edges, srcCol, dstCol, edgeLimit)
      .agg((sum(col("triangles")) / 3L).cast("long").as("n_triangles"))
}
