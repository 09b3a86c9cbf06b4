package graft.sim

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sql.TopKDotF32
import graft.sql.TopKDotF32.FlatCatalog

/** Fused brute-force top-k retrieval of query vectors against a BOUNDED
  * embedding catalog — the serving-side primitive behind
  * `TwoTower.recommend`, `Knn.bruteForceTopK`, and the bitext miner,
  * exposed for ANY (id, vec) table: ALS factor tables, SQ8-decoded
  * stores, document embeddings (reference analog: the user·item serving
  * ranking, my_merlin_flow.py:536-556). Past the dense float budget,
  * [[topKAnn]]/[[topKAnnPq]] are the same contract served through the
  * IVF / IVFADC index instead of a full scan.
  *
  * Plan shape (see sql.TopKDotF32): the catalog is collected once under a
  * float budget (probed with one bounded `limit` job), flattened
  * driver-side, and BROADCAST — executors hold one copy in their block
  * manager, tasks share it (round-12 advice; the old reference-object
  * form deserialized a copy per task). Each query row scores the whole
  * catalog inside a primitive-array loop (DotF32-identical arithmetic —
  * or the cosineF32 composition bit-exactly when `cosine` is set —
  * TopKAggF's (score desc, id asc) order), skipping its own `seen` ids
  * row-locally. Candidates never materialize as rows; the only exchanges
  * are the per-query seen-set collect_set and an explicit ROW-COUNT
  * repartition of the query frame — each query row is ~dim bytes but
  * catalog × dim WORK, so AQE's size-based coalescing would otherwise
  * serialize the scoring loop on one core (SCALE.md, round 11).
  *
  * Null hygiene (round-12 advice): catalog rows with a null id (or an id
  * that casts to null) or a null vector are FILTERED before the collect —
  * the same rows the unfused crossJoin plan silently drops — and the dim
  * probe skips null embeddings, so the fused path succeeds wherever the
  * fallback path does.
  *
  * Returns None when the catalog exceeds `catalogFloatLimit` (≈256 MB at
  * the default) or is empty — past that seam retrieval belongs to the ANN
  * stack, not a dense scan; callers fall back explicitly.
  * Output: (qId, rk int 1..k, cId long, score double), rk ordered
  * (score desc, cId asc) per query. Query ids absent from `queries`'
  * vec column (null vec) produce no rows.
  */
object Retrieval {

  /** Collect + flatten + broadcast a catalog under the float budget.
    * None = over budget or empty (the ANN handoff seam). The broadcast is
    * ContextCleaner-reclaimed once unreferenced; long-lived callers
    * (streaming serve) hold it in a [[CatalogCache]]. */
  def publishCatalog(catalog: DataFrame, cId: String, cVec: String,
      catalogFloatLimit: Long = 64000000L,
      cosine: Boolean = false): Option[Broadcast[FlatCatalog]] = {
    val clean = catalog
      .select(col(cId).cast("long").as("__id"),
        col(cVec).cast("array<float>").as("__v"))
      .filter(col("__id").isNotNull && col("__v").isNotNull)
    val dimRow = clean.select(size(col("__v")).as("d")).head(1)
    val dim = if (dimRow.isEmpty) 0 else dimRow(0).getInt(0)
    if (dim <= 0 || catalogFloatLimit <= 0) return None
    // clamp before toInt: a generous Long budget must not truncate negative
    val maxRows = math.min(catalogFloatLimit / dim, (Int.MaxValue - 1).toLong).toInt
    val rows = clean.limit(maxRows + 1).collect()
    if (rows.length > maxRows || rows.isEmpty) return None
    val ids = rows.map(_.getLong(0))
    val mats = rows.map(_.getSeq[Float](1).toArray)
    Some(catalog.sparkSession.sparkContext.broadcast(
      TopKDotF32.flatten(ids, mats, cosine)))
  }

  /** One published catalog per MODEL GENERATION (round-11 verdict task 5):
    * streaming serves re-enter the kernel every micro-batch, but the
    * catalog only changes on model hot-swap — so the cache keys the
    * broadcast on the supplier's returned frame IDENTITY and re-collects
    * (re-probing dim and budget) only when the supplier hands back a new
    * frame. The superseded broadcast is unpersisted (not destroyed: tasks
    * of an in-flight batch may still read it; the ContextCleaner finishes
    * the job). `collects` counts generations — spec-pinned to 1 across
    * batches of a stable model. */
  final class CatalogCache(supplier: () => DataFrame, cId: String, cVec: String,
      catalogFloatLimit: Long = 64000000L, cosine: Boolean = false) {
    @volatile private var keyFrame: DataFrame = null
    @volatile private var cached: Option[Broadcast[FlatCatalog]] = None
    @volatile var collects: Int = 0

    def get(): Option[Broadcast[FlatCatalog]] = synchronized {
      val frame = supplier()
      if (!(frame eq keyFrame)) {
        cached.foreach(_.unpersist(blocking = false))
        cached = publishCatalog(frame, cId, cVec, catalogFloatLimit, cosine)
        keyFrame = frame
        collects += 1
      }
      cached
    }
  }

  /** Attach the per-query seen-id array (`__seen`): collect_set of the
    * seen pairs, semi-pruned to the query set first so the aggregation is
    * O(queries × their history), never O(all history). */
  private def withSeen(queries: DataFrame, qId: String,
      seen: Option[DataFrame], cId: String): DataFrame = seen match {
    case Some(sn) =>
      val seenSets = sn
        .select(col(qId), col(cId).cast("long").as("__sid"))
        .join(queries.select(col(qId)), Seq(qId), "left_semi")
        .groupBy(col(qId))
        .agg(collect_set(col("__sid")).as("__seen"))
      queries.join(seenSets, Seq(qId), "left")
    case None =>
      queries.withColumn("__seen", lit(null).cast("array<bigint>"))
  }

  /** The fused plan against an already-published catalog (the form the
    * streaming serve calls per micro-batch through [[CatalogCache]]).
    * `excludeSelf` additionally drops the candidate whose id equals the
    * query's own id — row-local, zero extra shuffle (the self-join
    * exclusion of Knn.bruteForceTopK). */
  def topKDotWith(queries: DataFrame, qId: String, qVec: String,
      catalog: Broadcast[FlatCatalog], k: Int,
      seen: Option[DataFrame] = None, seenIdCol: String = "item_id",
      cosine: Boolean = false, excludeSelf: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = withSeen(queries, qId, seen, seenIdCol)
    val seenArr0 = coalesce(col("__seen"), typedLit(Seq.empty[Long]))
    // a null (or non-castable) query id has no self to exclude — guard it
    // out rather than planting a null element in the primitive seen array
    val seenArr =
      if (excludeSelf)
        when(col(qId).cast("long").isNotNull,
          concat(seenArr0, array(col(qId).cast("long"))))
          .otherwise(seenArr0)
      else seenArr0
    val slices = base.sparkSession.sparkContext.defaultParallelism
    base.repartition(slices)
      .select(col(qId), posexplode(
        TopKDotF32.fused(col(qVec).cast("array<float>"), seenArr, catalog, k,
          cosine)))
      .select(col(qId), (col("pos") + 1).cast("int").as("rk"),
        col("col.item_id").as(seenIdCol), col("col.score").as("score"))
  }

  def topKDot(queries: DataFrame, qId: String, qVec: String,
      catalog: DataFrame, cId: String, cVec: String, k: Int,
      seen: Option[DataFrame] = None,
      catalogFloatLimit: Long = 64000000L,
      cosine: Boolean = false, excludeSelf: Boolean = false): Option[DataFrame] = {
    require(k >= 1, s"k must be >= 1, got $k")
    publishCatalog(catalog, cId, cVec, catalogFloatLimit, cosine).map(bc =>
      topKDotWith(queries, qId, qVec, bc, k, seen, cId, cosine, excludeSelf))
  }

  // ------------------------------------------------------------------
  // The ANN-served leg (round-11 verdict task 2): the same per-query
  // top-k contract PAST the dense kernel's float budget, served through
  // the IVF cell structure — probe each query's nprobe nearest cells,
  // score only those cells' rows, heap the k best. Candidates are
  // nprobe/nlist of the catalog per query instead of all of it; the
  // catalog never rides the plan or a broadcast.
  // ------------------------------------------------------------------

  /** Collect + group + broadcast a cell-assigned index (id, cid, vec)
    * into the fused IVF kernel's payload (sql.TopKDotIvfF32.CellCatalog).
    * None = over the float budget or empty — past that seam the join
    * plan of [[topKAnn]] is the only option. */
  def publishCellCatalog(index: DataFrame, cId: String, cVec: String,
      centroids: Array[Array[Float]],
      indexFloatLimit: Long = 64000000L)
      : Option[Broadcast[graft.sql.TopKDotIvfF32.CellCatalog]] = {
    if (indexFloatLimit <= 0 || centroids.isEmpty) return None
    val dim = centroids(0).length
    if (dim <= 0) return None
    val maxRows = math.min(indexFloatLimit / dim, (Int.MaxValue - 1).toLong).toInt
    val rows = index
      .select(col(cId).cast("long").as("__id"), col("cid").cast("int").as("__c"),
        col(cVec).cast("array<float>").as("__v"))
      .filter(col("__id").isNotNull && col("__c").isNotNull && col("__v").isNotNull)
      .limit(maxRows + 1).collect()
    if (rows.length > maxRows || rows.isEmpty) return None
    Some(index.sparkSession.sparkContext.broadcast(
      graft.sql.TopKDotIvfF32.group(
        rows.map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray)),
        centroids)))
  }

  /** [[CatalogCache]]'s IVF counterpart (round 12): one published cell
    * catalog per INDEX GENERATION for streaming ANN serves — keyed on the
    * supplier's returned frame identity, re-collected (and re-grouped
    * under the possibly-new quantizer) only when the supplier hands back
    * a new frame; the superseded broadcast is unpersisted. None = over
    * budget (the join plan's regime — the stream caller decides). */
  final class CellCatalogCache(supplier: () => DataFrame, cId: String,
      cVec: String, centroids: () => Array[Array[Float]],
      indexFloatLimit: Long = 64000000L) {
    @volatile private var keyFrame: DataFrame = null
    @volatile private var cached: Option[Broadcast[graft.sql.TopKDotIvfF32.CellCatalog]] = None
    @volatile var collects: Int = 0

    def get(): Option[Broadcast[graft.sql.TopKDotIvfF32.CellCatalog]] = synchronized {
      val frame = supplier()
      if (!(frame eq keyFrame)) {
        cached.foreach(_.unpersist(blocking = false))
        cached = publishCellCatalog(frame, cId, cVec, centroids(), indexFloatLimit)
        keyFrame = frame
        collects += 1
      }
      cached
    }
  }

  /** The fused IVF plan against an already-published cell catalog: probe
    * selection, probed-cell scan, seen exclusion and the k-heap all in
    * ONE expression eval per query — candidates never exist as rows
    * (see sql.TopKDotIvfF32; row-identical to the join plan). */
  def topKAnnWith(queries: DataFrame, qId: String, qVec: String,
      catalog: Broadcast[graft.sql.TopKDotIvfF32.CellCatalog], k: Int,
      nprobe: Int, seen: Option[DataFrame] = None,
      seenIdCol: String = "item_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = withSeen(queries, qId, seen, seenIdCol)
    val slices = base.sparkSession.sparkContext.defaultParallelism
    base.repartition(slices)
      .select(col(qId), posexplode(
        graft.sql.TopKDotIvfF32.fused(col(qVec).cast("array<float>"),
          coalesce(col("__seen"), typedLit(Seq.empty[Long])), catalog, k,
          nprobe)))
      .select(col(qId), (col("pos") + 1).cast("int").as("rk"),
        col("col.item_id").as(seenIdCol), col("col.score").as("score"))
  }

  /** IVF-probed top-k with EXACT in-cell scoring: the mid-scale ANN form
    * (full-width vectors kept, storage uncompressed). Two plans behind
    * one contract (round 12):
    *  - index INSIDE `fusedIndexFloatLimit` → the FUSED kernel
    *    (sql.TopKDotIvfF32): probe + probed-cell scan + heap in one
    *    expression per query, candidates never materialized, seen
    *    excluded by row-local binary search; the only exchanges are the
    *    seen aggregation and the row-count repartition.
    *  - index PAST the budget → one codegen probe expression per query
    *    row (O(1) plan size in nlist), explode to (query, cid), ONE
    *    equi-join on cid against the cell-assigned catalog — at 100 TB
    *    the index side is written `partitionBy("cid")`/bucketed so the
    *    join reads only probed cells and ships no catalog shuffle — then
    *    DotF32 scores and the map-side k-bounded heap cuts candidates to
    *    queries × k before the final exchange, seen ids excluded
    *    row-locally on the candidate stream.
    * Both emit IDENTICAL rows (same probe arithmetic, same dots, same
    * (score desc, id asc) order — spec-pinned in RetrievalSpec). Recall
    * is governed by nprobe/nlist exactly as Ivf.topK (IvfSpec); with
    * nprobe = nlist the output EQUALS the dense kernel's rows.
    *
    * `index` = (cId, "cid", cVec) — build with [[annIndex]] or persist
    * IvfPq-style. Output: (qId, rk, cId long, score double). */
  def topKAnn(queries: DataFrame, qId: String, qVec: String,
      index: DataFrame, cId: String, cVec: String,
      centroids: Array[Array[Float]], k: Int, nprobe: Int = 8,
      seen: Option[DataFrame] = None,
      fusedIndexFloatLimit: Long = 64000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.sql.GraftFunctions.register(queries.sparkSession)
    publishCellCatalog(index, cId, cVec, centroids, fusedIndexFloatLimit) match {
      case Some(bc) =>
        return topKAnnWith(queries, qId, qVec, bc, k, nprobe, seen, cId)
      case None => () // index past the budget — join plan below
    }
    val q = withSeen(queries, qId, seen, cId)
      .select(col(qId), col(qVec).cast("array<float>").as("__qv"),
        coalesce(col("__seen"), typedLit(Seq.empty[Long])).as("__sn"))
      .withColumn("cid",
        explode(Ivf.probeCells(col("__qv"), centroids, nprobe)))
    val c = index.select(col("cid"),
      col(cId).cast("long").as("__cid2"),
      col(cVec).cast("array<float>").as("__cv"))
    val scored = q.join(c, Seq("cid"))
      .filter(!array_contains(col("__sn"), col("__cid2")))
      .select(col(qId), col("__cid2"),
        graft.sql.GraftFunctions.dotF32(col("__qv"), col("__cv")).as("score"))
    graft.operators.Relational.topKPerGroupAgg(scored, Seq(qId),
        col("score"), col("__cid2"), k, idName = cId, scoreName = "score")
  }

  /** Cell-assign a catalog into the (id, cid, vec) index [[topKAnn]]
    * probes — a pure projection (zero shuffle); persist it
    * `partitionBy("cid")` for file-level probe pruning at scale. */
  def annIndex(catalog: DataFrame, cId: String, cVec: String,
      centroids: Array[Array[Float]]): DataFrame = {
    graft.sql.GraftFunctions.register(catalog.sparkSession)
    catalog
      .select(col(cId), col(cVec).cast("array<float>").as(cVec))
      .filter(col(cId).cast("long").isNotNull && col(cVec).isNotNull)
      .withColumn("cid", Ivf.nearestCell(col(cVec), centroids))
  }

  /** IVFADC-probed top-k with EXACT RERANK — the storage-scale form: the
    * probed cells are scored on their m-byte PQ codes (asymmetric
    * distance: full-precision query · reconstructed candidate, the
    * codebooks as plan literals), the ADC longlist over-fetches
    * `overfetch`·k per query through the map-side heap, and only those
    * survivors touch full-width vectors for the exact dot that decides
    * the final ranking — quantization error picks the longlist, never the
    * order. Candidate I/O is nprobe/nlist × (m bytes per row); the
    * full-width table is read for queries × overfetch·k rows via an
    * id equi-join.
    *
    * `encoded` = IvfPq.index/indexResidual output (cId, cid, code) over
    * model raw codes. Output: (qId, rk, cId long, score double). */
  def topKAnnPq(queries: DataFrame, qId: String, qVec: String,
      encoded: DataFrame, cId: String, model: IvfPq.Model,
      rerank: DataFrame, rVec: String, k: Int, nprobe: Int = 8,
      overfetch: Int = 4, seen: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && overfetch >= 1, s"bad k=$k / overfetch=$overfetch")
    graft.sql.GraftFunctions.register(queries.sparkSession)
    // reconstructed candidate = concat of each subspace's codebook row —
    // one literal array per subspace, O(m·k·subDim) plan data total
    val decoded = concat(model.books.zipWithIndex.map { case (book, s) =>
      element_at(typedLit(book.map(_.toSeq).toSeq), col("code").getItem(s) + 1)
    }: _*)
    val q = withSeen(queries, qId, seen, cId)
      .select(col(qId), col(qVec).cast("array<float>").as("__qv"),
        coalesce(col("__seen"), typedLit(Seq.empty[Long])).as("__sn"))
      .withColumn("cid",
        explode(Ivf.probeCells(col("__qv"), model.centroids, nprobe)))
    val candidates = q
      .join(encoded.select(col("cid"), col(cId).cast("long").as("__cid2"),
        col("code")), Seq("cid"))
      .filter(!array_contains(col("__sn"), col("__cid2")))
      .select(col(qId), col("__cid2"),
        graft.sql.GraftFunctions.dotF32(col("__qv"),
          decoded.cast("array<float>")).as("score"))
    val longlist = graft.operators.Relational.topKPerGroupAgg(candidates,
        Seq(qId), col("score"), col("__cid2"), k * overfetch,
        idName = cId, scoreName = "__adc")
      .select(col(qId), col(cId))
    val exact = longlist
      .join(rerank.select(col(cId).cast("long").as(cId),
        col(rVec).cast("array<float>").as("__rv")), Seq(cId))
      .join(queries.select(col(qId),
        col(qVec).cast("array<float>").as("__qv2")), Seq(qId))
      .select(col(qId), col(cId),
        graft.sql.GraftFunctions.dotF32(col("__qv2"), col("__rv")).as("score"))
    graft.operators.Relational.topKPerGroupAgg(exact, Seq(qId),
      col("score"), col(cId), k, idName = cId, scoreName = "score")
  }
}
