package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fused brute-force top-k retrieval of query vectors against a BOUNDED
  * embedding catalog — the serving-side primitive behind
  * `TwoTower.recommend`, exposed for ANY (id, vec) table: ALS factor
  * tables, SQ8-decoded stores, document embeddings (reference analog: the
  * user·item serving ranking, my_merlin_flow.py:536-556).
  *
  * Plan shape (see sql.TopKDotF32): the catalog is collected once under a
  * float budget (probed with one bounded `limit` job) and rides the plan
  * as ONE reference object; each query row scores the whole catalog
  * inside a primitive-array loop (DotF32-identical arithmetic, TopKAggF's
  * (score desc, id asc) order), skipping its own `seen` ids row-locally.
  * Candidates never materialize as rows; the only exchanges are the
  * per-query seen-set collect_set and an explicit ROW-COUNT repartition
  * of the query frame — each query row is ~dim bytes but catalog × dim
  * WORK, so AQE's size-based coalescing would otherwise serialize the
  * scoring loop on one core (SCALE.md, round 11).
  *
  * Returns None when the catalog exceeds `catalogFloatLimit` (≈256 MB at
  * the default) or is empty — past that seam retrieval belongs to the ANN
  * stack (Ivf/IvfPq), not a dense scan; callers fall back explicitly.
  * Output: (qId, rk int 1..k, cId long, score double), rk ordered
  * (score desc, cId asc) per query. Query ids absent from `queries`'
  * vec column (null vec) produce no rows.
  */
object Retrieval {

  def topKDot(queries: DataFrame, qId: String, qVec: String,
      catalog: DataFrame, cId: String, cVec: String, k: Int,
      seen: Option[DataFrame] = None,
      catalogFloatLimit: Long = 64000000L): Option[DataFrame] = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.sql.GraftFunctions.register(queries.sparkSession)
    val dimRow = catalog.select(size(col(cVec)).as("d")).head(1)
    val dim = if (dimRow.isEmpty) 0 else dimRow(0).getInt(0)
    if (dim <= 0 || catalogFloatLimit <= 0) return None
    // clamp before toInt: a generous Long budget must not truncate negative
    val maxRows = math.min(catalogFloatLimit / dim, (Int.MaxValue - 1).toLong).toInt
    val rows = catalog
      .select(col(cId).cast("long"), col(cVec).cast("array<float>"))
      .limit(maxRows + 1).collect()
    if (rows.length > maxRows) return None
    val ids = rows.map(_.getLong(0))
    val mats = rows.map(_.getSeq[Float](1).toArray)
    val base = seen match {
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
    val slices = base.sparkSession.sparkContext.defaultParallelism
    Some(base.repartition(slices)
      .select(col(qId), posexplode(
        graft.sql.GraftFunctions.topKDotF32(
          col(qVec).cast("array<float>"),
          coalesce(col("__seen"), typedLit(Seq.empty[Long])),
          ids, mats, k)))
      .select(col(qId), (col("pos") + 1).cast("int").as("rk"),
        col("col.item_id").as(cId), col("col.score").as("score")))
  }
}
