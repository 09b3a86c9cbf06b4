package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
  * corpus embeddings with a coarse quantizer, then within each cluster
  * drop all but one of every near-identical group by embedding cosine —
  * the "same content, different words" dedup tier that exact/minhash/
  * span dedup cannot reach. Extension scope — no reference counterpart.
  *
  * Deliberately a COMPOSITION of shipped operators, because the paper's
  * pipeline is exactly their composition:
  *  - clustering = [[Ivf.nearestCell]] (one codegen'd matrix-loop
  *    projection per row, zero shuffles; the centroid matrix comes from
  *    [[Ivf.fitCentroids]] or a persisted [[Ivf.loadCentroids]] artifact);
  *  - within-cluster pruning = [[BlockedNearDup.dropNearDuplicates]] with
  *    the cell id as the block key, inheriting its hot-block SRP
  *    splitting (a mega-cluster subdivides instead of going |cell|²) and
  *    its keep-smallest-id policy (the paper keeps one representative per
  *    near-dup group; smallest id makes that choice deterministic).
  *
  * Scale shape: one projection + the blocked pair join's single shuffle
  * on (cell, sub-bucket). nlist sizes as corpus/target-cell-size; the SRP
  * ladder bounds any cell the quantizer underestimates.
  */
object SemDedup {

  /** Rows of `df` surviving semantic dedup, with their cell id attached
    * as `cell`. Pairs with cosine ≥ `threshold` inside the same
    * (cell, sub-bucket) drop the larger id. */
  def dropSemanticDuplicates(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], threshold: Double, maxCell: Int,
      dim: Int, maxSplitBits: Int = 8): DataFrame = {
    graft.sql.GraftFunctions.register(df.sparkSession)
    val assigned = df.withColumn("cell",
      Ivf.nearestCell(col(vecCol), centroids))
    BlockedNearDup.dropNearDuplicates(assigned, idCol, vecCol, "cell",
      maxCell, threshold, dim, maxSplitBits)
  }
}
