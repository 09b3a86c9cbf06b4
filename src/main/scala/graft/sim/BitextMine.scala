package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.VectorOps

/** Margin-based bitext mining (Artetxe & Schwenk 2019, the CCMatrix /
  * LASER device): pair each source-language document with its best
  * target-language match, scored not by raw cosine but by the MARGIN —
  * cosine over the mean of both sides' k-NN cosines — which cancels the
  * hubness that makes raw-cosine mining pick the same central vectors for
  * everything. The standard parallel-corpus miner for translation
  * training data; extension scope (no reference counterpart).
  *
  * margin(x, y) = cos(x, y) / ((meanK(x) + meanK(y)) / 2)
  *
  * Scale design: this module scores CANDIDATE pairs exactly; candidates
  * here come from the exact cross product (correct baseline — the forward
  * and backward passes are the same broadcast nested-loop shape as
  * Knn.bruteForceTopK, small side broadcast, big side streamed once). At
  * CCMatrix scale neither language fits a broadcast: generate candidates
  * with Knn.lshTopK / Ivf.topK per side and feed the SAME margin
  * computation — the meanK aggregates and the margin arithmetic are
  * candidate-source-agnostic.
  *
  * Determinism contract: per-pair cosine is the sequential HOF fold both
  * engines replay (q41 precedent); each meanK is a DECIMAL-summed mean
  * (order-independent); the margin is one identical-association double
  * chain — so every output column sits on the oracle hash surface.
  */
object BitextMine {

  private def dmean(c: Column): Column =
    sum(c.cast(DecimalType(28, 12))).cast("double") / count(lit(1))

  /** Best target match per source doc with its margin score. `src`/`tgt`
    * carry (idCol, vecCol); id spaces must be disjoint (they are distinct
    * documents). Keep matches with margin >= `minMargin` (1.0 = "better
    * than its neighborhoods' average" — the usual mining threshold; the
    * -Infinity default emits every best match, scored). */
  def mine(src: DataFrame, tgt: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, minMargin: Double = Double.NegativeInfinity): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // Materialize both sides ONCE (round 12): each side's lineage (for
    // q143, a documents⋈embeddings join) is otherwise re-executed by the
    // two k-NN legs, the k-NN dispatch's bounded query-count probe, and
    // the meanK joins — six replays of the same upstream plan. The
    // materialized frames are |side| × (id, vec) rows, corpus-bounded.
    val s = src.select(col(idCol), col(vecCol)).localCheckpoint()
    val t = tgt.select(col(idCol), col(vecCol)).localCheckpoint()
    // fwd feeds TWO consumers (the meanK aggregate and the margin join).
    // Its output is k-bounded (|src| × k rows), so materialize it ONCE:
    // when the k-NN leg dispatches to the fused kernel (round 12) the
    // expensive Generate sits ABOVE the plan's only exchange and would
    // otherwise re-execute per consumer (the lshTopK convention). bwd has
    // one consumer and stays lazy.
    val fwd = Knn.bruteForceTopK(s, t, idCol, vecCol, k).localCheckpoint()
    val bwd = Knn.bruteForceTopK(t, s, idCol, vecCol, k)
    val mSrc = fwd.groupBy(col("query_id")).agg(dmean(col("cos")).as("m_src"))
    val mTgt = bwd.groupBy(col("query_id")).agg(dmean(col("cos")).as("m_tgt"))
      .withColumnRenamed("query_id", "neighbor_id")
    // margin-score ALL forward candidates, then pick the best BY MARGIN —
    // meanK(y) varies across candidates, so the margin argmax is not the
    // cosine argmax: demoting the hub is exactly this re-rank.
    // The candidate-heavy legs are the two bruteForceTopK calls above
    // (which ride TopKAggF since round 10); THIS window stays — its
    // input is already k-bounded per query (candidates ≈ survivors ×
    // k), and the kept row must carry the full (cos, margin) row, not
    // an (id, score) pair.
    val scored = fwd
      .join(mSrc, Seq("query_id"))
      .join(mTgt, Seq("neighbor_id"))
      .withColumn("margin",
        col("cos") / ((col("m_src") + col("m_tgt")) / lit(2.0)))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("margin").desc, col("neighbor_id"))
    scored.withColumn("__mrk", row_number().over(best))
      .filter(col("__mrk") === 1 && col("margin") >= minMargin)
      .select(col("query_id").as("src_id"), col("neighbor_id").as("tgt_id"),
        col("cos"), col("margin"))
  }
}
