package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking evaluation: per-user recall@k and NDCG@k (reference:
  * RecallAt(10) / NDCGAt(10), my_merlin_flow.py:91-95,318,446-450).
  *
  * Cross-engine determinism: the DCG discounts 1/log2(r+1) are quantized to
  * 1e-12 and embedded as scaled-LONG literal arrays in the plan (an external
  * oracle embeds the identical constants), so per-user DCG is an exact
  * integer sum — order-independent, no libm call and no float-summation-
  * order hazard at query time. NDCG divides two such integers as doubles:
  * bit-identical across engines. The 1e-12 quantization perturbs NDCG by
  * < 1e-11 — far below any decision threshold.
  *
  * Scale: one shuffle for the truth-set count, one broadcast-able join of
  * recs to truth, one groupBy user — all linear in |recs| + |truth|.
  */
object RankingEval {

  /** 1/log2(r+1) for ranks 1..k, scaled by 1e12 and rounded to long. */
  def discountsScaled(k: Int): Array[Long] =
    (1 to k).map(r => math.round(1e12 / (math.log(r + 1.0) / math.log(2.0)))).toArray

  /** Ideal scaled DCG for truth sizes 1..k (prefix sums). */
  def idcgScaled(k: Int): Array[Long] = discountsScaled(k).scanLeft(0L)(_ + _).tail

  /** Per-user metrics: DataFrame[user, n_test, hits, recall, ndcg] over all
    * users with at least one truth item. Users with no recommendations (or
    * no hits) score 0. */
  def perUser(recs: DataFrame, truth: DataFrame, k: Int,
      userCol: String = "user_id", itemCol: String = "item_id",
      rankCol: String = "rk"): DataFrame = {
    val disc = lit(discountsScaled(k))
    val ideal = lit(idcgScaled(k))
    // one exchange for the truth side: user-keyed repartition feeds the
    // full-tuple distinct (subset clustering) and the per-user count
    val t = truth.select(col(userCol), col(itemCol))
      .repartition(col(userCol)).distinct()
    val tsize = t.groupBy(col(userCol)).agg(count(lit(1)).as("n_test"))
    val hits = recs.filter(col(rankCol) <= k)
      .join(t, Seq(userCol, itemCol))
      .groupBy(col(userCol))
      .agg(
        count(lit(1)).as("hits"),
        sum(element_at(disc, col(rankCol))).as("dcg_s"))
    tsize.join(hits, Seq(userCol), "left")
      .select(col(userCol), col("n_test"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / col("n_test")).as("recall"),
        (coalesce(col("dcg_s"), lit(0L)).cast("double") /
          element_at(ideal, least(col("n_test"), lit(k)).cast("int")).cast("double")).as("ndcg"))
  }

  /** Driver-side mean (recall, ndcg) — model selection and spec assertions,
    * not part of the oracle surface (global float means are
    * summation-order-sensitive). */
  def meanMetrics(perUserDf: DataFrame): (Double, Double) = {
    val row = perUserDf.agg(avg("recall"), avg("ndcg")).head()
    (row.getDouble(0), row.getDouble(1))
  }
}
