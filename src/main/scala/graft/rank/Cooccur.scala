package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Deterministic item–item co-occurrence retrieval (the engine's fully
  * reproducible recommender; capability analog of the reference's top-k
  * retrieval, my_merlin_flow.py:333-345, with integer scoring so results are
  * exactly reproducible in any SQL engine — the ALS path in AlsRecommender
  * is the learned counterpart).
  *
  * Scale design: the per-user self-join is quadratic in basket size — at
  * 100 TB cap baskets upstream (keep each user's most recent N items) and
  * the neighbor model is capped at `maxNeighbors` per item (count desc,
  * item asc — deterministic), so the model table is |items| × M rows:
  * broadcastable for dims in the millions, shuffle-joinable beyond.
  */
object Cooccur {

  /** Fit: DataFrame[item_a, item_b, c] — for each item, its top-M
    * co-purchased items by co-user count. */
  def itemNeighbors(inter: DataFrame, maxNeighbors: Int = 50): DataFrame = {
    val t = inter.select(col("user_id"), col("item_id")).distinct()
    val pairs = t.as("a").join(t.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item_id") =!= col("b.item_id"))
      .groupBy(col("a.item_id").as("item_a"), col("b.item_id").as("item_b"))
      .agg(count(lit(1)).as("c"))
    Relational.topKPerGroup(pairs, Seq("item_a"),
        Seq(col("c").desc, col("item_b").asc), maxNeighbors, "__nrk")
      .drop("__nrk")
  }

  /** Recommend: top-k unseen items per user, scored by the summed co-user
    * count over the user's history. Output: user_id, rk, item_id, score. */
  def recommend(inter: DataFrame, neighbors: DataFrame, k: Int = 10): DataFrame = {
    val t = inter.select(col("user_id"), col("item_id")).distinct()
    val scores = t.join(neighbors, t("item_id") === neighbors("item_a"))
      .groupBy(col("user_id"), col("item_b"))
      .agg(sum(col("c")).as("score"))
    val unseen = scores.join(t.withColumnRenamed("item_id", "item_b"),
        Seq("user_id", "item_b"), "left_anti")
    Relational.topKPerGroup(unseen, Seq("user_id"),
        Seq(col("score").desc, col("item_b").asc), k)
      .select(col("user_id"), col("rk"), col("item_b").as("item_id"), col("score"))
  }
}
