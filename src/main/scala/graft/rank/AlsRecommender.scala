package graft.rank

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned retrieval via implicit-feedback ALS — the spark.ml
  * collaborative-filtering capability equivalent of the reference's
  * two-tower model (my_merlin_flow.py:306-324; SURVEY §2.8 F9). Grid search
  * + selection mirror the reference's foreach fan-out and argmax join
  * (my_merlin_flow.py:248-263,347-374; F10/F11).
  *
  * Scale: ALS is the canonical distributed MF (block-partitioned factor
  * shuffles); recommendForUserSubset does blocked BLAS top-k, never a
  * driver-side cross join.
  */
case class AlsConfig(rank: Int = 16, regParam: Double = 0.1, alpha: Double = 1.0,
    maxIter: Int = 10, seed: Long = 42L) {
  def key: String = s"rank=$rank,reg=$regParam,alpha=$alpha,iter=$maxIter"
}

object AlsRecommender {

  /** Train on (user_id, item_id[, ...]) interactions; rating = interaction
    * count (implicit confidence). Ids are cast to int (ALS requirement). */
  def train(inter: DataFrame, cfg: AlsConfig = AlsConfig()): ALSModel = {
    val ratings = inter
      .select(col("user_id").cast("int").as("user_id"),
        col("item_id").cast("int").as("item_id"))
      .groupBy("user_id", "item_id")
      .agg(count(lit(1)).cast("float").as("rating"))
    new ALS()
      .setImplicitPrefs(true)
      .setRank(cfg.rank).setRegParam(cfg.regParam).setAlpha(cfg.alpha)
      .setMaxIter(cfg.maxIter).setSeed(cfg.seed)
      .setUserCol("user_id").setItemCol("item_id").setRatingCol("rating")
      .setColdStartStrategy("drop")
      .fit(ratings)
  }

  /** Top-k per user for a user subset: DataFrame[user_id, rk, item_id,
    * score] (reference: to_top_k_encoder + predict, my_merlin_flow.py:
    * 333-345,478-481). */
  def recommend(model: ALSModel, users: DataFrame, k: Int = 10): DataFrame = {
    val u = users.select(col("user_id").cast("int").as("user_id")).distinct()
    model.recommendForUserSubset(u, k)
      .select(col("user_id"), posexplode(col("recommendations")))
      .select(col("user_id"), (col("pos") + 1).cast("int").as("rk"),
        col("col.item_id").as("item_id"), col("col.rating").as("score"))
  }

  /** Grid-search fan-out + model selection: fit every config, evaluate mean
    * recall@k on the validation split, pick the argmax (metric desc, config
    * key asc — deterministic). Returns the winning config, its model, and
    * the per-config metrics. */
  def gridSearch(trainDf: DataFrame, valid: DataFrame, configs: Seq[AlsConfig],
      k: Int = 10): (AlsConfig, ALSModel, Map[String, Double]) = {
    require(configs.nonEmpty, "empty grid")
    val fitted = configs.map { cfg =>
      val model = train(trainDf, cfg)
      val recs = recommend(model, valid.select("user_id"), k)
      val (recall, _) = RankingEval.meanMetrics(RankingEval.perUser(recs, valid, k))
      (cfg, model, recall)
    }
    val best = fitted.maxBy { case (cfg, _, r) => (r, cfg.key) }
    (best._1, best._2, fitted.map { case (cfg, _, r) => cfg.key -> r }.toMap)
  }
}
