package graft.rank

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.features.Categorify

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

/** A fitted ALS model plus the Categorify dictionaries that map natural
  * user/item keys to its int ids — the persistable unit of the encoded
  * path. `save`/`load` lay the three artifacts side by side. */
case class EncodedAlsModel(model: ALSModel, userDict: DataFrame, itemDict: DataFrame) {
  def save(path: String): Unit = {
    AlsRecommender.saveModel(model, s"$path/als")
    userDict.write.mode("overwrite").parquet(s"$path/unique.user_id.parquet")
    itemDict.write.mode("overwrite").parquet(s"$path/unique.item_id.parquet")
  }
}

object EncodedAlsModel {
  def load(spark: SparkSession, path: String): EncodedAlsModel =
    EncodedAlsModel(AlsRecommender.loadModel(spark, s"$path/als"),
      spark.read.parquet(s"$path/unique.user_id.parquet"),
      spark.read.parquet(s"$path/unique.item_id.parquet"))
}

object AlsRecommender {

  /** spark.ml ALS requires int ids; a silent cast would CORRUPT natural
    * keys past 2³¹ (the reference's customer keys are UUID-ish,
    * upload_to_snowflake.py:50). This guard raises per-row inside codegen —
    * no extra pass over the data — and points callers at trainEncoded. */
  private def toIntId(c: Column, name: String): Column = {
    val asLong = c.cast("long")
    // the double round-trip also catches FRACTIONAL numeric ids (2.7 would
    // otherwise truncate to 2 and merge users silently): both sides lose
    // the same precision for integral values, so only a dropped fraction
    // differs
    when(c.isNotNull &&
        (asLong.isNull || asLong > Int.MaxValue || asLong < Int.MinValue ||
          asLong.cast("double") =!= c.cast("double")),
      raise_error(concat(
        lit(s"$name does not fit ALS's int ids (use trainEncoded): "),
        c.cast("string"))))
      .otherwise(asLong).cast("int")
  }

  /** Train on (user_id, item_id[, ...]) interactions; rating = interaction
    * count (implicit confidence). Ids must fit int (ALS requirement) — rows
    * outside the range fail loudly; for UUID-ish or >2³¹ keys use
    * `trainEncoded`. */
  def train(inter: DataFrame, cfg: AlsConfig = AlsConfig()): ALSModel = {
    val ratings = inter
      .select(toIntId(col("user_id"), "user_id").as("user_id"),
        toIntId(col("item_id"), "item_id").as("item_id"))
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
    * 333-345,478-481).
    *
    * No TopKAggF here (round-10 audit): recommendForUserSubset is
    * spark.ml's blocked-BLAS top-k — factor blocks are cross-scored with
    * a bounded priority queue INSIDE each block pair and only k
    * candidates per (user, item-block) survive to its aggregation, so
    * the candidate set never materializes; there is no per-group window
    * to replace. */
  def recommend(model: ALSModel, users: DataFrame, k: Int = 10): DataFrame = {
    val u = users.select(col("user_id").cast("int").as("user_id")).distinct()
    model.recommendForUserSubset(u, k)
      .select(col("user_id"), posexplode(col("recommendations")))
      .select(col("user_id"), (col("pos") + 1).cast("int").as("rk"),
        col("col.item_id").as("item_id"), col("col.rating").as("score"))
  }

  /** Model persistence (spark.ml native format — factor tables as parquet,
    * loadable on any cluster). */
  def saveModel(model: ALSModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadModel(spark: SparkSession, path: String): ALSModel =
    ALSModel.load(path)

  /** ALS over NATURAL keys of any type/width: Categorify-encode user/item
    * ids to contiguous ints (dictionary cardinality always fits int long
    * before raw keys do), train on the encoded ids, decode recommendations
    * back through the same dictionaries. The dictionaries are the id
    * contract — distributed, joinable, persisted beside the factors. */
  def trainEncoded(inter: DataFrame, cfg: AlsConfig = AlsConfig()): EncodedAlsModel = {
    // Null keys would all encode to OOV id 0 (dictionaries are fit on
    // non-null values only), training a phantom user/item 0 whose
    // recommendations then DECODE to null — drop them up front, matching
    // the loud-failure posture of the plain path.
    val clean = inter.filter(col("user_id").isNotNull && col("item_id").isNotNull)
    val userDict = Categorify.fitDictionary(clean, "user_id")
    val itemDict = Categorify.fitDictionary(clean, "item_id")
    val enc = Categorify.encode(
        Categorify.encode(clean, "user_id", userDict, "__u"),
        "item_id", itemDict, "__i")
      .select(col("__u").as("user_id"), col("__i").as("item_id"))
    EncodedAlsModel(train(enc, cfg), userDict, itemDict)
  }

  /** Top-k per user with natural keys in and out. Unknown users (OOV id 0)
    * have no factors and produce no rows — same cold-start contract as
    * recommend's coldStartStrategy=drop. */
  def recommendDecoded(em: EncodedAlsModel, users: DataFrame, k: Int = 10): DataFrame = {
    val encUsers = Categorify.encode(users.select(col("user_id")),
        "user_id", em.userDict, "__u")
      .filter(col("__u") > 0)
      .select(col("__u").as("user_id"))
    val recs = recommend(em.model, encUsers, k)
    val u = Categorify.decode(recs, "user_id", em.userDict, "__nu")
    val ui = Categorify.decode(u, "item_id", em.itemDict, "__ni")
    ui.select(col("__nu").as("user_id"), col("rk"),
      col("__ni").as("item_id"), col("score"))
  }

  /** Grid-search fan-out + model selection: fit every config, evaluate mean
    * recall@k on the validation split, pick the argmax (metric desc, config
    * key asc — deterministic). Returns the winning config, its model, and
    * the per-config metrics.
    *
    * Configs fit CONCURRENTLY on a driver thread pool (round 10, F10
    * parity with the reference's Metaflow foreach --max-workers 4 and
    * with TwoTower.gridSearch): ALS fits are seeded-deterministic
    * regardless of job scheduling, results are collected in grid order,
    * so the winner never sees thread timing. */
  def gridSearch(trainDf: DataFrame, valid: DataFrame, configs: Seq[AlsConfig],
      k: Int = 10, maxWorkers: Int = 4): (AlsConfig, ALSModel, Map[String, Double]) = {
    require(configs.nonEmpty, "empty grid")
    require(maxWorkers > 0, s"maxWorkers must be positive, got $maxWorkers")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(maxWorkers, configs.size))
    val fitted =
      try {
        val futures = configs.map { cfg =>
          pool.submit(new java.util.concurrent.Callable[(AlsConfig, ALSModel, Double)] {
            override def call(): (AlsConfig, ALSModel, Double) = {
              val model = train(trainDf, cfg)
              val recs = recommend(model, valid.select("user_id"), k)
              val (recall, _) =
                RankingEval.meanMetrics(RankingEval.perUser(recs, valid, k))
              (cfg, model, recall)
            }
          })
        }
        try futures.map(_.get())
        catch {
          // round-10 advice (same as TwoTower.gridSearch): rethrow the
          // fit's own exception, not the ExecutionException wrapper, and
          // stop sibling fits instead of leaking pool threads
          case e: java.util.concurrent.ExecutionException =>
            futures.foreach(_.cancel(true))
            pool.shutdownNow()
            throw Option(e.getCause).getOrElse(e)
        }
      } finally pool.shutdown()
    val best = fitted.maxBy { case (cfg, _, r) => (r, cfg.key) }
    (best._1, best._2, fitted.map { case (cfg, _, r) => cfg.key -> r }.toMap)
  }
}
