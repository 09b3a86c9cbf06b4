package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2 to a
  * DataFrame program over the test tables; `oracleSql` carries the
  * DuckDB-equivalent SQL for the driver's correctness gate. Query groups
  * live under graft.queries.*; the operator implementations they exercise
  * live under graft.operators / graft.features / graft.functions / etc.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarQueries.defs("q03_join3_revenue")(spark, "/root/testdata/sf0.001")

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (StarQueries.defs, StarQueries.oracles),
      (EventQueries.defs, EventQueries.oracles),
      (TextQueries.defs, TextQueries.oracles),
      (VectorQueries.defs, VectorQueries.oracles),
      (RankQueries.defs, RankQueries.oracles),
      (DagQueries.defs, DagQueries.oracles),
      (MultimodalQueries.defs, MultimodalQueries.oracles))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)

  /** Bench-only programs with no DuckDB-expressible oracle (model training /
    * approximate retrieval); correctness for these lives in the ScalaTest
    * suite (see graft.rank.RecommenderSpec). Run by Bench, not Verify.
    */
  def benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ALS train + per-user top-10 + ranking eval, end to end (F9/F12).
    "q60_als_retrieval" -> { (s, d) =>
      import graft.rank._
      val (tr, te) = Interactions.splitByTime(Interactions.fromStar(s, d), "2000-01-01")
      val model = AlsRecommender.train(tr, AlsConfig(rank = 16, maxIter = 5))
      val recs = AlsRecommender.recommend(model, te.select("user_id"), 10)
      RankingEval.perUser(recs, te, 10)
    },
    // IVF coarse-quantized ANN (k-means cells + probed exact rerank) — the
    // clustered scale path beside the SRP-LSH tables of q43; recall vs the
    // exact baseline asserted in IvfSpec.
    "q61_ivf_ann" -> { (s, d) =>
      graft.sim.Ivf.topK(graft.Tables.load(s, d, "embeddings"),
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 2)
    })
}
