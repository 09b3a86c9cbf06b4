package graft.rank

import graft.SparkSpecBase
import org.apache.spark.mllib.evaluation.RankingMetrics
import org.apache.spark.sql.functions._

class RecommenderSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val inter = Interactions.fromStar(spark, sfDir)
  private lazy val split = Interactions.splitByTime(inter, "2000-01-01")

  test("ALS trains, recommends k ranked items per user, and is seed-deterministic") {
    val (tr, te) = split
    val cfg = AlsConfig(rank = 8, maxIter = 3, seed = 7L)
    val users = te.select("user_id").distinct().limit(50)
    val r1 = AlsRecommender.recommend(AlsRecommender.train(tr, cfg), users, 5)
    val r2 = AlsRecommender.recommend(AlsRecommender.train(tr, cfg), users, 5)
    assert(r1.count() > 0)
    assert(r1.groupBy("user_id").count().filter($"count" > 5).count() == 0)
    // same seed, same data -> identical item rankings
    assert(r1.select("user_id", "rk", "item_id")
      .exceptAll(r2.select("user_id", "rk", "item_id")).isEmpty)
  }

  test("RankingEval matches mllib RankingMetrics (recall@k mean and ndcg@k mean)") {
    val (tr, te) = split
    val nb = Cooccur.itemNeighbors(tr, 50)
    val recs = Cooccur.recommend(tr, nb, 10)
    val (recall, ndcg) = RankingEval.meanMetrics(RankingEval.perUser(recs, te, 10))

    val predByUser = recs.groupBy("user_id")
      .agg(transform(sort_array(collect_list(struct($"rk", $"item_id"))),
        x => x.getField("item_id")).as("pred"))
    val truthByUser = te.select($"user_id", $"item_id").distinct()
      .groupBy("user_id").agg(collect_list($"item_id").as("truth"))
    val joined = truthByUser.join(predByUser, Seq("user_id"), "left")
      .select(coalesce($"pred", array()).as("pred"), $"truth")
      .as[(Array[Long], Array[Long])]
      .rdd.map { case (p, t) => (p.map(_.toDouble), t.map(_.toDouble)) }
    val rm = new RankingMetrics(joined)
    assert(math.abs(rm.recallAt(10) - recall) < 1e-9, s"recall ${rm.recallAt(10)} vs $recall")
    assert(math.abs(rm.ndcgAt(10) - ndcg) < 1e-9, s"ndcg ${rm.ndcgAt(10)} vs $ndcg")
  }

  test("grid search selects the best validation recall deterministically (F10/F11)") {
    val (tr, te) = split
    val grid = Seq(
      AlsConfig(rank = 4, maxIter = 2, seed = 7L),
      AlsConfig(rank = 8, maxIter = 2, seed = 7L))
    val (best, _, metrics) = AlsRecommender.gridSearch(tr, te, grid, k = 10)
    assert(metrics.size == 2)
    assert(metrics(best.key) == metrics.values.max)
  }

  test("train fails loudly on ids past 2^31 instead of silently truncating") {
    val wide = Seq((3_000_000_000L, 1L), (3_000_000_001L, 2L), (5L, 1L))
      .toDF("user_id", "item_id")
    val e = intercept[Exception] {
      AlsRecommender.train(wide, AlsConfig(rank = 2, maxIter = 1))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("trainEncoded")),
      s"expected the id-contract error, got: $e")

    // fractional numeric ids must ALSO fail loudly, not truncate-and-merge
    val frac = Seq((2.4, 1L), (2.7, 2L), (5.0, 1L)).toDF("user_id", "item_id")
    val e2 = intercept[Exception] {
      AlsRecommender.train(frac, AlsConfig(rank = 2, maxIter = 1))
    }
    assert(messages(e2).exists(_.contains("trainEncoded")),
      s"fractional ids must raise, got: $e2")
  }

  test("trainEncoded drops null keys instead of training a phantom OOV id 0") {
    val withNulls = Seq(
      (Some(1L), Some(10L)), (Some(1L), Some(11L)), (Some(2L), Some(10L)),
      (Some(2L), Some(11L)), (None, Some(10L)), (Some(3L), None))
      .toDF("user_id", "item_id")
    val em = AlsRecommender.trainEncoded(withNulls, AlsConfig(rank = 2, maxIter = 2))
    // dictionaries contain only real keys; no phantom id-0 rows survive
    assert(em.userDict.select("value").as[Long].collect().toSet == Set(1L, 2L))
    assert(em.itemDict.select("value").as[Long].collect().toSet == Set(10L, 11L))
    val recs = AlsRecommender.recommendDecoded(em, withNulls.select("user_id"), 5)
    assert(recs.filter($"user_id".isNull || $"item_id".isNull).count() == 0)
  }

  test("trainEncoded round-trips natural keys past 2^31 (and persists)") {
    // UUID-ish wide keys on BOTH sides; derived from the real interaction
    // structure so ALS has signal to fit
    val (tr, te) = split
    val base = 10_000_000_000L
    val wide = tr.select(($"user_id" + base).as("user_id"),
      ($"item_id" * 1_000_000_007L).as("item_id"))
    val em = AlsRecommender.trainEncoded(wide, AlsConfig(rank = 8, maxIter = 3, seed = 7L))
    val users = te.select(($"user_id" + base).as("user_id")).distinct().limit(50)
    val recs = AlsRecommender.recommendDecoded(em, users, 5)
    assert(recs.count() > 0)
    // every decoded key is a genuine natural key, none are truncated ints
    val validUsers = wide.select($"user_id").distinct()
    val validItems = wide.select($"item_id").distinct()
    assert(recs.join(validUsers, Seq("user_id"), "left_anti").count() == 0)
    assert(recs.select($"item_id".as("item_id"))
      .join(validItems, Seq("item_id"), "left_anti").count() == 0)
    assert(recs.groupBy("user_id").count().filter($"count" > 5).count() == 0)

    // persistence: save -> load -> identical recommendations
    val dir = java.nio.file.Files.createTempDirectory("graft_als").toString
    em.save(dir)
    val reloaded = EncodedAlsModel.load(spark, dir)
    val recs2 = AlsRecommender.recommendDecoded(reloaded, users, 5)
    assert(recs.select("user_id", "rk", "item_id")
      .exceptAll(recs2.select("user_id", "rk", "item_id")).isEmpty)
  }

  test("cooccur recommender never recommends already-seen items") {
    val (tr, _) = split
    val nb = Cooccur.itemNeighbors(tr, 50)
    val recs = Cooccur.recommend(tr, nb, 10)
    val seen = tr.select($"user_id", $"item_id").distinct()
    assert(recs.join(seen, Seq("user_id", "item_id"), "left_semi").count() == 0)
  }
}
