package graft.rank

import graft.SparkSpecBase
import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Cooccur's shuffle-collapsed plan (marker-row union instead of an anti
  * join) must be observationally identical to the textbook formulation. */
class CooccurSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val tr =
    Interactions.splitByTime(Interactions.fromStar(spark, sfDir), "2000-01-01")._1

  test("recommend equals the naive score-then-anti-join formulation") {
    val nb = Cooccur.itemNeighbors(tr, 20)
    val fast = Cooccur.recommend(tr, nb, 10)

    val t = tr.select($"user_id", $"item_id").distinct()
    val scores = t.join(nb, t("item_id") === nb("item_a"))
      .groupBy($"user_id", $"item_b").agg(sum($"c").as("score"))
    val unseen = scores.join(t.withColumnRenamed("item_id", "item_b"),
      Seq("user_id", "item_b"), "left_anti")
    val naive = Relational.topKPerGroup(unseen, Seq("user_id"),
        Seq($"score".desc, $"item_b".asc), 10)
      .select($"user_id", $"rk", $"item_b".as("item_id"), $"score")

    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("itemNeighbors caps each item at M neighbors, ordered by count desc") {
    val nb = Cooccur.itemNeighbors(tr, 5)
    assert(nb.groupBy("item_a").count().filter($"count" > 5).count() == 0)
    val worst = nb.join(
      nb.groupBy($"item_a".as("ia")).agg(min($"c").as("mn")),
      nb("item_a") === $"ia")
    // every kept neighbor's count >= the item's own cutoff by construction;
    // spot check: counts are positive and ordering column exists
    assert(worst.filter($"c" < $"mn").count() == 0)
    assert(nb.filter($"c" <= 0).count() == 0)
  }

  test("recommendations from a materialized model equal the inline-lineage ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nb").toString
    RetrievalPipeline.fitAndSave(tr, s"$dir/nb", maxNeighbors = 20)
    val fromModel = RetrievalPipeline.recommendFrom(spark, s"$dir/nb", tr, 10)
    val inline = Cooccur.recommend(tr, Cooccur.itemNeighbors(tr, 20), 10)
    assert(fromModel.exceptAll(inline).isEmpty && inline.exceptAll(fromModel).isEmpty)
  }

  test("popularFallback list is ordered by popularity then item id") {
    val fb = graft.serve.RecsTable.popularFallback(tr, 5)
    val row = fb.head()
    assert(row.getString(0) == "no_user")
    val recs = row.getSeq[String](1)
    assert(recs.size == 5 && recs.distinct.size == 5)
    val counts = tr.select($"user_id", $"item_id").distinct()
      .groupBy($"item_id").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"item_id".asc).limit(5)
      .select($"item_id".cast("string")).as[String].collect().toSeq
    assert(recs == counts)
  }
}
