package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpecBase {
  import spark.implicits._

  test("IVF ANN reaches recall@5 >= 0.5 vs the exact baseline (sf0.01)") {
    val emb = tbl("embeddings", sfDirMid)
    val queries = emb.filter($"vec_id" < 32)
    val exact = Knn.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id")
    val approx = Ivf.topK(emb, "vec_id", "embedding", k = 5, nlist = 8, nprobe = 3)
      .filter($"query_id" < 32)
      .select($"query_id", $"neighbor_id")
    val hits = exact.intersect(approx).count().toDouble
    val recall = hits / exact.count()
    assert(recall >= 0.5, s"recall@5 was $recall")
  }

  test("IVF cells prune the pair space (probed work well below brute force)") {
    val emb = tbl("embeddings", sfDirMid)
    val n = emb.count()
    val centroids = Ivf.fitCentroids(emb, "vec_id", "embedding", nlist = 8)
    val pairSpace = emb
      .select(Ivf.nearestCell($"embedding", centroids).as("cid"))
      .groupBy("cid").count().agg(sum($"count" * $"count")).as[Long].head()
    assert(pairSpace < n * n / 2, s"cell pair space $pairSpace vs ${n * n}")
  }

  test("cell assignment is deterministic and ties break on the lower cid") {
    val emb = tbl("embeddings", sfDirMid)
    val centroids = Ivf.fitCentroids(emb, "vec_id", "embedding", nlist = 4)
    val a1 = emb.select($"vec_id", Ivf.nearestCell($"embedding", centroids).as("cid"))
    val a2 = emb.select($"vec_id", Ivf.nearestCell($"embedding", centroids).as("cid"))
    assert(a1.exceptAll(a2).isEmpty)
    // duplicated centroid -> every vector equidistant to both copies; the
    // argmin must always pick the lower cid
    val dup = Array(centroids(0), centroids(0))
    val cids = emb.select(Ivf.nearestCell($"embedding", dup).as("cid"))
      .distinct().as[Int].collect().toSet
    assert(cids == Set(0), s"tie-break must pick cid 0, got $cids")
  }

  test("probeCells returns nprobe distinct cells led by the nearest") {
    val emb = tbl("embeddings", sfDirMid)
    val centroids = Ivf.fitCentroids(emb, "vec_id", "embedding", nlist = 8)
    val out = emb.select(
      Ivf.nearestCell($"embedding", centroids).as("c0"),
      Ivf.probeCells($"embedding", centroids, 3).as("probes"))
    assert(out.filter(element_at($"probes", 1) =!= $"c0").count() == 0)
    assert(out.filter(size(array_distinct($"probes")) =!= 3).count() == 0)
  }
}
