package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class VecCentroidAggSpec extends SparkSpecBase {
  import spark.implicits._

  test("per-group centroid equals the element-wise mean") {
    val df = Seq(
      ("a", Array(1f, 2f)), ("a", Array(3f, 4f)), ("b", Array(10f, 20f)))
      .toDF("label", "vec")
    val out = df.groupBy("label")
      .agg(VecCentroidAgg.centroid($"vec").as("c"))
      .as[(String, Array[Float])].collect().toMap
    assert(out("a").toSeq == Seq(2f, 3f))
    assert(out("b").toSeq == Seq(10f, 20f))
  }

  test("centroid is partitioning-invariant (merge associativity)") {
    val emb = tbl("embeddings").select($"label", $"embedding")
    val c1 = emb.repartition(1).groupBy("label")
      .agg(VecCentroidAgg.centroid($"embedding").as("c"))
    val c8 = emb.repartition(8).groupBy("label")
      .agg(VecCentroidAgg.centroid($"embedding").as("c"))
    val m1 = c1.as[(Int, Array[Float])].collect().toMap
    val m8 = c8.as[(Int, Array[Float])].collect().toMap
    assert(m1.keySet == m8.keySet)
    // float sums are order-sensitive only in the last ulp; centroids of the
    // double-accumulated sums must agree to float precision
    m1.foreach { case (k, v) =>
      v.zip(m8(k)).foreach { case (a, b) => assert(math.abs(a - b) <= 1e-4f) }
    }
  }

  test("FillMissing transformer fills nulls in a pipeline-compatible way") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    val out = new graft.features.FillMissing()
      .setInputCols(Array("x")).setFillValue(0.0)
      .transform(df)
    assert(out.filter($"x".isNull).count() == 0)
    assert(out.agg(sum("x")).as[Double].head() == 4.0)
  }
}
