package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BitextMineSpec extends SparkSpecBase {
  import spark.implicits._

  // src vectors lean toward their true pair but the hub (1,1,0) is closer
  // by raw cosine to BOTH; the margin demotes it because the hub's own
  // neighborhood mean is high. Reference math validated in-test.
  private val srcs = Seq((1L, Array(0.9f, 0.55f, 0f)), (2L, Array(0.55f, 0.9f, 0f)))
  private val tgts = Seq((101L, Array(1f, 0f, 0f)), (102L, Array(0f, 1f, 0f)),
    (103L, Array(1f, 1f, 0f)))

  private def cosRef(a: Array[Float], b: Array[Float]): Double = {
    def d(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
    d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
  }

  test("fixture is a real hub scenario: cos argmax is the hub for both sources") {
    for ((_, sv) <- srcs) {
      val byCos = tgts.maxBy { case (_, tv) => cosRef(sv, tv) }
      assert(byCos._1 === 103L, "raw cosine must pick the hub")
    }
  }

  test("margin re-rank recovers the true pairs and demotes the hub") {
    val out = BitextMine.mine(srcs.toDF("doc_id", "vec"),
        tgts.toDF("doc_id", "vec"), "doc_id", "vec", k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out(1L)._1 === 101L && out(2L)._1 === 102L,
      s"margin must pick the aligned target, got $out")
    // hand value: cos(s0,t0)/((meanK(s0)+meanK(t0))/2) ≈ 1.0666
    assert(math.abs(out(1L)._2 - 1.0666) < 2e-3, s"margin value: ${out(1L)._2}")
  }

  test("minMargin threshold filters; k larger than the target side is safe") {
    val all = BitextMine.mine(srcs.toDF("doc_id", "vec"),
      tgts.toDF("doc_id", "vec"), "doc_id", "vec", k = 10)
    assert(all.count() === 2)
    val none = BitextMine.mine(srcs.toDF("doc_id", "vec"),
      tgts.toDF("doc_id", "vec"), "doc_id", "vec", k = 2, minMargin = 2.0)
    assert(none.count() === 0)
  }

  test("deterministic under repartitioning") {
    val a = BitextMine.mine(srcs.toDF("doc_id", "vec").repartition(5),
        tgts.toDF("doc_id", "vec").repartition(3), "doc_id", "vec", k = 2)
      .collect().map(_.toSeq).toSet
    val b = BitextMine.mine(srcs.toDF("doc_id", "vec"),
        tgts.toDF("doc_id", "vec"), "doc_id", "vec", k = 2)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
