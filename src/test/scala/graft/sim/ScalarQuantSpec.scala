package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ScalarQuantSpec extends SparkSpecBase {
  import spark.implicits._

  test("encode: codes are floor(x*127/maxabs + 0.5), extremes hit ±127") {
    val df = Seq((1L, Array(2.0f, -4.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = ScalarQuant.encode(df, "vec_id", "embedding").collect().head
    assert(r.getDouble(1) == 4.0)
    assert(r.getSeq[Int](2) == Seq(64, -127, 32, 0)) // 2*127/4+0.5=64.0
  }

  test("encode: the all-zero vector encodes as zero codes, not NaN") {
    val df = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = ScalarQuant.encode(df, "vec_id", "embedding").collect().head
    assert(r.getDouble(1) == 0.0 && r.getSeq[Int](2) == Seq(0, 0))
  }

  test("codes stay within [-127, 127] on the real embeddings") {
    val enc = ScalarQuant.encode(tbl("embeddings"), "vec_id", "embedding")
    val bad = enc.select(explode(col("codes")).as("c"))
      .filter(col("c") > 127 || col("c") < -127).count()
    assert(bad == 0L)
  }

  test("int8 top-10 recall vs exact float KNN >= 0.9 on the embeddings table") {
    val emb = tbl("embeddings")
    val queries = emb.filter(col("vec_id") < 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val enc = ScalarQuant.encode(emb, "vec_id", "embedding").cache()
    val recalls = queries.map { case (qid, q) =>
      // exact baseline scored by raw dot product (the metric int8 preserves)
      val exact = Knn.bruteForceTopK(
          emb.filter(col("vec_id") === qid), emb, "vec_id", "embedding", 10,
          simFn = graft.sql.GraftFunctions.dotF32)
        .select(col("neighbor_id")).as[Long].collect().toSet
      val approx = ScalarQuant.topK(enc.filter(col("vec_id") =!= qid), "vec_id", q, 10)
        .select(col("vec_id")).as[Long].collect().toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    enc.unpersist()
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean recall@10 = $mean")
  }

  test("scoring is the exact integer dot: DotF32 over codes matches a driver-side Long dot") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.125f)),
      (2L, Array(-1.0f, 1.0f, 0.0f, 0.5f))).toDF("vec_id", "embedding")
    val enc = ScalarQuant.encode(df, "vec_id", "embedding")
    val q = Array(0.5f, 0.5f, -0.25f, 1.0f)
    val got = ScalarQuant.topK(enc, "vec_id", q, 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // replicate driver-side with exact Long arithmetic
    val qMax = q.map(x => math.abs(x.toDouble)).max
    val qc = q.map(x => math.floor(x * 127.0 / qMax + 0.5).toLong)
    val expect = enc.collect().map { r =>
      val codes = r.getSeq[Int](2).map(_.toLong)
      val intdot = codes.zip(qc).map { case (a, b) => a * b }.sum
      r.getLong(0) -> intdot * (r.getDouble(1) * (qMax / (127.0 * 127.0)))
    }.toMap
    got.foreach { case (id, s) => assert(s == expect(id), s"id $id: $s != ${expect(id)}") }
  }
}
