package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Quantization drift — the trade VectorIngest documents: codebooks fitted
  * on yesterday's distribution encode today's drifted vectors with higher
  * error, so ADC recall degrades until an offline refit. This spec turns
  * the doc sentence into numbers: the SAME drifted batch, encoded with the
  * stale vs the refit model, full-ADC recall@10 vs exact inner-product
  * ground truth (full scan, so routing error is excluded — pure
  * quantization effect). Everything is deterministic: fixed fixture,
  * deterministic k-means init, exact arithmetic.
  */
class PqDriftSpec extends SparkSpecBase {
  import spark.implicits._

  private def emb = tbl("embeddings").select($"vec_id", $"embedding")

  // "today": a deterministic distribution shift — squash + offset the
  // first half of the dimensions
  private def drifted = emb.select($"vec_id",
    transform($"embedding", (x, i) =>
      when(i < 32, x * lit(0.5f) + lit(0.8f)).otherwise(x))
      .cast(ArrayType(FloatType)).as("embedding"))

  private def meanRecall(books: Array[Array[Array[Float]]]): Double = {
    val all = drifted.as[(Long, Seq[Float])].collect()
    val enc = Pq.encode(drifted, "vec_id", "embedding", books).cache()
    val queries = all.sortBy(_._1).take(5)
    val recalls = queries.map { case (qid, qv) =>
      val exact = all.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, v.indices.foldLeft(0.0)((a, i) => a + v(i).toDouble * qv(i).toDouble)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val adc = Pq.adcTopK(enc.filter($"vec_id" =!= qid), "vec_id",
        qv.toArray, books, 10).select("vec_id").as[Long].collect().toSet
      exact.intersect(adc).size / 10.0
    }
    enc.unpersist()
    recalls.sum / recalls.length
  }

  test("stale codebooks lose recall on a drifted batch; a refit recovers it") {
    val stale = Pq.fitCodebooks(emb, "vec_id", "embedding", m = 16, k = 32, iters = 2)
    val fresh = Pq.fitCodebooks(drifted, "vec_id", "embedding", m = 16, k = 32, iters = 2)
    val staleRecall = meanRecall(stale)
    val freshRecall = meanRecall(fresh)
    info(f"drifted-batch ADC recall@10: stale $staleRecall%.2f vs refit $freshRecall%.2f")
    // the refit trigger rationale: refitting on the drifted distribution
    // must recover recall the stale model lost
    assert(freshRecall >= staleRecall,
      s"refit must not recall worse than stale: $freshRecall < $staleRecall")
    assert(freshRecall - staleRecall >= 0.05,
      s"fixture shift should show a measurable drift penalty " +
        s"(stale $staleRecall, refit $freshRecall)")
    // and the stale model still serves — degraded, not broken
    assert(staleRecall >= 0.1, s"stale recall collapsed entirely: $staleRecall")
  }
}
