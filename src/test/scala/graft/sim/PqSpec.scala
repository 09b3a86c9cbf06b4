package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpecBase {
  import spark.implicits._

  private def emb = tbl("embeddings").select($"vec_id", $"embedding")
  // m=16 (4-dim subspaces) × k=32 codewords: 64 B/vec instead of 256 B,
  // mean ADC recall@10 = 0.6 on the fixture (verified against an
  // independent numpy reference implementation — identical recalls)
  private val m = 16
  private val k = 32

  private lazy val books = Pq.fitCodebooks(emb, "vec_id", "embedding", m, k, iters = 2)

  test("codes are m entries in [0, k) and use more than one codeword") {
    val enc = Pq.encode(emb, "vec_id", "embedding", books)
    val codes = enc.select(explode($"code").as("c"))
    assert(enc.select(size($"code")).distinct().as[Int].collect().toSeq == Seq(m))
    val range = codes.agg(min($"c"), max($"c")).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) < k)
    assert(codes.distinct().count() > 1, "degenerate codebook: every code identical")
  }

  test("encoding is a pure projection: zero exchanges") {
    val p = Pq.encode(emb, "vec_id", "embedding", books)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"encode must not shuffle:\n$p")
  }

  test("codebook fit is deterministic") {
    val again = Pq.fitCodebooks(emb, "vec_id", "embedding", m, k, iters = 2)
    assert(books.flatten.flatten.toSeq == again.flatten.flatten.toSeq)
  }

  test("ADC top-k recalls the exact dot-product top-k; rerank only improves it") {
    val enc = Pq.encode(emb, "vec_id", "embedding", books).cache()
    val all = emb.as[(Long, Seq[Float])].collect()
    val queries = all.sortBy(_._1).take(5)
    val (adcRecalls, rerankRecalls) = queries.map { case (qid, qv) =>
      val exact = all.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, v.indices.foldLeft(0.0)((a, i) => a + v(i).toDouble * qv(i).toDouble)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      val adc = Pq.adcTopK(enc.filter($"vec_id" =!= qid), "vec_id",
          qv.toArray, books, 10)
        .select("vec_id").as[Long].collect().toSet
      val reranked = Pq.adcTopKRerank(emb.filter($"vec_id" =!= qid), "vec_id",
          "embedding", enc.filter($"vec_id" =!= qid), qv.toArray, books, 10)
        .select("vec_id").as[Long].collect().toSet
      (exact.intersect(adc).size / 10.0, exact.intersect(reranked).size / 10.0)
    }.unzip
    enc.unpersist()
    val meanAdc = adcRecalls.sum / adcRecalls.length
    val meanRr = rerankRecalls.sum / rerankRecalls.length
    assert(meanAdc >= 0.5, s"mean ADC recall@10 too low: $meanAdc (${adcRecalls.toSeq})")
    assert(meanRr >= meanAdc,
      s"exact rerank must not lose recall: $meanRr < $meanAdc")
  }

  test("ADC score approximates the exact dot product") {
    val enc = Pq.encode(emb, "vec_id", "embedding", books)
    val (qid, qv) = emb.as[(Long, Seq[Float])].head()
    val adc = Pq.adcTopK(enc, "vec_id", qv.toArray, books, 1)
      .filter($"vec_id" === qid)
    // the query's own vector should score near its true self-similarity:
    // with a fitted codebook, quantization error is bounded, not wild
    val exactSelf = qv.indices.foldLeft(0.0)((a, i) => a + qv(i).toDouble * qv(i).toDouble)
    val adcSelf = Pq.encode(emb.filter($"vec_id" === qid), "vec_id", "embedding", books)
      .select(Pq.adcScore($"code", Pq.lutFor(qv.toArray, books)).as("a"))
      .head().getDouble(0)
    assert(math.abs(adcSelf - exactSelf) / math.max(exactSelf, 1e-9) < 0.5,
      s"ADC self-similarity $adcSelf vs exact $exactSelf")
  }

  test("fit rejects a dimension not divisible by m") {
    intercept[IllegalArgumentException] {
      Pq.fitCodebooks(emb, "vec_id", "embedding", m = 7, k = 4, iters = 1)
    }
  }

  test("codebooks round-trip through parquet bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_books").toString
    Pq.saveCodebooks(spark, books, dir)
    val reloaded = Pq.loadCodebooks(spark, dir)
    assert(reloaded.length == m && reloaded.forall(_.length == k))
    assert(reloaded.map(_.map(_.toSeq).toSeq).toSeq ==
      books.map(_.map(_.toSeq).toSeq).toSeq,
      "reloaded codebooks differ from fitted ones")
    // encoding with the reloaded books is identical — a restart serves
    // the same codes with no refit
    val a = Pq.encode(emb, "vec_id", "embedding", books)
      .orderBy($"vec_id").as[(Long, Seq[Int])].collect().toSeq
    val b = Pq.encode(emb, "vec_id", "embedding", reloaded)
      .orderBy($"vec_id").as[(Long, Seq[Int])].collect().toSeq
    assert(a == b)
  }
}
