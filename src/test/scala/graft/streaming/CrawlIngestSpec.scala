package graft.streaming

import graft.SparkSpecBase
import graft.operators.CorpusPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** The composed streaming crawl pipeline END TO END: html_extract →
  * quality gate → PII redact → token count per micro-batch, then
  * incremental near-dup suppression against the persisted signature
  * index, survivors (with n_tokens) to the sink. Pins batch ≡ stream on
  * the COMPOSED chain and checkpoint-restart exactly-once. */
class CrawlIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private def body(words: Int, tag: String) =
    (Seq("the", "and") ++ (1 to words).map(i => s"$tag$i")).mkString(" ")

  private def page(id: Long, text: String) =
    (id, s"<html><head><title>p$id</title></head><body><!-- c --><p>$text</p></body></html>")

  private val stages = Seq(
    CorpusPipeline.htmlExtract("text"),
    CorpusPipeline.stage("drop_title")(_.drop("title")),
    CorpusPipeline.qualityGate("text", minStopwords = 1),
    CorpusPipeline.piiRedact("text"),
    CorpusPipeline.tokenCount("text"))

  private val pages = Seq(
    page(1L, body(58, "alpha") + " mail me at a@example.com"),
    page(2L, "too short"), // fails the quality gate
    page(3L, body(58, "alpha")), // near-dup of 1 (same core text)
    page(4L, body(58, "beta")))

  test("streamed crawl chain equals the batch composition (composed parity)") {
    implicit val sqlCtx = spark.sqlContext
    val indexPath =
      java.nio.file.Files.createTempDirectory("graft_crawl").toString + "/index"
    val seen = mutable.ArrayBuffer[(Long, String, Int)]()
    val in = MemoryStream[(Long, String)]
    val q = CrawlIngest.start(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", stages, indexPath, shingleN = 4, threshold = 0.5) {
      kept => seen ++= kept.select(col("doc_id"), col("text"), col("n_tokens"))
        .as[(Long, String, Int)].collect()
    }
    in.addData(pages: _*)
    q.processAllAvailable()
    q.stop()
    val batch = CrawlIngest.batch(pages.toDF("doc_id", "text"),
        "doc_id", "text", stages, shingleN = 4, threshold = 0.5)
      .select(col("doc_id"), col("text"), col("n_tokens"))
      .as[(Long, String, Int)].collect().toSeq.sortBy(_._1)
    assert(seen.sortBy(_._1).toSeq == batch,
      "one micro-batch must equal the batch composition row for row")
    val ids = batch.map(_._1)
    assert(ids.contains(1L) && !ids.contains(2L) && !ids.contains(3L) &&
      ids.contains(4L),
      s"gate drops 2, near-dup drops 3, 1 and 4 survive: $ids")
    assert(batch.forall(!_._2.contains("a@example.com")), "PII scrubbed")
    assert(batch.forall(_._3 > 50), "token counts ride through the chain")
  }

  test("later batches dedup against earlier batches via the index") {
    implicit val sqlCtx = spark.sqlContext
    val indexPath =
      java.nio.file.Files.createTempDirectory("graft_crawl2").toString + "/index"
    val seen = mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Long, String)]
    val q = CrawlIngest.start(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", stages, indexPath, shingleN = 4, threshold = 0.5) {
      kept => seen ++= kept.select(col("doc_id")).as[Long].collect()
    }
    in.addData(page(1L, body(58, "alpha")))
    q.processAllAvailable()
    in.addData(page(10L, body(58, "alpha")), page(11L, body(58, "gamma")))
    q.processAllAvailable()
    q.stop()
    assert(seen.sorted.toSeq == Seq(1L, 11L),
      s"doc 10 duplicates batch-1's doc 1 and must be suppressed: $seen")
  }

  test("checkpoint restart resumes exactly-once on the composed chain") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_crawl_ckpt").toString
    val seen = mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Long, String)]
    def startQ() = CrawlIngest.start(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", stages, s"$dir/index", shingleN = 4,
        threshold = 0.5, checkpointDir = Some(s"$dir/ckpt")) {
      kept => seen ++= kept.select(col("doc_id")).as[Long].collect()
    }
    val q1 = startQ()
    in.addData(page(1L, body(58, "alpha")))
    q1.processAllAvailable()
    q1.stop()
    val q2 = startQ()
    in.addData(page(2L, body(58, "delta")))
    q2.processAllAvailable()
    q2.stop()
    assert(seen.sorted.toSeq == Seq(1L, 2L),
      s"restart must neither drop nor re-sink processed docs: $seen")
    val indexed = spark.read.parquet(s"$dir/index")
      .select("doc_id").as[Long].collect().toSeq
    assert(indexed.sorted == Seq(1L, 2L) && indexed.distinct.size == 2,
      s"index must hold each survivor's signatures exactly once: $indexed")
  }
}
