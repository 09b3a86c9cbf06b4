package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.collection.mutable

class DocIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"

  private def freshDirs() = {
    val d = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    (s"$d/index", s"$d/out")
  }

  test("later batches dedup against earlier batches through the index") {
    implicit val sqlCtx = spark.sqlContext
    val (indexPath, _) = freshDirs()
    val seen = mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Long, String)]
    val q = DocIngest.start(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", indexPath, shingleN = 4, threshold = 0.5) { kept =>
      seen ++= kept.select("doc_id").as[Long].collect()
    }
    in.addData((1L, base), (2L, "one two three four five six seven eight"))
    q.processAllAvailable()
    assert(seen.sorted.toSeq == Seq(1L, 2L))
    // batch 2: a near-dup of doc 1 (tail word changed), plus novel content
    in.addData((10L, base + " nu"),
      (11L, "totally different words with no overlap whatsoever in sight"))
    q.processAllAvailable()
    q.stop()
    assert(seen.sorted.toSeq == Seq(1L, 2L, 11L))
    // the index holds signatures for every surviving doc
    val idx = spark.read.parquet(indexPath)
    assert(idx.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 11L))
  }

  test("within-batch near-dups collapse before touching the index") {
    implicit val sqlCtx = spark.sqlContext
    val (indexPath, _) = freshDirs()
    val seen = mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Long, String)]
    val q = DocIngest.start(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", indexPath, shingleN = 4, threshold = 0.5) { kept =>
      seen ++= kept.select("doc_id").as[Long].collect()
    }
    // two near-identical docs in ONE batch: smaller id wins
    in.addData((5L, base), (6L, base + " omega"))
    q.processAllAvailable()
    q.stop()
    assert(seen.sorted.toSeq == Seq(5L))
    assert(spark.read.parquet(indexPath).count() == 1)
  }

  test("docs too short to shingle pass through and never poison the index") {
    implicit val sqlCtx = spark.sqlContext
    val (indexPath, _) = freshDirs()
    val seen = mutable.ArrayBuffer[Long]()
    val in = MemoryStream[(Long, String)]
    val q = DocIngest.start(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", indexPath, shingleN = 4, threshold = 0.5) { kept =>
      seen ++= kept.select("doc_id").as[Long].collect()
    }
    in.addData((1L, "too short"), (2L, base))
    q.processAllAvailable()
    in.addData((3L, "also tiny"))
    q.processAllAvailable()
    q.stop()
    assert(seen.sorted.toSeq == Seq(1L, 2L, 3L))
    // index only carries shingle-able docs
    assert(spark.read.parquet(indexPath).count() == 1)
  }
}
