package graft.streaming

import graft.SparkSpecBase
import graft.sim.IvfPq
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class VectorIngestSpec extends SparkSpecBase {
  import spark.implicits._

  private def emb = tbl("embeddings").select($"vec_id", $"embedding")

  private lazy val modelPath = {
    val model = IvfPq.fit(emb, "vec_id", "embedding",
      nlist = 8, m = 16, k = 32, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_vi_model").toString
    IvfPq.save(spark, model, dir)
    dir
  }

  private def rowsOf(n: Int, from: Int = 0): Seq[(Long, Seq[Float])] =
    emb.orderBy($"vec_id").limit(from + n).as[(Long, Seq[Float])]
      .collect().toSeq.drop(from)

  test("appended batches match the batch-built index exactly") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_vi").toString
    val in = MemoryStream[(Long, Seq[Float])]
    val q = VectorIngest.start(in.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", modelPath, s"$dir/index")
    in.addData(rowsOf(20): _*)
    q.processAllAvailable()
    in.addData(rowsOf(15, from = 20): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$dir/index")
      .orderBy($"vec_id").select("vec_id", "cid", "code")
      .as[(Long, Int, Seq[Int])].collect().toSeq
    val model = IvfPq.load(spark, modelPath)
    val batch = IvfPq.index(
        emb.orderBy($"vec_id").limit(35), "vec_id", "embedding", model)
      .orderBy($"vec_id").as[(Long, Int, Seq[Int])].collect().toSeq
    assert(streamed == batch,
      "streaming append must encode identically to the batch index build")
  }

  test("checkpoint restart resumes without re-appending processed rows") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_vi_ckpt").toString
    val in = MemoryStream[(Long, Seq[Float])]
    def startQ() = VectorIngest.start(in.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", modelPath, s"$dir/index",
      checkpointDir = Some(s"$dir/ckpt"))
    val q1 = startQ()
    in.addData(rowsOf(10): _*)
    q1.processAllAvailable()
    q1.stop()
    val q2 = startQ()
    in.addData(rowsOf(10, from = 10): _*)
    q2.processAllAvailable()
    q2.stop()
    val ids = spark.read.parquet(s"$dir/index")
      .select("vec_id").as[Long].collect().toSeq
    assert(ids.length == 20 && ids.distinct.length == 20,
      s"restart must not duplicate rows: ${ids.length} rows, ${ids.distinct.length} distinct")
  }

  test("the appended index still prunes unprobed cells at the file level") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_vi_prune").toString
    val in = MemoryStream[(Long, Seq[Float])]
    val q = VectorIngest.start(in.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", modelPath, s"$dir/index")
    in.addData(rowsOf(25): _*)
    q.processAllAvailable()
    in.addData(rowsOf(25, from = 25): _*)
    q.processAllAvailable()
    q.stop()
    val model = IvfPq.load(spark, modelPath)
    val qv = rowsOf(1).head._2.toArray
    val cells = IvfPq.nearestCells(qv, model.centroids, 2)
    val probed = spark.read.parquet(s"$dir/index").filter($"cid".isin(cells: _*))
    probed.collect()
    val scan = probed.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val present = spark.read.parquet(s"$dir/index")
      .select("cid").distinct().as[Int].collect().toSet
    val expected = cells.toSet.intersect(present).size
    assert(scan.selectedPartitions.partitionCount == expected,
      s"expected $expected cid partitions read, got ${scan.selectedPartitions.partitionCount}")
    // and the probed rows serve a top-k end to end
    val top = IvfPq.topK(probed, "vec_id", qv, model, 5, nprobe = 2)
    assert(top.count() == 5)
  }
}
