package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpecBase {
  import spark.implicits._

  private def emb = tbl("embeddings").select($"vec_id", $"embedding")
  private lazy val model = IvfPq.fit(emb, "vec_id", "embedding",
    nlist = 8, m = 16, k = 32, iters = 2)
  private lazy val idx = IvfPq.index(emb, "vec_id", "embedding", model).cache()

  test("index build is a pure projection: zero exchanges") {
    val p = IvfPq.index(emb, "vec_id", "embedding", model)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"index build must not shuffle:\n$p")
  }

  test("a cid-partitioned index layout prunes unprobed cells at the file level") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_idx").toString
    IvfPq.index(emb, "vec_id", "embedding", model)
      .write.partitionBy("cid").mode("overwrite").parquet(dir)
    val (_, qv) = emb.as[(Long, Seq[Float])].head()
    val cells = IvfPq.nearestCells(qv.toArray, model.centroids, 2)
    val probed = spark.read.parquet(dir).filter($"cid".isin(cells: _*))
    probed.collect()
    val scan = probed.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    // partition pruning is visible both in the plan and in the scan metrics
    assert(scan.toString.contains("PartitionFilters"),
      s"probe filter did not reach partition pruning:\n$scan")
    assert(scan.selectedPartitions.partitionCount == cells.length,
      s"expected ${cells.length} partitions read, got ${scan.selectedPartitions.partitionCount}")
  }

  test("probing prunes the corpus to the probed cells only") {
    val (_, qv) = emb.as[(Long, Seq[Float])].head()
    val cells = IvfPq.nearestCells(qv.toArray, model.centroids, 2)
    assert(cells.length == 2 && cells.distinct.length == 2)
    val probedRows = idx.filter($"cid".isin(cells: _*)).count()
    assert(probedRows < idx.count(), "probe must restrict the candidate set")
  }

  test("driver-side probe ranking matches the IvfProbeF32 expression") {
    val qs = emb.limit(10).as[(Long, Seq[Float])].collect()
    qs.foreach { case (id, qv) =>
      val driver = IvfPq.nearestCells(qv.toArray, model.centroids, 3)
      val expr = emb.filter($"vec_id" === id)
        .select(Ivf.probeCells($"embedding", model.centroids, 3).as("p"))
        .head().getSeq[Int](0).toSeq
      assert(driver == expr, s"probe mismatch for vec $id: $driver vs $expr")
    }
  }

  test("probing every cell IS the full ADC scan; fewer probes trade recall for work") {
    val all = emb.as[(Long, Seq[Float])].collect()
    val queries = all.sortBy(_._1).take(5)
    val (fullEq, routed, reranked) = queries.map { case (qid, qv) =>
      val exact = all.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, v.indices.foldLeft(0.0)((a, i) => a + v(i).toDouble * qv(i).toDouble)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      def recall(ids: Set[Long]) = exact.intersect(ids).size / 10.0
      val fullAdc = Pq.adcTopK(idx.filter($"vec_id" =!= qid), "vec_id",
        qv.toArray, model.books, 10).select("vec_id").as[Long].collect().toSet
      // nprobe = nlist: routing must reproduce the full scan EXACTLY
      val allProbed = IvfPq.topK(idx.filter($"vec_id" =!= qid), "vec_id",
        qv.toArray, model, 10, nprobe = 8).select("vec_id").as[Long].collect().toSet
      val ivfAdc = IvfPq.topK(idx.filter($"vec_id" =!= qid), "vec_id",
        qv.toArray, model, 10, nprobe = 4).select("vec_id").as[Long].collect().toSet
      val rr = IvfPq.topK(idx.filter($"vec_id" =!= qid), "vec_id",
        qv.toArray, model, 10, nprobe = 4,
        rerankWith = Some((emb.filter($"vec_id" =!= qid), "embedding")))
        .select("vec_id").as[Long].collect().toSet
      (allProbed == fullAdc, recall(ivfAdc), recall(rr))
    }.unzip3
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    assert(fullEq.forall(identity),
      "nprobe=nlist must be IDENTICAL to the un-routed ADC scan")
    // nprobe=4/8 scans ~half the codes; measured mean recall 0.36 vs 0.60
    // un-routed on this fixture — the probe/recall trade is real, assert a
    // floor rather than pretending it's free
    assert(mean(routed) >= 0.25, s"routed recall collapsed: ${mean(routed)}")
    assert(mean(reranked) >= mean(routed),
      s"exact rerank must not lose recall: ${mean(reranked)} < ${mean(routed)}")
  }

  test("model save/load round-trips and serves identical top-k with no refit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_model").toString
    IvfPq.save(spark, model, dir)
    val reloaded = IvfPq.load(spark, dir)
    assert(reloaded.centroids.map(_.toSeq).toSeq ==
      model.centroids.map(_.toSeq).toSeq, "centroids drifted through parquet")
    assert(reloaded.books.map(_.map(_.toSeq).toSeq).toSeq ==
      model.books.map(_.map(_.toSeq).toSeq).toSeq, "codebooks drifted through parquet")
    // the serving path end-to-end from the artifact alone: reload, re-index,
    // probe — identical rows to the in-memory model (q82-equivalent check)
    val (qid, qv) = emb.as[(Long, Seq[Float])].head()
    val idxReloaded = IvfPq.index(emb, "vec_id", "embedding", reloaded)
    def served(i: org.apache.spark.sql.DataFrame, m: IvfPq.Model) =
      IvfPq.topK(i.filter($"vec_id" =!= qid), "vec_id", qv.toArray, m, 10, nprobe = 4)
        .as[(Long, Double)].collect().toSeq
    assert(served(idxReloaded, reloaded) == served(idx, model))
  }

  test("residual encoding recalls at least as well as raw codes at equal bits") {
    val resModel = IvfPq.fitResidual(emb, "vec_id", "embedding",
      nlist = 8, m = 16, k = 32, iters = 2)
    val resIdx = IvfPq.indexResidual(emb, "vec_id", "embedding", resModel).cache()
    val all = emb.as[(Long, Seq[Float])].collect()
    val queries = all.sortBy(_._1).take(5)
    val (raw, res) = queries.map { case (qid, qv) =>
      val exact = all.filter(_._1 != qid)
        .map { case (id, v) =>
          (id, v.indices.foldLeft(0.0)((a, i) => a + v(i).toDouble * qv(i).toDouble)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      def recall(ids: Set[Long]) = exact.intersect(ids).size / 10.0
      val rawIds = IvfPq.topK(idx.filter($"vec_id" =!= qid), "vec_id",
        qv.toArray, model, 10, nprobe = 4).select("vec_id").as[Long].collect().toSet
      val resIds = IvfPq.topKResidual(resIdx.filter($"vec_id" =!= qid), "vec_id",
        qv.toArray, resModel, 10, nprobe = 4).select("vec_id").as[Long].collect().toSet
      (recall(rawIds), recall(resIds))
    }.unzip
    resIdx.unpersist()
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    assert(mean(res) >= mean(raw),
      s"residual codes must not recall worse: ${mean(res)} < ${mean(raw)} " +
        s"(raw ${raw.toSeq}, residual ${res.toSeq})")
  }
}
