package graft.serve

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentHashMap

/** In-memory KV store standing in for the DynamoDB batch writer — static so
  * local-mode executor threads and the test share it. */
object InMemoryKv {
  val store = new ConcurrentHashMap[String, String]()
  def putBatch(it: Iterator[(String, String)]): Unit =
    it.foreach { case (k, v) => store.put(k, v) }
}

class RecsTableSpec extends SparkSpecBase {
  import spark.implicits._

  private def recs = Seq(
    (1L, 1, 101L), (1L, 2, 102L), (2L, 1, 201L)).toDF("user_id", "rk", "item_id")
  private def targets = Seq((1L, 999L)).toDF("user_id", "item_id")

  test("assemble produces the serving contract incl. the no_user fallback") {
    val out = RecsTable.assemble(recs, targets, Seq("7", "8"))
    val rows = out.collect().map(r =>
      r.getString(0) -> ((r.getSeq[String](1).toList, Option(r.getString(2))))).toMap
    assert(rows.keySet == Set("1", "2", "no_user"))
    assert(rows("1") == (List("101", "102"), Some("999")))
    assert(rows("2") == (List("201"), None))
    assert(rows("no_user") == (List("7", "8"), None))
  }

  test("kvSink streams the handler.py contract: key -> JSON array payload") {
    InMemoryKv.store.clear()
    val table = RecsTable.assemble(recs, targets, Seq("7", "8"))
    RecsTable.kvSink(table, InMemoryKv.putBatch)
    assert(InMemoryKv.store.size() == 3)
    assert(InMemoryKv.store.get("1") == """["101","102"]""")
    assert(InMemoryKv.store.get("no_user") == """["7","8"]""")
  }

  test("streamRefresh recomputes KV entries only for users with new activity") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    InMemoryKv.store.clear()

    // history: u1 touched {1,2}, u2 touched {3}; neighbor model from a
    // separate co-occurrence corpus where 1~2, 2~4, 3~4 co-occur
    val history = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("user_id", "item_id")
    val corpus = Seq((10L, 1L), (10L, 2L), (11L, 2L), (11L, 4L), (12L, 3L), (12L, 4L))
      .toDF("user_id", "item_id")
    val neighbors = graft.rank.Cooccur.itemNeighbors(corpus, maxNeighbors = 5)

    val in = MemoryStream[(Long, Long)]
    val logDir = java.nio.file.Files.createTempDirectory("graft_streamlog").toString
    val q = RecsTable.streamRefresh(
      in.toDF().toDF("user_id", "item_id"), history, neighbors, k = 3,
      InMemoryKv.putBatch, s"$logDir/log")
    try {
      in.addData((1L, 4L)) // u1 interacts with item 4
      q.processAllAvailable()
      assert(InMemoryKv.store.containsKey("1"), "active user refreshed")
      assert(!InMemoryKv.store.containsKey("2"), "inactive user NOT recomputed")
      // parity with the batch path on the same merged history
      val merged = history.filter($"user_id" === 1L)
        .union(Seq((1L, 4L)).toDF("user_id", "item_id"))
      val expected = graft.rank.Cooccur.recommend(merged, neighbors, 3)
        .filter($"user_id" === 1L).orderBy($"rk")
        .select($"item_id".cast("string")).as[String].collect().toList
      assert(InMemoryKv.store.get("1") == expected.mkString("[\"", "\",\"", "\"]"),
        s"payload ${InMemoryKv.store.get("1")} vs $expected")

      in.addData((2L, 4L), (1L, 2L)) // u2 becomes active; u1 re-touches item 2
      q.processAllAvailable()
      assert(InMemoryKv.store.containsKey("2"), "second batch refreshes u2")
      // cross-batch memory: u1's batch-1 item 4 must STILL be excluded even
      // though this batch only carried (1, 2) — the stream log remembers
      val u1 = InMemoryKv.store.get("1")
      assert(!u1.contains("\"4\""), s"batch-1 seen item recommended again: $u1")
      assert(u1.contains("\"3\""), s"the one unseen item should be recommended: $u1")
    } finally q.stop()
  }

  test("streamDenseRefresh serves the fused kernel per batch with cross-batch seen memory") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    InMemoryKv.store.clear()

    // items 1..4 near-one-hot; u1 prefers dims in order 1>2>3>4, u2 the
    // reverse — so unseen ranking is fully determined and tie-free
    val itemVecs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0f)), (4L, Seq(0f, 0f, 0f, 1f)))
      .toDF("item_id", "vec")
    val userVecs = Seq(
      (1L, Seq(0.9f, 0.7f, 0.5f, 0.3f)),
      (2L, Seq(0.3f, 0.5f, 0.7f, 0.9f)))
      .toDF("user_id", "vec")
    val history = Seq((1L, 1L)).toDF("user_id", "item_id") // u1 already saw 1

    val in = MemoryStream[(Long, Long)]
    val logDir = java.nio.file.Files.createTempDirectory("graft_denselog").toString
    val q = RecsTable.streamDenseRefresh(
      in.toDF().toDF("user_id", "item_id"), history, userVecs, itemVecs,
      k = 2, InMemoryKv.putBatch, s"$logDir/log")
    try {
      in.addData((1L, 4L)) // u1 interacts with item 4
      q.processAllAvailable()
      assert(InMemoryKv.store.containsKey("1"), "active user refreshed")
      assert(!InMemoryKv.store.containsKey("2"), "inactive user NOT recomputed")
      // u1's unseen = {2, 3}, ranked by preference: [2, 3]
      assert(InMemoryKv.store.get("1") == "[\"2\",\"3\"]",
        s"payload ${InMemoryKv.store.get("1")}")

      in.addData((2L, 4L), (1L, 2L)) // u2 activates; u1 touches 2
      q.processAllAvailable()
      // u2's unseen = {1, 2, 3}, reverse preference: [3, 2]
      assert(InMemoryKv.store.get("2") == "[\"3\",\"2\"]",
        s"payload ${InMemoryKv.store.get("2")}")
      // cross-batch memory: u1's batch-1 item 4 and base-history item 1
      // stay excluded even though this batch only carried (1, 2)
      assert(InMemoryKv.store.get("1") == "[\"3\"]",
        s"payload ${InMemoryKv.store.get("1")}")
    } finally q.stop()
  }

  test("streamDenseRefresh collects the catalog once per model generation (round-12)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    InMemoryKv.store.clear()
    val itemVecsA = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(0.5f, 0.5f)))
      .toDF("item_id", "vec")
    // hot-swap generation: item 3 re-embedded to dominate dim 1
    val itemVecsB = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(2f, 0f)))
      .toDF("item_id", "vec")
    val userVecs = Seq((1L, Seq(1f, 0.1f))).toDF("user_id", "vec")
    val history = Seq((9L, 1L)).toDF("user_id", "item_id")
    @volatile var current = itemVecsA
    val cache = new graft.sim.Retrieval.CatalogCache(() => current,
      "item_id", "vec")
    val in = MemoryStream[(Long, Long)]
    val logDir = java.nio.file.Files.createTempDirectory("graft_cachelog").toString
    val q = RecsTable.streamDenseRefresh(
      in.toDF().toDF("user_id", "item_id"), history, () => userVecs, cache,
      k = 1, InMemoryKv.putBatch, s"$logDir/log")
    try {
      in.addData((1L, 99L)); q.processAllAvailable()
      in.addData((1L, 98L)); q.processAllAvailable()
      in.addData((1L, 97L)); q.processAllAvailable()
      assert(cache.collects == 1,
        s"stable model collected ${cache.collects}x over 3 batches")
      assert(InMemoryKv.store.get("1") == "[\"1\"]",
        s"payload ${InMemoryKv.store.get("1")}")
      current = itemVecsB // hot-swap: next batch must re-collect and re-rank
      in.addData((1L, 96L)); q.processAllAvailable()
      assert(cache.collects == 2, "hot-swap did not re-collect")
      assert(InMemoryKv.store.get("1") == "[\"3\"]",
        s"payload after swap ${InMemoryKv.store.get("1")}")
    } finally q.stop()
  }

  test("per-batch seen set semi-prunes BOTH legs below the union (round-12)") {
    val history = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("user_id", "item_id")
    val log = Seq((1L, 4L), (4L, 5L)).toDF("user_id", "item_id")
    val active = Seq(Tuple1(1L)).toDF("user_id")
    val seen = RecsTable.activeSeen(history, log, active)
    // semantics: only the active user's rows survive, from both legs
    assert(seen.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 1L), (1L, 4L)))
    // plan: the optimized plan's Union must sit ABOVE the two semi-joins
    // (each leg pruned before the union reads it — O(active × history)
    // I/O per batch, not O(log))
    val plan = seen.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Union}
    val unions = plan.collect { case u: Union => u }
    assert(unions.nonEmpty, s"no Union in:\n$plan")
    val semisBelowUnion = unions.head.children.flatMap(_.collect {
      case j: Join if j.joinType.sql == "LEFT SEMI" => j
    })
    assert(semisBelowUnion.size == 2,
      s"expected a semi-join under EACH union leg, got ${semisBelowUnion.size} in:\n$plan")
  }

  test("streamAnnRefresh serves the recs contract through the IVF index (round-12)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    InMemoryKv.store.clear()
    // same fixture as the dense test so the expected lists match it:
    // with nprobe = nlist the ANN leg is exhaustive
    val itemVecs = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0f)), (4L, Seq(0f, 0f, 0f, 1f)))
      .toDF("item_id", "vec")
    val userVecs = Seq(
      (1L, Seq(0.9f, 0.7f, 0.5f, 0.3f)),
      (2L, Seq(0.3f, 0.5f, 0.7f, 0.9f)))
      .toDF("user_id", "vec")
    val history = Seq((1L, 1L)).toDF("user_id", "item_id")
    val cents = graft.sim.Ivf.fitCentroids(itemVecs, "item_id", "vec",
      nlist = 2, iters = 2)
    val index = graft.sim.Retrieval.annIndex(itemVecs, "item_id", "vec", cents)
      .localCheckpoint()
    // both serving plans end-to-end: the fused cell kernel (default
    // budget) and the past-budget cid-join fallback (budget 10 floats)
    // must produce identical KV state batch for batch; a FRESH
    // MemoryStream per plan (a reused one would replay the first plan's
    // rows as one merged batch)
    for (budget <- Seq(64000000L, 10L)) {
      val in = MemoryStream[(Long, Long)]
      InMemoryKv.store.clear()
      val dir = java.nio.file.Files.createTempDirectory("graft_annlog").toString
      val q = RecsTable.streamAnnRefresh(
        in.toDF().toDF("user_id", "item_id"), history, () => userVecs,
        () => index, () => cents, k = 2, nprobe = 2,
        InMemoryKv.putBatch, s"$dir/log", fusedIndexFloatLimit = budget)
      try {
        in.addData((1L, 4L))
        q.processAllAvailable()
        assert(InMemoryKv.store.containsKey("1"), "active user refreshed")
        assert(!InMemoryKv.store.containsKey("2"), "inactive user NOT recomputed")
        assert(InMemoryKv.store.get("1") == "[\"2\",\"3\"]",
          s"payload ${InMemoryKv.store.get("1")} (budget $budget)")
        in.addData((2L, 4L), (1L, 2L))
        q.processAllAvailable()
        assert(InMemoryKv.store.get("2") == "[\"3\",\"2\"]",
          s"payload ${InMemoryKv.store.get("2")} (budget $budget)")
        // cross-batch memory holds through the ANN leg too
        assert(InMemoryKv.store.get("1") == "[\"3\"]",
          s"payload ${InMemoryKv.store.get("1")} (budget $budget)")
      } finally q.stop()
    }
  }

  test("typed streamAnnRefresh artifacts refuse raw-space centroids loudly (round-13 task 6)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // same fixture as the generic ANN test; varied norms make the MIPS
    // augmentation non-degenerate (the pad coordinate is nonzero)
    val itemVecs = Seq(
      (1L, Seq(2f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1f, 0f)), (4L, Seq(0f, 0f, 0f, 1f)))
      .toDF("item_id", "vec")
    val userVecs = Seq(
      (1L, Seq(0.9f, 0.7f, 0.5f, 0.3f)),
      (2L, Seq(0.3f, 0.5f, 0.7f, 0.9f)))
      .toDF("user_id", "vec")
    val model = graft.rank.TwoTower.Model(userVecs, itemVecs,
      graft.rank.TwoTower.Config(embDim = 4))
    // a RAW-SPACE quantizer (dim 4, not 5): the exact artifact that served
    // at 0.18 recall through the generic seam — must refuse AT BUILD TIME
    val raw = graft.sim.Ivf.fitCentroids(itemVecs, "item_id", "vec",
      nlist = 2, iters = 2)
    val e = intercept[IllegalArgumentException] {
      graft.rank.TwoTower.annServeArtifacts(model, centroids = Some(raw))
    }
    assert(e.getMessage.contains("MIPS-augmented"),
      s"refusal must name the contract: ${e.getMessage}")
    // the matched constructor carries the pair through the typed overload:
    // user vectors 0-extended by the seam, index+centroids both augmented
    val arts = graft.rank.TwoTower.annServeArtifacts(model, nlist = 2,
      iters = 2)
    assert(arts.augDim == 5)
    assert(arts.index.select(org.apache.spark.sql.functions.size($"vec"))
      .head().getInt(0) == 5, "index rows live in the augmented space")
    val artsCk = arts.copy(index = arts.index.localCheckpoint())
    val history = Seq((1L, 1L)).toDF("user_id", "item_id")
    val in = MemoryStream[(Long, Long)]
    InMemoryKv.store.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_annlog2").toString
    val q = RecsTable.streamAnnRefresh(
      in.toDF().toDF("user_id", "item_id"), history, () => userVecs,
      () => artsCk, k = 2, nprobe = 2, InMemoryKv.putBatch, s"$dir/log",
      fusedIndexFloatLimit = 64000000L)
    try {
      in.addData((1L, 4L))
      q.processAllAvailable()
      // user 1 has seen {1, 4}; nprobe = nlist = 2 is exhaustive, so the
      // serve is the exact dense ranking over the unseen {2, 3}:
      // dot(u1, i2) = 0.7 > dot(u1, i3) = 0.5
      assert(InMemoryKv.store.get("1") == "[\"2\",\"3\"]",
        s"payload ${InMemoryKv.store.get("1")}")
    } finally q.stop()
  }

  test("pairedArtifactThunks pins both halves to one generation (round-15, ADVICE r14)") {
    // The r14 wiring passed `() => artifacts().index` and
    // `() => artifacts().centroids` as independent thunks: each
    // generation access invoked the supplier twice, and a supplier that
    // swapped generations between the calls served gen-N index with
    // gen-N+1 centroids. The paired thunks must (a) fetch ONCE per
    // generation access and (b) always serve the centroids of the index
    // generation last served, even against a swapping supplier.
    val itemVecs = Seq(
      (1L, Seq(2f, 0f, 0f, 0f)), (2L, Seq(0f, 1f, 0f, 0f)))
      .toDF("item_id", "vec")
    val userVecs = Seq((1L, Seq(0.9f, 0.7f, 0.5f, 0.3f)))
      .toDF("user_id", "vec")
    val model = graft.rank.TwoTower.Model(userVecs, itemVecs,
      graft.rank.TwoTower.Config(embDim = 4))
    val artsA = graft.rank.TwoTower.annServeArtifacts(model, nlist = 2,
      iters = 2)
    // a second generation: same content, DISTINCT index/centroid identity
    val artsB = artsA.copy(index = artsA.index.select($"item_id", $"cid",
      $"vec"), centroids = artsA.centroids.map(_.clone()))
    var calls = 0
    // worst case: a non-memoized supplier that swaps generations EVERY call
    val supplier = () => { calls += 1; if (calls % 2 == 1) artsA else artsB }
    val (idx, cents) = RecsTable.pairedArtifactThunks(supplier)
    val i1 = idx()
    assert(calls == 1, "index access fetches exactly once")
    val c1 = cents()
    assert(calls == 1, "centroids access must not re-invoke the supplier")
    assert(i1 eq artsA.index)
    assert(c1 eq artsA.centroids,
      "centroids must belong to the index generation last served — the " +
        "old wiring would have fetched artsB here")
    val i2 = idx()
    val c2 = cents()
    assert(calls == 2 && (i2 eq artsB.index) && (c2 eq artsB.centroids),
      "a new generation takes effect atomically at the next index fetch")
  }

  test("streamTopKServe maintains per-user top-k KV state across micro-batches (round-11)") {
    // round-10 verdict task 7: the StreamingTopKSpec heap composed with
    // the serving contract — cross-batch displacement must reach the KV
    // table, the no_user fallback row must always answer, and only
    // CHANGED users may be re-put per batch (update mode).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    InMemoryKv.store.clear()
    val in = MemoryStream[(Long, Long, Double)]
    val q = RecsTable.streamTopKServe(
      in.toDF().toDF("user_id", "item_id", "score"), k = 2,
      fallback = Seq("7", "8"), InMemoryKv.putBatch)
    try {
      in.addData((1L, 10L, 2.0), (1L, 11L, 5.0), (2L, 20L, 1.0))
      q.processAllAvailable()
      assert(InMemoryKv.store.get("1") == """["11","10"]""")
      assert(InMemoryKv.store.get("2") == """["20"]""")
      assert(InMemoryKv.store.get("no_user") == """["7","8"]""",
        "the fallback row must be present from the first batch")

      // batch 2 touches ONLY user 1: its score 9.0 displaces the batch-1
      // survivor 2.0 without any history recompute; user 2's entry is
      // untouched (update mode emits changed groups only — stale value
      // proves no rewrite happened)
      InMemoryKv.store.put("2", "SENTINEL")
      in.addData((1L, 12L, 9.0))
      q.processAllAvailable()
      assert(InMemoryKv.store.get("1") == """["12","11"]""",
        s"cross-batch displacement failed: ${InMemoryKv.store.get("1")}")
      assert(InMemoryKv.store.get("2") == "SENTINEL",
        "an unchanged user was re-put — update mode contract broken")
      assert(InMemoryKv.store.get("no_user") == """["7","8"]""")
    } finally q.stop()
  }

  test("streamTopKServe routes string item ids through graft_topk_str") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    InMemoryKv.store.clear()
    val in = MemoryStream[(Long, String, Double)]
    val q = RecsTable.streamTopKServe(
      in.toDF().toDF("user_id", "item_id", "score"), k = 2,
      fallback = Seq("f"), InMemoryKv.putBatch)
    try {
      in.addData((1L, "sku-b", 1.0), (1L, "sku-a", 1.0), (1L, "sku-c", 3.0))
      q.processAllAvailable()
      // score tie broke bytewise toward "sku-a"; string ids survive intact
      assert(InMemoryKv.store.get("1") == """["sku-c","sku-a"]""")
      in.addData((1L, "sku-z", 2.0))
      q.processAllAvailable()
      assert(InMemoryKv.store.get("1") == """["sku-c","sku-z"]""")
    } finally q.stop()
  }

  test("streamTopKServe recovers its heap state from the checkpoint across a query RESTART") {
    // The production property behind the state-store claim: the
    // TypedImperativeAggregate's serialize/deserialize pair must
    // round-trip through an actual checkpointed state store, so a
    // restarted serving query keeps displacing against survivors it
    // learned BEFORE the restart (a state loss would silently resurface
    // evicted items). File source + checkpointLocation = the durable
    // form MemoryStream cannot exercise.
    import org.apache.spark.sql.types._
    InMemoryKv.store.clear()
    val base = java.nio.file.Files.createTempDirectory("graft_topk_restart")
    val srcDir = base.resolve("src").toString
    val ckDir = base.resolve("ck").toString
    new java.io.File(srcDir).mkdirs()
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("item_id", LongType),
      StructField("score", DoubleType)))
    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = base.resolve(name + ".tmp").toFile
      val w = new java.io.PrintWriter(tmp)
      lines.foreach(w.println); w.close()
      // atomic move so the file source never reads a partial file
      java.nio.file.Files.move(tmp.toPath,
        java.nio.file.Paths.get(srcDir, name))
    }
    def start() = {
      val scored = spark.readStream.schema(schema).json(srcDir)
      val q = scored.groupBy(col("user_id"))
        .agg(graft.sql.GraftFunctions.topKAgg(col("score"), col("item_id"), 2).as("__top"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckDir)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val lists = batch.select(col("user_id").cast("string").as("user_id"),
            transform(col("__top"), x => x.getField("id").cast("string")).as("recs"))
          RecsTable.kvSink(lists, InMemoryKv.putBatch)
          ()
        }.start()
      q
    }
    val q1 = start()
    try {
      writeBatch("b1.json",
        Seq("""{"user_id":1,"item_id":10,"score":2.0}""",
          """{"user_id":1,"item_id":11,"score":5.0}"""))
      q1.processAllAvailable()
      assert(InMemoryKv.store.get("1") == """["11","10"]""")
    } finally q1.stop()
    // restart from the checkpoint; the new batch must displace item 10
    // (score 2.0, learned before the restart) but not item 11 (5.0)
    val q2 = start()
    try {
      writeBatch("b2.json", Seq("""{"user_id":1,"item_id":12,"score":3.0}"""))
      q2.processAllAvailable()
      assert(InMemoryKv.store.get("1") == """["11","12"]""",
        s"state not recovered across restart: ${InMemoryKv.store.get("1")}")
    } finally q2.stop()
  }

  test("json sink (S11) round-trips the table") {
    val tmp = java.nio.file.Files.createTempDirectory("recsjson").toString
    val table = RecsTable.assemble(recs, targets, Seq("7"))
    RecsTable.writeJson(table, tmp)
    val back = spark.read.json(tmp)
    assert(back.count() == 3)
    assert(back.filter($"user_id" === "1")
      .select(to_json($"recs")).as[String].head() == """["101","102"]""")
  }

  test("firstTargetPerUser keeps the earliest (ts, item) per user") {
    val te = Seq(
      (1L, 5L, java.sql.Timestamp.valueOf("2000-02-01 00:00:00")),
      (1L, 3L, java.sql.Timestamp.valueOf("2000-01-01 00:00:00")),
      (1L, 4L, java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
      .toDF("user_id", "item_id", "ts")
    val out = RecsTable.firstTargetPerUser(te, Seq(col("ts").asc, col("item_id").asc))
    assert(out.as[(Long, Long)].collect().toSeq == Seq((1L, 3L)))
  }
}
