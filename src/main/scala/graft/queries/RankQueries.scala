package graft.queries

import org.apache.spark.sql.functions._
import graft.rank.{Cooccur, Interactions, RankingEval}
import graft.serve.RecsTable
import QueryHelpers._

/** Retrieval / eval / serving coverage (SURVEY §2.8 F9-F13, §2.6 O4/O5,
  * §2.1 S9): deterministic co-occurrence retrieval (oracle-checked end to
  * end), per-user recall@10 + NDCG@10, and the assembled serving contract.
  * The learned ALS path (non-SQL-expressible) lives in rank.AlsRecommender,
  * verified in RecommenderSpec and benched via SparkEntry.benchOnly.
  */
object RankQueries {

  private val b1 = "2000-01-01" // train < b1, test >= b1 (q09's split point)
  private val neighborCap = 50
  private val k = 10
  private val basketCap = 8 // q54's per-user recent-items bound

  val defs: Map[String, QueryFn] = Map(
    // Item-item co-occurrence retrieval: top-10 unseen items per user
    // (reference capability: top-k retrieval, my_merlin_flow.py:333-345).
    "q50_topk_retrieval" -> { (s, d) =>
      // star join materialized ONCE (round 16, §2.3 — the q53/q175
      // convention): tr feeds the fit's basket frames AND recommend's
      // history/seen frames; without the cut each branch replayed the
      // orders⋈lineitem lineage. Values unchanged — oracle re-gated.
      val (tr0, _) = Interactions.splitByTime(Interactions.fromStar(s, d), b1)
      val tr = tr0.localCheckpoint()
      val nb = Cooccur.itemNeighbors(tr, neighborCap)
      Cooccur.recommend(tr, nb, k)
        .filter(col("user_id") < 200)
        .orderBy(col("user_id"), col("rk"))
    },

    // The FUSED serve of the same exact ranker (round 12): the bounded
    // co-occurrence model broadcasts and each user's scores accumulate
    // row-locally over their grouped history — the |history|×M candidate
    // rows of q50's join plan never exist (sql.TopKDotF32's lesson
    // applied to exact counts; Cooccur.recommendFused). Same oracle SQL
    // as q50: the fused plan must replay the join plan row-for-row.
    // Round 13 (verdict task 3): the consumer's filter arrives as a
    // `users` SUBSET, not a post-filter — a predicate above the fused
    // mapPartitions cannot push below it, so the old shape paid a
    // full-population serve to answer a 200-user question; the subset
    // semi-joins the history frames before the grouped aggregates
    // (spec-pinned ≡ post-filtered in CooccurSpec).
    "q182_topk_fused" -> { (s, d) =>
      // star join materialized once (round 16, §2.3): fit + history/seen
      // + the users subset all read tr
      val (tr0, _) = Interactions.splitByTime(Interactions.fromStar(s, d), b1)
      val tr = tr0.localCheckpoint()
      val nb = Cooccur.itemNeighbors(tr, neighborCap)
      val users = tr.select(col("user_id")).filter(col("user_id") < 200).distinct()
      // round-14: under the |users| regime gate this subset (< the
      // minFusedUsers default) routes through the JOIN plan — the
      // production dispatch for a 200-user request (the fused plan's
      // fixed model prep doesn't amortize; r13 measured 4.76 s fused vs
      // ~4 s join at this shape). The FUSED route on the same shape is
      // q183's row: both replay the same oracle, so route-invariance is
      // driver-adjudicated, not just spec-pinned.
      Cooccur.recommendAuto(tr, nb, k, users = Some(users))
        .orderBy(col("user_id"), col("rk"))
    },

    // The fused kernel FORCED onto the small subset (minFusedUsers = 1):
    // same rows as q182 by the dispatch-invariance contract — this row
    // keeps the fused-with-subset path under the DuckDB oracle now that
    // the dispatcher routes q182's shape to the join plan.
    "q183_topk_fused_subset" -> { (s, d) =>
      // star join materialized once (round 16, §2.3) — q182's twin
      val (tr0, _) = Interactions.splitByTime(Interactions.fromStar(s, d), b1)
      val tr = tr0.localCheckpoint()
      val nb = Cooccur.itemNeighbors(tr, neighborCap)
      val users = tr.select(col("user_id")).filter(col("user_id") < 200).distinct()
      Cooccur.recommendFused(tr, nb, k, users = Some(users),
          minFusedUsers = 1L)
        .getOrElse(throw new IllegalStateException(
          "fused path unexpectedly refused the q183 fixture"))
        .orderBy(col("user_id"), col("rk"))
    },

    // Ranking eval: per-user recall@10 / NDCG@10 of the q50 recommender
    // against the held-out test window (reference: my_merlin_flow.py:
    // 318,324,446-450). DCG discounts are plan-time literals (see
    // RankingEval doc) so the doubles hash-match the oracle.
    "q51_rank_eval" -> { (s, d) =>
      // star join materialized once (round 16, §2.3): tr and te are both
      // filters over ONE checkpointed interactions frame
      val inter = Interactions.fromStar(s, d).localCheckpoint()
      val (tr, te) = Interactions.splitByTime(inter, b1)
      val nb = Cooccur.itemNeighbors(tr, neighborCap)
      val recs = Cooccur.recommendAuto(tr, nb, k)
      RankingEval.perUser(recs, te, k)
        .orderBy(col("user_id"))
    },

    // Serving contract: user_id → ordered rec list (JSON) + held-out target,
    // with the no_user fallback row (reference: my_merlin_flow.py:512-537,
    // 620-630; handler.py:56-64).
    "q52_recs_table" -> { (s, d) =>
      // star join materialized once (round 16, §2.3)
      val inter = Interactions.fromStar(s, d).localCheckpoint()
      val (tr, te) = Interactions.splitByTime(inter, b1)
      val nb = Cooccur.itemNeighbors(tr, neighborCap)
      val recs = Cooccur.recommendAuto(tr, nb, k)
      val targets = RecsTable.firstTargetPerUser(te, Seq(col("ts").asc, col("item_id").asc))
      RecsTable.assemble(recs, targets, RecsTable.popularFallback(tr, k))
        .select(col("user_id"), to_json(col("recs")).as("recs_json"), col("target"))
        .orderBy(col("user_id"))
    },

    // Grid-search fan-out + model-selection join over the deterministic
    // co-occurrence recommender (reference: param-grid foreach fan-out
    // my_merlin_flow.py:248-263, best-model join :347-374 — F10/F11; the
    // learned-ALS grid is AlsRecommender.gridSearch, RecommenderSpec).
    // Selection metric is micro-recall@k = total hits / total test pairs —
    // one integer division, so the argmax is oracle-exact. The three grid
    // branches share the pair-count lineage (exchange reuse), so the fan-out
    // costs ~one extra recommend pass, not three.
    "q53_grid_selection" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val (tr0, te) = Interactions.splitByTime(Interactions.fromStar(s, d), b1)
      // the split feeds the fit, the candidate history, AND the eval join —
      // materialize the star join once instead of replaying it per branch
      // (r11grid measured ~1 s of the entry; same convention as q175)
      val tr = tr0.localCheckpoint()
      val teD = te.select(col("user_id"), col("item_id")).distinct()
        .localCheckpoint()
      val total = teD.agg(count(lit(1)).as("n_test"))
      // one fit at the largest cap + one candidate pass for the whole grid
      // (recommendMultiCap — per-cap rows identical to the per-cap form);
      // caps with zero hits survive via the literal cap frame
      val recs = Cooccur.recommendMultiCap(tr,
        Cooccur.itemNeighborsRanked(tr, gridCaps.max), gridCaps, k)
      val hitRows = recs.join(teD, Seq("user_id", "item_id"))
        .groupBy(col("cap")).agg(count(lit(1)).as("__h"))
      import s.implicits._
      val rows = gridCaps.toDF("cap").join(hitRows, Seq("cap"), "left")
        .select(col("cap"), coalesce(col("__h"), lit(0L)).as("hits"))
      rows.crossJoin(total)
        .withColumn("micro_recall", col("hits").cast("double") / col("n_test"))
        .withColumn("selected",
          row_number().over(Window.orderBy(col("hits").desc, col("cap").asc)) === 1)
        .select(col("cap"), col("hits"), col("n_test"), col("micro_recall"), col("selected"))
        .orderBy(col("cap"))
    },

    // Basket-capped retrieval: the 100 TB form of q50 — candidate
    // generation and the co-occurrence fit both run over each user's
    // `basketCap` most recent items (Interactions.recentN), so the per-user
    // pair space is bounded at N·(N-1) regardless of user heat; the
    // seen-items exclusion still covers the full history. Fully
    // oracle-checked (the cap is a plain ROW_NUMBER window in SQL).
    "q54_capped_topk" -> { (s, d) =>
      // star join materialized once (round 16, §2.3)
      val (tr0, _) = Interactions.splitByTime(Interactions.fromStar(s, d), b1)
      val tr = tr0.localCheckpoint()
      val nb = Cooccur.itemNeighbors(tr, neighborCap, maxBasket = basketCap)
      Cooccur.recommend(tr, nb, k, maxBasket = basketCap)
        .filter(col("user_id") < 200)
        .orderBy(col("user_id"), col("rk"))
    },

    // Popularity-weighted negative sampling: 5 reproducible negatives per
    // user, drawn ∝ interaction count with positives excluded. Exact
    // integer CDF + 48-bit md5 draws make the sample engine-independent:
    // the oracle replays the identical draws in DuckDB (range-join lookup
    // there, bucketed equi-join here — same result, different plan).
    "q59_negative_sample" -> { (s, d) =>
      val pos = Interactions.fromStar(s, d).select(col("user_id"), col("item_id"))
      graft.rank.NegativeSampling.sampleNegatives(pos, k = 5, seed = 42L)
        .orderBy(col("user_id"), col("rk"))
    })

  private val gridCaps = Seq(5, 10, 20)

  /** Fit-once serving-path bench forms: the oracle queries above recompute
    * the co-occurrence fit lineage because they must be self-contained; a
    * production run fits once (RetrievalPipeline) and serves many times.
    * `serveSetup` materializes the neighbor model parquet AND the
    * time-split interaction tables (a serving refresh reads prepared
    * history, it does not re-run the star join per request) — Bench calls
    * it UNTIMED — and the q5Ns forms then measure only the serving lineage
    * (history scan + model scan + candidate join + per-user window), so
    * BENCH rounds show fit cost and serve cost as separate numbers.
    */
  lazy val serveModelDir: String =
    java.nio.file.Files.createTempDirectory("graft_serve_model").toString

  def serveSetup(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    val (tr, te) = Interactions.splitByTime(Interactions.fromStar(s, d), b1)
    graft.rank.RetrievalPipeline.fitAndSave(tr, s"$serveModelDir/cooccur", neighborCap)
    tr.write.mode("overwrite").parquet(s"$serveModelDir/tr")
    te.write.mode("overwrite").parquet(s"$serveModelDir/te")
    // two-tower fit-once artifacts (round-12 verdict task 8): q63t mixes a
    // volatile fit with the fused serve; q63ts/q63ta read THIS model so
    // rounds can track the serving kernels' wall without fit noise
    import graft.rank.TwoTower
    val ttModel = TwoTower.fit(
      Interactions.recentN(tr, 12).select("user_id", "item_id"),
      TwoTower.Config(embDim = 16, hiddenDim = 8, steps = 12,
        batchRows = 4096, seed = "tt8", stepsPerJob = 6))
    ttModel.save(s"$serveModelDir/twotower")
    // quantizer fit in the MIPS-augmented space (TwoTower.annCentroids —
    // round-13: the recall gauge read 0.18 @ nprobe 8/64 on raw-vector
    // centroids, the classic inner-product/L2 mismatch)
    graft.sim.Ivf.saveCentroids(s,
      TwoTower.annCentroids(ttModel, nlist = 64, iters = 3),
      s"$serveModelDir/tt_centroids")
  }

  val serveDefs: Map[String, QueryFn] = Map(
    "q50s_topk_served" -> { (s, _) =>
      val tr = s.read.parquet(s"$serveModelDir/tr")
      val nb = graft.rank.RetrievalPipeline.loadModel(s, s"$serveModelDir/cooccur")
      Cooccur.recommend(tr, nb, k)
        .filter(col("user_id") < 200)
        .orderBy(col("user_id"), col("rk"))
    },
    // The fused co-occurrence serve at the FULL serving shape (every
    // user — the q52s candidate volume without the assemble/JSON tail).
    // Round 13: this measured 3.14 vs the join plan's 6.78 s
    // (median-of-3, isolated) — the 2x hold that flipped q51s/q52s/q51/
    // q52 to recommendAuto per SCALE.md's round-12 promise; this entry
    // stays as the serve-only wall of the now-default path. The
    // user-FILTERED q50s shape stays on the join plan: Catalyst pushes
    // user_id < 200 to the scan there (1.06 s), below the fused form's
    // fixed model-prep cost.
    "q52f_recs_fused" -> { (s, _) =>
      val tr = s.read.parquet(s"$serveModelDir/tr")
      val nb = graft.rank.RetrievalPipeline.loadModel(s, s"$serveModelDir/cooccur")
      Cooccur.recommendAuto(tr, nb, k)
        .orderBy(col("user_id"), col("rk"))
    },
    "q51s_eval_served" -> { (s, _) =>
      val tr = s.read.parquet(s"$serveModelDir/tr")
      val te = s.read.parquet(s"$serveModelDir/te")
      val nb = graft.rank.RetrievalPipeline.loadModel(s, s"$serveModelDir/cooccur")
      RankingEval.perUser(Cooccur.recommendAuto(tr, nb, k), te, k)
        .orderBy(col("user_id"))
    },
    "q52s_recs_served" -> { (s, _) =>
      val tr = s.read.parquet(s"$serveModelDir/tr")
      val te = s.read.parquet(s"$serveModelDir/te")
      val nb = graft.rank.RetrievalPipeline.loadModel(s, s"$serveModelDir/cooccur")
      val recs = Cooccur.recommendAuto(tr, nb, k)
      val targets = RecsTable.firstTargetPerUser(te, Seq(col("ts").asc, col("item_id").asc))
      RecsTable.assemble(recs, targets, RecsTable.popularFallback(tr, k))
        .select(col("user_id"), to_json(col("recs")).as("recs_json"), col("target"))
        .orderBy(col("user_id"))
    },
    // The fused dense serving kernel at the nightly-refresh shape
    // (round-12 verdict task 8): fit-once model, top-10 for EVERY trained
    // user against the full item catalog with the whole train history
    // excluded — the q63t serve leg without its volatile fit. The wall is
    // sql.TopKDotF32 (one broadcast catalog, zero candidate rows) plus
    // the seen aggregation.
    "q63ts_twotower_served" -> { (s, _) =>
      val tr = s.read.parquet(s"$serveModelDir/tr")
      val model = graft.rank.TwoTower.load(s, s"$serveModelDir/twotower")
      graft.rank.TwoTower.recommend(model, model.userVecs.select("user_id"),
          k, excludeSeen = Some(tr.select("user_id", "item_id")))
        .orderBy(col("user_id"), col("rk"))
    },
    // The ANN-served leg at the same shape (round-12 verdict task 2):
    // identical model, users and exclusions, served through the IVF probe
    // (fit-once 64-cell quantizer, nprobe 8) + exact in-cell scoring —
    // the plan that holds when the catalog outgrows the dense kernel's
    // float budget. Recall vs q63ts is nprobe/nlist-governed
    // (TwoTowerSpec pins full-probe equality and the partial-probe
    // floor).
    "q63ta_twotower_ann" -> { (s, _) =>
      val tr = s.read.parquet(s"$serveModelDir/tr")
      val model = graft.rank.TwoTower.load(s, s"$serveModelDir/twotower")
      val cents = graft.sim.Ivf.loadCentroids(s, s"$serveModelDir/tt_centroids")
      graft.rank.TwoTower.recommendAnn(model, model.userVecs.select("user_id"),
          k, excludeSeen = Some(tr.select("user_id", "item_id")),
          nprobe = 8, centroids = Some(cents))
        .orderBy(col("user_id"), col("rk"))
    })

  /** Recall@10 of the IVF-served ANN leg (q63ta) against the exact dense
    * serve (q63ts) on the SAME fit-once model — the probe/recall trade the
    * bench artifact carries beside the walls (round-12 verdict task 6;
    * reference eval protocol: recall@10, my_merlin_flow.py:318). Both
    * serves emit top-10 per user, so recall = |ann ∩ exact| / |exact|.
    * Requires serveSetup to have run (Bench calls it untimed after
    * benchSetup). */
  def annRecallAt10(s: org.apache.spark.sql.SparkSession, d: String): Double = {
    val exact = serveDefs("q63ts_twotower_served")(s, d)
      .select(col("user_id"), col("item_id")).localCheckpoint()
    val ann = serveDefs("q63ta_twotower_ann")(s, d)
      .select(col("user_id"), col("item_id"))
    val denom = exact.count()
    val recall =
      if (denom == 0L) 0.0
      else ann.join(exact, Seq("user_id", "item_id"), "left_semi")
        .count().toDouble / denom
    // both counts are materialized — the checkpointed blocks are
    // scaffolding now (round-13 advice: each gauge evaluation left them
    // resident for the session)
    graft.operators.Checkpoints.free(exact)
    recall
  }

  private def interSql(cmp: String): String =
    s"""SELECT DISTINCT o_custkey u, l_partkey i FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderdate $cmp TIMESTAMP '$b1'"""

  /** Shared CTE chain computing the co-occurrence recs (mirrors Cooccur);
    * `sfx` suffixes every CTE name so q53 can instantiate one chain per
    * grid point in a single statement. With `basket` > 0 the fit and the
    * candidate history both read the per-user recent-N capped view
    * (mirrors Interactions.recentN: recency = max ts per (user, item),
    * ties on item asc); the NOT EXISTS seen-exclusion still reads the full
    * history — same split as Cooccur.recommend. */
  private def recsCtes(cap: Int, sfx: String = "", basket: Int = 0): String = {
    val hist = if (basket > 0) s"trc$sfx" else s"tr$sfx"
    val basketCtes = if (basket > 0)
      s"""
        trm$sfx AS (SELECT o_custkey u, l_partkey i, MAX(o_orderdate) mts FROM orders
               JOIN lineitem ON l_orderkey = o_orderkey
               WHERE o_orderdate < TIMESTAMP '$b1' GROUP BY 1, 2),
        trc$sfx AS (SELECT u, i FROM (
            SELECT u, i, ROW_NUMBER() OVER (PARTITION BY u ORDER BY mts DESC, i) brk
            FROM trm$sfx) WHERE brk <= $basket),"""
    else ""
    s"""tr$sfx AS (${interSql("<")}),$basketCtes
        pc$sfx AS (SELECT a.i ia, b.i ib, COUNT(*) c FROM $hist a
               JOIN $hist b ON a.u = b.u AND a.i <> b.i GROUP BY 1, 2),
        nb$sfx AS (SELECT ia, ib, c FROM (
            SELECT ia, ib, c, ROW_NUMBER() OVER (PARTITION BY ia ORDER BY c DESC, ib) nrk
            FROM pc$sfx) WHERE nrk <= $cap),
        sc$sfx AS (SELECT t.u, nb$sfx.ib, CAST(SUM(nb$sfx.c) AS BIGINT) s FROM $hist t
               JOIN nb$sfx ON t.i = nb$sfx.ia GROUP BY 1, 2),
        un$sfx AS (SELECT u, ib, s FROM sc$sfx
               WHERE NOT EXISTS (SELECT 1 FROM tr$sfx x WHERE x.u = sc$sfx.u AND x.i = sc$sfx.ib)),
        recs$sfx AS (SELECT u, ib, s,
            CAST(ROW_NUMBER() OVER (PARTITION BY u ORDER BY s DESC, ib) AS INT) rk
          FROM un$sfx)"""
  }

  private def sqlList(xs: Array[Long]): String = xs.mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "q59_negative_sample" -> {
      val h = "md5(concat_ws('_', CAST(user_id AS VARCHAR), CAST(slot AS VARCHAR), '42'))"
      s"""WITH pos AS (SELECT o_custkey AS user_id, l_partkey AS item_id
                       FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          pop AS (SELECT item_id, COUNT(*) AS w FROM pos GROUP BY item_id),
          cdf AS (SELECT item_id, w,
                    SUM(w) OVER (ORDER BY item_id ROWS UNBOUNDED PRECEDING) - w AS lo,
                    SUM(w) OVER (ORDER BY item_id ROWS UNBOUNDED PRECEDING) AS hi
                  FROM pop),
          tot AS (SELECT SUM(w) AS tw FROM pop),
          slots AS (SELECT u.user_id, CAST(r.range AS INT) AS slot
                    FROM (SELECT DISTINCT user_id FROM pos) u CROSS JOIN range(0, 10) r),
          draws AS (SELECT user_id, slot,
                      ${hex48Sql(h)} % (SELECT tw FROM tot) AS u FROM slots),
          hits AS (SELECT d.user_id, d.slot, c.item_id
                   FROM draws d JOIN cdf c ON d.u >= c.lo AND d.u < c.hi),
          neg AS (SELECT h.* FROM hits h
                  WHERE NOT EXISTS (SELECT 1 FROM pos p
                                    WHERE p.user_id = h.user_id AND p.item_id = h.item_id)),
          rk AS (SELECT user_id, slot, item_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY slot) AS rk FROM neg)
          SELECT user_id, CAST(rk AS INT) AS rk, slot, item_id FROM rk
          WHERE rk <= 5 ORDER BY user_id, rk"""
    },
    "q50_topk_retrieval" ->
      s"""WITH ${recsCtes(neighborCap)}
          SELECT u AS user_id, rk, ib AS item_id, s AS score FROM recs
          WHERE rk <= $k AND u < 200 ORDER BY user_id, rk""",
    // identical text to q50 by design: the fused plan's contract is
    // row-identity with the join plan, adjudicated by the same replay
    "q182_topk_fused" ->
      s"""WITH ${recsCtes(neighborCap)}
          SELECT u AS user_id, rk, ib AS item_id, s AS score FROM recs
          WHERE rk <= $k AND u < 200 ORDER BY user_id, rk""",
    // q183 = the same oracle text again, replayed against the FORCED
    // fused route (q182 now dispatches this shape to the join plan):
    // the driver hash-checks both routes against one truth
    "q183_topk_fused_subset" ->
      s"""WITH ${recsCtes(neighborCap)}
          SELECT u AS user_id, rk, ib AS item_id, s AS score FROM recs
          WHERE rk <= $k AND u < 200 ORDER BY user_id, rk""",
    "q54_capped_topk" ->
      s"""WITH ${recsCtes(neighborCap, basket = basketCap)}
          SELECT u AS user_id, rk, ib AS item_id, s AS score FROM recs
          WHERE rk <= $k AND u < 200 ORDER BY user_id, rk""",
    "q51_rank_eval" ->
      s"""WITH ${recsCtes(neighborCap)},
          te AS (${interSql(">=")}),
          tsize AS (SELECT u, COUNT(*) n_test FROM te GROUP BY 1),
          hits AS (SELECT r.u, r.rk FROM recs r JOIN te ON r.u = te.u AND r.ib = te.i
                   WHERE r.rk <= $k),
          h AS (SELECT u, COUNT(*) hits,
                  CAST(SUM(${sqlList(RankingEval.discountsScaled(k))}[rk]) AS BIGINT) dcg_s
                FROM hits GROUP BY u)
          SELECT ts.u AS user_id, ts.n_test, COALESCE(h.hits, 0) AS hits,
            CAST(COALESCE(h.hits, 0) AS DOUBLE) / ts.n_test AS recall,
            CAST(COALESCE(h.dcg_s, 0) AS DOUBLE) /
              CAST(${sqlList(RankingEval.idcgScaled(k))}[LEAST(ts.n_test, $k)] AS DOUBLE) AS ndcg
          FROM tsize ts LEFT JOIN h USING (u) ORDER BY user_id""",
    "q52_recs_table" ->
      s"""WITH ${recsCtes(neighborCap)},
          teo AS (SELECT o_custkey u, l_partkey i, o_orderdate ts FROM orders
                  JOIN lineitem ON l_orderkey = o_orderkey
                  WHERE o_orderdate >= TIMESTAMP '$b1'),
          tgt AS (SELECT u, i FROM (
              SELECT u, i, ROW_NUMBER() OVER (PARTITION BY u ORDER BY ts, i) trk
              FROM teo) WHERE trk = 1),
          lists AS (SELECT u, list(CAST(ib AS VARCHAR) ORDER BY rk) recs
                    FROM recs WHERE rk <= $k GROUP BY u),
          pop AS (SELECT i, COUNT(*) c FROM tr GROUP BY 1),
          popt AS (SELECT i, prk FROM (
              SELECT i, ROW_NUMBER() OVER (ORDER BY c DESC, i) prk FROM pop)
            WHERE prk <= $k),
          popl AS (SELECT to_json(list(CAST(i AS VARCHAR) ORDER BY prk)) j FROM popt)
          SELECT CAST(l.u AS VARCHAR) AS user_id, to_json(l.recs) AS recs_json,
                 CAST(t.i AS VARCHAR) AS target
          FROM lists l LEFT JOIN tgt t ON l.u = t.u
          UNION ALL
          SELECT 'no_user', (SELECT j FROM popl), NULL
          ORDER BY user_id""",
    "q53_grid_selection" -> {
      val chains = gridCaps.map(m => recsCtes(m, s"_$m")).mkString(",\n          ")
      val hitCtes = gridCaps.map(m =>
        s"""h_$m AS (SELECT CAST($m AS INT) cap, COUNT(*) hits
            FROM recs_$m r JOIN ted ON r.u = ted.u AND r.ib = ted.i
            WHERE r.rk <= $k)""").mkString(",\n          ")
      val unionAll = gridCaps.map(m => s"SELECT * FROM h_$m").mkString(" UNION ALL ")
      s"""WITH $chains,
          ted AS (${interSql(">=")}),
          tot AS (SELECT COUNT(*) n_test FROM ted),
          $hitCtes,
          uni AS ($unionAll),
          sel AS (SELECT cap, hits, (SELECT n_test FROM tot) AS n_test,
                    ROW_NUMBER() OVER (ORDER BY hits DESC, cap ASC) rn
                  FROM uni)
          SELECT cap, hits, n_test,
                 CAST(hits AS DOUBLE) / n_test AS micro_recall,
                 rn = 1 AS selected
          FROM sel ORDER BY cap"""
    })
}
