package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Deterministic item–item co-occurrence retrieval (the engine's fully
  * reproducible recommender; capability analog of the reference's top-k
  * retrieval, my_merlin_flow.py:333-345, with integer scoring so results are
  * exactly reproducible in any SQL engine — the ALS path in AlsRecommender
  * is the learned counterpart).
  *
  * Scale design: the per-user self-join is quadratic in basket size — pass
  * `maxBasket` to bound it (Interactions.recentN keeps each user's most
  * recent N items, so per-user pair space is <= N·(N-1) no matter how hot
  * the user); the neighbor model is capped at `maxNeighbors` per item
  * (count desc, item asc — deterministic), so the model table is
  * |items| × M rows: broadcastable for dims in the millions,
  * shuffle-joinable beyond. At 100 TB both caps are mandatory.
  */
object Cooccur {

  /** Fit: DataFrame[item_a, item_b, c] — for each item, its top-M
    * co-purchased items by co-user count.
    *
    * Shuffle plan: ONE full-width shuffle. The pair stream is explicitly
    * repartitioned on item_a; HashPartitioning(item_a) satisfies the
    * clustering requirement of both the (item_a, item_b) aggregation
    * (subset-key clustering) and the item_a window, so neither inserts
    * another exchange over the multi-10M-row pair stream.
    */
  def itemNeighbors(inter: DataFrame, maxNeighbors: Int = 50, maxBasket: Int = 0): DataFrame = {
    // user-keyed repartition feeds the (user, item) distinct (subset
    // clustering) AND both sides of the self-join (co-partitioned on the
    // join key) — measured 2 fewer exchanges than distinct-then-join.
    // With maxBasket > 0 the capped history is already distinct AND already
    // HashPartitioning(user_id) after recentN's window, so the self-join
    // still reuses one exchange and the pair space is bounded by N·(N-1)
    // per user.
    val t =
      if (maxBasket > 0)
        Interactions.recentN(inter, maxBasket).select(col("user_id"), col("item_id"))
      else inter.select(col("user_id"), col("item_id"))
        .repartition(col("user_id")).distinct()
    val pairs = t.as("a").join(t.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item_id") =!= col("b.item_id"))
      .select(col("a.item_id").as("item_a"), col("b.item_id").as("item_b"))
      .repartition(col("item_a"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("c"))
    Relational.topKPerGroup(pairs, Seq("item_a"),
        Seq(col("c").desc, col("item_b").asc), maxNeighbors, "__nrk")
      .drop("__nrk")
  }

  /** Recommend: top-k unseen items per user, scored by the summed co-user
    * count over the user's history. Output: user_id, rk, item_id, score.
    *
    * Shuffle plan: the scored candidate stream (|history| × M rows) crosses
    * ONE shuffle, on user_id. The seen-items exclusion is NOT a join — an
    * anti join on (user_id, item_b) would force a second full-width shuffle
    * and then the per-user window a third. Instead, history rows are
    * unioned into the candidate stream as null-scored marker rows; the one
    * (user_id, item_b) aggregation sums scores AND detects the marker, and
    * HashPartitioning(user_id) satisfies the aggregation, the filter, and
    * the top-k window without further exchanges.
    *
    * The final cut deliberately stays the WINDOW form, not TopKAggF
    * (round-10 audit): its input is already HashPartitioning(user_id) —
    * there is no exchange left for a map-side heap to shrink — and
    * Spark's InferWindowGroupLimit already bounds the per-group sort to
    * rank <= k survivors, so the aggregate form would only swap one
    * bounded in-partition pass for another.
    */
  def recommend(inter: DataFrame, neighbors: DataFrame, k: Int = 10,
      maxBasket: Int = 0): DataFrame = {
    val t = inter.select(col("user_id"), col("item_id")).distinct()
    // With maxBasket > 0, candidates are generated from the capped recent
    // history (|hist| × M rows stays bounded for hot users), but the seen-
    // items exclusion still covers the FULL history — an item the user
    // touched long ago is still "seen", and the seen stream is linear in
    // interactions, so keeping it uncapped costs nothing quadratic.
    val hist =
      if (maxBasket > 0)
        Interactions.recentN(inter, maxBasket).select(col("user_id"), col("item_id"))
      else t
    val cand = hist.join(neighbors, hist("item_id") === neighbors("item_a"))
      .select(col("user_id"), col("item_b"), col("c"), lit(false).as("__seen"))
    val seenRows = t.select(col("user_id"), col("item_id").as("item_b"),
      lit(null).cast("long").as("c"), lit(true).as("__seen"))
    val unseen = cand.unionByName(seenRows)
      .repartition(col("user_id"))
      .groupBy(col("user_id"), col("item_b"))
      .agg(sum(col("c")).as("score"), max(col("__seen")).as("__s"))
      .filter(!col("__s"))
      .select(col("user_id"), col("item_b"), col("score"))
    Relational.topKPerGroup(unseen, Seq("user_id"),
        Seq(col("score").desc, col("item_b").asc), k)
      .select(col("user_id"), col("rk"), col("item_b").as("item_id"), col("score"))
  }

  /** [[itemNeighbors]] keeping the per-item neighbor rank (`nb_rank`,
    * 1-based under (c desc, item_b asc)) — the nested-grid primitive:
    * `nb_rank <= m` of one maxNeighbors fit IS itemNeighbors(inter, m)
    * for every m <= maxNeighbors, so a cap grid fits ONCE at the largest
    * cap instead of once per point. */
  def itemNeighborsRanked(inter: DataFrame, maxNeighbors: Int = 50,
      maxBasket: Int = 0): DataFrame = {
    val t =
      if (maxBasket > 0)
        Interactions.recentN(inter, maxBasket).select(col("user_id"), col("item_id"))
      else inter.select(col("user_id"), col("item_id"))
        .repartition(col("user_id")).distinct()
    val pairs = t.as("a").join(t.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item_id") =!= col("b.item_id"))
      .select(col("a.item_id").as("item_a"), col("b.item_id").as("item_b"))
      .repartition(col("item_a"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("c"))
    Relational.topKPerGroup(pairs, Seq("item_a"),
        Seq(col("c").desc, col("item_b").asc), maxNeighbors, "__nrk")
      .withColumnRenamed("__nrk", "nb_rank")
  }

  /** The whole neighbor-cap grid in ONE candidate pass: per-cap recs
    * identical to `recommend(inter, itemNeighbors(inter, m), k)` for every
    * m in `caps`, but the scored candidate stream (|history| × M rows —
    * the grid's dominant cost) crosses its one user_id shuffle ONCE
    * instead of once per grid point. Per-cap scores are conditional sums
    * over the shared ranked-neighbor join (`sum(c) filter nb_rank <= m` —
    * exact same integer totals as the per-cap fit, since a cap-m neighbor
    * list is the rank-<=m prefix of the largest fit); the aggregated
    * per-user frame is materialized once (users × distinct-candidates
    * rows, ContextCleaner-reclaimed) and each cap's top-k window re-reads
    * it instead of replaying the candidate join. Output adds `cap` to the
    * recommend schema; row-parity with the per-cap form is spec-pinned
    * (CooccurSpec) and q53's oracle replays each cap independently.
    *
    * `neighborsRanked` must come from [[itemNeighborsRanked]] with
    * maxNeighbors >= max(caps) (required). */
  def recommendMultiCap(inter: DataFrame, neighborsRanked: DataFrame,
      caps: Seq[Int], k: Int = 10, maxBasket: Int = 0): DataFrame = {
    require(caps.nonEmpty, "empty cap grid")
    val t = inter.select(col("user_id"), col("item_id")).distinct()
    val hist =
      if (maxBasket > 0)
        Interactions.recentN(inter, maxBasket).select(col("user_id"), col("item_id"))
      else t
    val cand = hist.join(neighborsRanked, hist("item_id") === neighborsRanked("item_a"))
      .select(col("user_id"), col("item_b"), col("c"), col("nb_rank"),
        lit(false).as("__seen"))
    val seenRows = t.select(col("user_id"), col("item_id").as("item_b"),
      lit(null).cast("long").as("c"), lit(null).cast("int").as("nb_rank"),
      lit(true).as("__seen"))
    val capScores = caps.map(m =>
      sum(when(col("nb_rank") <= m, col("c"))).as(s"__score_$m"))
    val scored = cand.unionByName(seenRows)
      .repartition(col("user_id"))
      .groupBy(col("user_id"), col("item_b"))
      .agg(capScores.head, capScores.tail :+ max(col("__seen")).as("__s"): _*)
      .filter(!col("__s"))
      .localCheckpoint() // one pass feeds every cap's top-k branch
    caps.map { m =>
      val unseen = scored.filter(col(s"__score_$m").isNotNull)
        .select(col("user_id"), col("item_b"), col(s"__score_$m").as("score"))
      Relational.topKPerGroup(unseen, Seq("user_id"),
          Seq(col("score").desc, col("item_b").asc), k)
        .select(lit(m).as("cap"), col("user_id"), col("rk"),
          col("item_b").as("item_id"), col("score"))
    }.reduce(_ unionByName _)
  }
}
