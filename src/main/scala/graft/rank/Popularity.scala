package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.ShardPack

/** Time-decayed item popularity — the most-popular baseline every
  * retrieval stack serves under cold start (the reference serves a static
  * fallback record under the `no_user` key when a request has no history —
  * src/my_merlin_flow.py:626, read back by src/serverless/handler.py:53;
  * a popularity ranker is the standard upgrade of that static list), with
  * exponential recency decay so last week's fad outranks last year's.
  *
  * Exactness device: the decay is DYADIC — the weight halves every
  * `halfLifeDays` whole days and the exponent is clamped to `cap`
  * doublings, so each event's weight is the exact long 2^(cap − e) and
  * the per-item score is an exact integer sum (`score_scaled`, in units
  * of 2^−cap). No pow(), no float accumulation — the whole ranking
  * hash-replays in any engine, the same reason DataMix quantizes its
  * temperature weights.
  *
  * Scale: the as-of anchor is a 1-row broadcast (max ts); the score is
  * one partial-aggregated groupBy on the item key — map-side combine
  * bounds the shuffle at tasks × |items| rows. Nothing else.
  */
object Popularity {

  /** Per-item decayed popularity. Input rows: (itemCol, tsCol) with tsCol
    * an epoch-micros long. Weight halves every `halfLifeDays` from the
    * corpus max timestamp; events older than cap·halfLife contribute the
    * floor weight 1 (= 2^0), so nothing vanishes entirely and the sum
    * stays exact.
    *
    * Overflow budget: each event weighs at most 2^cap, so a long sum holds
    * at least 2^(62−cap) FULL-WEIGHT events per item before overflowing —
    * cap=40 (default) ⇒ ≥4M events inside one half-life per item; older
    * events weigh geometrically less, so real capacity is far higher.
    * `cap` is capped at 55 (≥128-event headroom even in the worst case),
    * and under this engine's ANSI-on sessions an overflow THROWS rather
    * than wrapping. A catalog hotter than 2^(62−cap) events/item/half-life
    * should lower `cap` (the floor weight only coarsens the oldest tail)
    * or widen the sum to DECIMAL(38,0) — the DataMix device.
    *
    * Output: (item, n_events, score_scaled, last_seen_us), score in units
    * of 2^−cap, ordered by score desc then item.
    */
  def decayedScores(events: DataFrame, itemCol: String, tsCol: String,
      halfLifeDays: Int, cap: Int = 40): DataFrame = {
    require(cap >= 1 && cap <= 55, s"cap must be in [1, 55], got $cap")
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    val anchor = events.agg(max(col(tsCol)).as("__asof"))
    events.select(col(itemCol).as("item"), col(tsCol).as("__ts"))
      .join(broadcast(anchor))
      .withColumn("__e", least(
        expr(s"(__asof - __ts) div ${86400000000L * halfLifeDays}"),
        lit(cap.toLong)))
      .withColumn("__w", expr(s"shiftleft(1L, $cap - __e)"))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__w")).as("score_scaled"),
        max(col("__ts")).as("last_seen_us"))
      .orderBy(col("score_scaled").desc, col("item"))
  }

  /** Popularity-concentration report: the Gini coefficient of the item
    * interaction distribution (the popularity-bias datasheet number every
    * recsys evaluation quotes — Abdollahpouri et al. 2019) plus the
    * top-k share, as ONE row of exact integers and two IEEE divisions.
    *
    * Gini needs every item's rank in count order — a global sort. The
    * rank is computed by [[ShardPack.cumsum]]'s two-level exact prefix
    * sum (weight 1 ⇒ inclusive cumsum = row number), NOT a
    * single-partition window: per-bucket windows + a 256-row offset
    * table, so a 100M-item catalog ranks in parallel. With ties the
    * rank assignment within a tie group is arbitrary but Σ rank·n is
    * tie-invariant, so every output cell is deterministic anyway.
    *
    * Output: n_items, n_events, gini_num, gini_den (exact longs;
    * gini = num/den), gini, topk_events, topk_share. Long-exact while
    * N·Σn < 2^62 (a 10⁹-item, 10¹²-interaction catalog overflows —
    * widen the two sums to DECIMAL(38,0) there, the DataMix device).
    */
  def concentration(events: DataFrame, itemCol: String, topK: Int = 10): DataFrame = {
    val counts = events.groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("n"))
    val ranked = ShardPack.cumsum(counts, "n", lit(1L), "rk",
      tieBreak = Seq(col("item")))
    // Gini (ascending ranks 1..N): (2·Σ rk·n − (N+1)·Σn) / (N·Σn)
    val totals = ranked.agg(
      count(lit(1)).as("n_items"),
      sum(col("n")).as("n_events"),
      sum(col("rk") * col("n") * 2L).as("srn"))
    // top-k share from a bounded TakeOrdered over the counts table
    val top = counts.orderBy(col("n").desc, col("item").asc).limit(topK)
      .agg(sum(col("n")).as("topk_events"))
    totals.join(broadcast(top))
      .select(col("n_items"), col("n_events"),
        (col("srn") - (col("n_items") + 1L) * col("n_events")).as("gini_num"),
        (col("n_items") * col("n_events")).as("gini_den"),
        ((col("srn") - (col("n_items") + 1L) * col("n_events")).cast("double")
          / (col("n_items") * col("n_events"))).as("gini"),
        col("topk_events"),
        (col("topk_events").cast("double") / col("n_events")).as("topk_share"))
  }
}
