package graft.rank

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-decayed item popularity — the most-popular baseline every
  * retrieval stack serves under cold start (the reference falls back to a
  * popularity vector when a user has no history, my_merlin_flow.py:350),
  * with exponential recency decay so last week's fad outranks last
  * year's.
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
    * Output: (item, n_events, score_scaled, last_seen_us), score in units
    * of 2^−cap, ordered by score desc then item.
    */
  def decayedScores(events: DataFrame, itemCol: String, tsCol: String,
      halfLifeDays: Int, cap: Int = 40): DataFrame = {
    require(cap >= 1 && cap <= 62, s"cap must be in [1, 62], got $cap")
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
}
