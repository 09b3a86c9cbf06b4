package graft.rank

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order next-item transition model (the Markov-chain leg of
  * sequential recommendation — Rendle et al. 2010's FPMC factorizes
  * exactly this matrix). Extension scope: the reference's per-user
  * features are non-sequential NVTabular ops (Categorify/JoinGroupby,
  * src/workflow_builder.py:18-75) — it has no sequence model; this is
  * the standard zero-training sequential baseline beside it. Counts
  * consecutive (item → next item) pairs inside a session gap and turns
  * them into smoothed conditional probabilities P(next | current) — the
  * zero-training baseline ranker beside Cooccur (symmetric co-baskets)
  * and ALS (learned factors).
  *
  * Scale design: ONE events-wide shuffle on the user key feeds the
  * ordering window (lead), then ONE repartition on src_item serves both
  * the (src, dst) count aggregation (subset-key clustering — the Cooccur
  * trick) and the per-src total window, so the transition matrix —
  * bounded by |items|², never event volume — is built with two exchanges
  * total and no exchange over the aggregated matrix. The probability is
  * a single IEEE division of two exact longs, so results replay
  * bit-identically in any engine.
  */
object Markov {

  /** Transition counts + conditional probabilities from an event log.
    *
    * @param events  (userCol, itemCol, tsCol, tieCol) rows; tsCol is an
    *                integer timestamp (e.g. epoch micros), tieCol breaks
    *                equal-timestamp ordering deterministically
    * @param gap     max tsCol distance between consecutive events for a
    *                transition to count (a session boundary otherwise)
    * @return (src_item, dst_item, n, n_src, p) — n transitions observed,
    *         n_src the row's out-degree total, p = n / n_src
    */
  def transitions(events: DataFrame, userCol: String, itemCol: String,
      tsCol: String, tieCol: String, gap: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(userCol), col(itemCol), col(tsCol), col(tieCol))
      .withColumn("__dst", lead(col(itemCol), 1).over(w))
      .withColumn("__gap", lead(col(tsCol), 1).over(w) - col(tsCol))
      .filter(col("__dst").isNotNull && col("__gap") <= gap)
      .select(col(itemCol).as("src_item"), col("__dst").as("dst_item"))
    // one exchange on src_item satisfies the (src, dst) aggregation
    // (subset-key clustering) AND the per-src total window — the matrix
    // itself never crosses another shuffle
    val counts = pairs
      .repartition(col("src_item"))
      .groupBy(col("src_item"), col("dst_item"))
      .agg(count(lit(1)).as("n"))
    val srcW = Window.partitionBy(col("src_item"))
    counts
      .withColumn("n_src", sum(col("n")).over(srcW))
      .withColumn("p", col("n").cast("double") / col("n_src"))
  }

  /** Rank next-item candidates for a current item: the matrix row, top-k
    * by count (then dst asc — deterministic). The matrix is items²-bounded
    * so the per-src top-k is a partial-aggregable window over the already
    * src-clustered counts. */
  def nextItems(matrix: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("src_item"))
      .orderBy(col("n").desc, col("dst_item").asc)
    matrix.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
