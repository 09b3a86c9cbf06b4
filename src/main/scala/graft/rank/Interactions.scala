package graft.rank

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** User–item interaction assembly (reference: the 24-column pull feeding the
  * model, my_merlin_flow.py:154-185 — transactions keyed by customer and
  * article). The star-schema analog: orders ⨝ lineitem gives
  * (customer, part, order-date) purchase events.
  */
object Interactions {

  /** DataFrame[user_id, item_id, ts] from the test star schema. The join is
    * fact-to-fact on the order key (sort-merge at scale); dims are not
    * needed here so nothing else is scanned.
    */
  def fromStar(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    orders.join(li, orders("o_orderkey") === li("l_orderkey"))
      .select(
        col("o_custkey").as("user_id"),
        col("l_partkey").as("item_id"),
        col("o_orderdate").as("ts"))
  }

  /** Train/test split by time (reference: my_merlin_flow.py:196-199). */
  def splitByTime(inter: DataFrame, boundary: String): (DataFrame, DataFrame) = (
    inter.filter(col("ts") < lit(boundary).cast("timestamp")),
    inter.filter(col("ts") >= lit(boundary).cast("timestamp")))

  /** Per-user basket cap: each user's `n` most recently interacted DISTINCT
    * items (an item's recency = its latest interaction ts; ties break on
    * item_id asc — total order, deterministic in any engine). The upper
    * bound complementing the reference's lower bound (>= 5 interactions,
    * filtered_dataframe.sql:10; time-windowed pull my_merlin_flow.py:154-185)
    * — at 100 TB a hot user would otherwise make every downstream per-user
    * self-join quadratic in basket size (see Cooccur).
    *
    * Shuffle plan: ONE exchange. HashPartitioning(user_id) satisfies the
    * (user_id, item_id) aggregation (subset-key clustering) and the user_id
    * window; the window's row_number <= n prunes per partition
    * (WindowGroupLimit) before anything else sees the rows. Output keeps
    * `ts` (the item's latest interaction) so the result is still an
    * interactions frame.
    */
  def recentN(inter: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"basket cap must be positive, got $n")
    val latest = inter
      .select(col("user_id"), col("item_id"), col("ts"))
      .repartition(col("user_id"))
      .groupBy(col("user_id"), col("item_id"))
      .agg(max(col("ts")).as("ts"))
    graft.operators.Relational.topKPerGroup(latest, Seq("user_id"),
        Seq(col("ts").desc, col("item_id").asc), n, "__brk")
      .drop("__brk")
  }
}
