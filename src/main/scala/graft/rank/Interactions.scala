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
}
