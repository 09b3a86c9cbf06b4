package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Cohort retention analysis — the activation/retention matrix every
  * product-analytics warehouse derives from its event stream: users
  * cohorted by first-seen period, each later period's activity counted
  * as (cohort, offset) cells with a retention rate against the cohort
  * size.
  *
  * Shuffle plan: ONE user-keyed repartition serves the first-seen
  * aggregate, the join back, AND the (cohort, offset, user) distinct
  * (user is a subset of every clustering downstream — the Cooccur
  * trick), then one partial-aggregated shuffle on the (cohort, offset)
  * cell key. Only the matrix itself — periods² rows, data-independent —
  * crosses the final cohort-keyed exchange for the cohort-size window,
  * so the event-volume data crosses exactly two exchanges and the
  * biggest cohort never lands on one task before the partial agg. Rates
  * are single IEEE divisions of exact longs.
  */
object Retention {

  /** @param events   (userCol, tsCol) rows, tsCol an epoch-micros long
    * @param periodUs cohort/activity bucket width in micros (e.g. 1 day
    *                 = 86400000000L)
    * @return (cohort_period, offset, n_active, cohort_size, rate) —
    *         cohort_period = first-seen bucket index, offset = activity
    *         bucket − cohort bucket, offset 0 row ≡ the cohort size
    */
  def matrix(events: DataFrame, userCol: String, tsCol: String,
      periodUs: Long): DataFrame = {
    val ev = events
      .select(col(userCol).as("__u"),
        expr(s"$tsCol div $periodUs").as("__p"))
      .repartition(col("__u"))
    val first = ev.groupBy(col("__u")).agg(min(col("__p")).as("cohort_period"))
    val cells = ev.join(first, Seq("__u"))
      .select(col("cohort_period"), (col("__p") - col("cohort_period")).as("offset"),
        col("__u"))
      .distinct()
    val counts = cells
      .groupBy(col("cohort_period"), col("offset"))
      .agg(count(lit(1)).as("n_active"))
    val w = Window.partitionBy(col("cohort_period"))
    counts
      .withColumn("cohort_size",
        max(when(col("offset") === 0L, col("n_active"))).over(w))
      .withColumn("rate", col("n_active").cast("double") / col("cohort_size"))
  }
}
