package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based profiling — the 100 TB form of the exact corpus profile
  * (q29). Exact per-group DISTINCT shuffles every distinct value and exact
  * percentiles buffer whole groups; both are fine at validation scale and
  * ruinous at fleet scale. The sketch forms are one-pass, fixed-memory and
  * MERGEABLE (partial aggregation works map-side, and sketches from
  * separate partitions/days union losslessly), which is what makes daily
  * corpus monitoring over 100 TB a single linear job:
  *
  *  - distinct counts → HyperLogLog++ (`approx_count_distinct`, relative
  *    error `rsd`, default 5%; 1.5 KB of state at 5% vs gigabytes of
  *    distinct keys);
  *  - quantiles → the Greenwald–Khanna sketch (`approx_percentile`,
  *    `accuracy` trades memory for error bound 1/accuracy).
  *
  * Error bounds are asserted against the exact forms in ApproxStatsSpec;
  * the 10× exact-vs-sketch cost gap is measured in ScaleExperiment
  * (`sketch` case, SCALE.md). Not oracle-checked by design: sketch
  * implementations differ across engines, so cross-engine equality is the
  * wrong contract — bounded error vs exact is the right one.
  */
object ApproxStats {

  /** Per-group sketch profile: row count, approximate distinct of
    * `distinctCol`, and approximate quantiles of `valueCol`. */
  def approxProfile(df: DataFrame, groupCols: Seq[String], distinctCol: String,
      valueCol: String, quantiles: Seq[Double] = Seq(0.5, 0.95, 0.99),
      rsd: Double = 0.05, accuracy: Int = 10000): DataFrame = {
    val qArr = array(quantiles.map(lit): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col(distinctCol), rsd).as(s"approx_distinct_$distinctCol"),
        approx_percentile(col(valueCol), qArr, lit(accuracy)).as(s"approx_q_$valueCol"))
  }

  /** Global approximate distinct of each given column in ONE pass over the
    * data (one HLL state per column — contrast COUNT(DISTINCT a), (DISTINCT
    * b), ... which Spark plans as an Expand: one input copy per column). */
  def approxDistinctEach(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    df.agg(
      approx_count_distinct(col(cols.head), rsd).as(s"approx_distinct_${cols.head}"),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(s"approx_distinct_$c")): _*)
}
