package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-rate spike detection over bucketed counts — the pipeline-ops
  * monitor that catches an ingest storm / error burst in the same engine
  * that processes the data (extension scope; the reference has no
  * monitoring surface). EXACT INTEGER EWMA: the smoothing constant is
  * fixed at 1/2, so the baseline is Σ_{j=1..H} count_{t−j} DIV 2^j — a
  * pure lag-battery projection over a per-group window (no recurrence, no
  * floats, bit-identical in any engine; total weight → 1 as H grows, H=8
  * ≈ 0.996). The spike test cross-multiplies integers
  * (count·den > num·baseline), the GopherQuality device, so the whole
  * report sits on the oracle hash surface.
  *
  * Lag is over OBSERVED buckets (a silent group emits no rows, so a gap
  * is one lag step, not many) — the right semantics for "is this burst
  * abnormal vs recent activity"; densify the bucket grid upstream
  * (AsOfJoin.resample) if wall-clock decay matters more than activity
  * decay. One partitioned window per group: spillable, parallel across
  * groups, never a global sort.
  */
object RateMonitor {

  /** Adds `baseline` (the halved-weight sum of the previous `halfLives`
    * bucket counts) and `is_spike` (count/baseline > num/den, integer
    * cross-multiplied; false while baseline is 0 — the warmup rows). */
  def spikes(counts: DataFrame, groupCol: String, bucketCol: String,
      countCol: String, halfLives: Int = 8, num: Long = 3L,
      den: Long = 1L): DataFrame = {
    require(halfLives >= 1 && halfLives <= 62, s"halfLives: $halfLives")
    require(num > 0 && den > 0, s"spike ratio must be positive: $num/$den")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(bucketCol))
    val baseline = (1 to halfLives)
      .map(j => expr(s"CAST(__lag$j DIV ${1L << j} AS BIGINT)"))
      .reduce(_ + _)
    val lagged = (1 to halfLives).foldLeft(counts) { (df, j) =>
      df.withColumn(s"__lag$j", lag(col(countCol), j, 0L).over(w))
    }
    lagged
      .withColumn("baseline", baseline)
      .withColumn("is_spike",
        col("baseline") > 0 && col(countCol) * lit(den) > lit(num) * col("baseline"))
      .drop((1 to halfLives).map(j => s"__lag$j"): _*)
  }

  /** CUSUM level-shift detection (Page 1954) — the complement of
    * [[spikes]]: EWMA catches a one-bucket burst, CUSUM catches a
    * SUSTAINED drift that never spikes (each bucket only slightly high,
    * the sum marching away). EXACT INTEGER form: the baseline is the
    * first `warmup` buckets' mean as the rational sum/warmup, deviations
    * are kept in units of 1/warmup (dev_scaled = count·warmup − Σ_warmup,
    * an exact long), and the running CUSUM is a window prefix sum of
    * longs — bit-identical anywhere, the whole report on the oracle hash
    * surface. Alarm when |cusum| exceeds `threshold` warmup-means
    * (cross-multiplied, no division).
    *
    * One partitioned window per group (spillable, parallel across
    * groups); warmup rows report cusum 0 / no alarm.
    */
  def cusum(counts: DataFrame, groupCol: String, bucketCol: String,
      countCol: String, warmup: Int = 7, threshold: Long = 3L): DataFrame = {
    require(warmup >= 1, s"warmup must be >= 1: $warmup")
    require(threshold >= 1, s"threshold must be >= 1: $threshold")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(bucketCol))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withBase = counts
      .withColumn("__rn", row_number().over(w))
      .withColumn("__bsum",
        sum(when(col("__rn") <= warmup, col(countCol))).over(
          Window.partitionBy(col(groupCol))))
    withBase
      .withColumn("__dev",
        when(col("__rn") > warmup,
          col(countCol) * lit(warmup.toLong) - col("__bsum")).otherwise(lit(0L)))
      .withColumn("cusum_scaled", sum(col("__dev")).over(wAll))
      .withColumn("is_shift",
        col("__rn") > warmup &&
          abs(col("cusum_scaled")) > lit(threshold) * col("__bsum"))
      .drop("__rn", "__bsum", "__dev")
  }
}
