package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Mean-target encoding with additive smoothing — the high-cardinality
  * categorical encoder of the NVTabular op family beside Categorify
  * (reference capability: workflow_builder.py's op graph; target encoding
  * is the canonical RecSys-competition feature for ids too sparse to
  * embed). Two forms:
  *
  *  - [[fit]]/[[TargetEncModel.transform]]: per-category smoothed mean
  *    `(sum_y + prior·alpha) / (n + alpha)` fitted on train, applied to any
  *    split; unseen categories fall back to the global prior.
  *  - [[looEncode]]: the leakage-safe TRAIN-side form — each row's own
  *    target is excluded from its category mean
  *    (`(sum_y − y_i + prior·alpha) / (n − 1 + alpha)`), the standard
  *    leave-one-out guard against the encoder memorizing the label. Same
  *    leakage discipline as [[graft.operators.AsOfJoin]], at the row level.
  *
  * Scale/determinism: one window (fit: one aggregation) on the category —
  * no self-joins; sums run as exact DECIMAL(18,4) (the QueryHelpers.dsum
  * discipline), so the encoded doubles are bit-reproducible across runs,
  * partitionings and engines — oracle q67 hash-matches DuckDB replaying
  * the same arithmetic.
  */
object TargetEncoder {

  private val dec = DecimalType(18, 4)

  /** Global prior = exact-decimal mean of the target (one bounded collect,
    * same pattern as ZScoreEstimator). */
  def prior(df: DataFrame, targetCol: String): Double =
    df.agg((sum(col(targetCol).cast(dec)).cast("double") / count(lit(1))).as("p"))
      .head().getDouble(0)

  final case class TargetEncModel(mapping: DataFrame, catCol: String, prior: Double) {
    /** Join the fitted encoding onto `df`; unseen categories get the prior. */
    def transform(df: DataFrame, encCol: String = "te"): DataFrame =
      df.join(broadcast(mapping), Seq(catCol), "left")
        .withColumn(encCol, coalesce(col("__te"), lit(prior)))
        .drop("__te")
  }

  /** Fit per-category smoothed means on (typically) the train split. */
  def fit(df: DataFrame, catCol: String, targetCol: String, alpha: Double): TargetEncModel = {
    require(alpha >= 0, s"alpha must be non-negative, got $alpha")
    val p = prior(df, targetCol)
    val mapping = df.groupBy(col(catCol))
      .agg(((sum(col(targetCol).cast(dec)).cast("double") + p * alpha) /
        (count(lit(1)) + alpha)).as("__te"))
    TargetEncModel(mapping, catCol, p)
  }

  /** Leave-one-out encode of the training rows themselves. `alpha > 0`
    * required: it is the denominator for singleton categories (a singleton
    * encodes to exactly the prior). */
  def looEncode(df: DataFrame, catCol: String, targetCol: String, alpha: Double,
      encCol: String = "te"): DataFrame = {
    require(alpha > 0, s"looEncode needs alpha > 0 (singleton categories), got $alpha")
    val p = prior(df, targetCol)
    val w = Window.partitionBy(col(catCol))
    val y = col(targetCol).cast(dec)
    df.withColumn(encCol,
      ((sum(y).over(w) - y).cast("double") + lit(p) * alpha) /
        (count(lit(1)).over(w) - lit(1) + alpha))
  }
}
