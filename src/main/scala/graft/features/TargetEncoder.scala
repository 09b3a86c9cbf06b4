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

  /** Global prior = exact-decimal mean of the NON-NULL targets (one bounded
    * collect, same pattern as ZScoreEstimator). Sums skip nulls, so counts
    * must too — count(*) would deflate the mean for nully targets. */
  def prior(df: DataFrame, targetCol: String): Double = {
    val row = df.agg((sum(col(targetCol).cast(dec)).cast("double") /
      count(col(targetCol))).as("p")).head()
    require(!row.isNullAt(0),
      s"cannot fit a prior: no non-null '$targetCol' rows")
    row.getDouble(0)
  }

  final case class TargetEncModel(mapping: DataFrame, catCol: String, prior: Double) {
    /** Join the fitted encoding onto `df`; unseen categories get the prior.
      * No broadcast hint: the mapping is category-sized, which at the
      * hundreds-of-millions cardinality this encoder targets can exceed
      * broadcast limits — Spark/AQE picks broadcast vs shuffle by size. */
    def transform(df: DataFrame, encCol: String = "te"): DataFrame =
      df.join(mapping, Seq(catCol), "left")
        .withColumn(encCol, coalesce(col("__te"), lit(prior)))
        .drop("__te")
  }

  /** Fit per-category smoothed means on (typically) the train split.
    * Null targets contribute to neither sums nor counts. */
  def fit(df: DataFrame, catCol: String, targetCol: String, alpha: Double): TargetEncModel = {
    require(alpha >= 0, s"alpha must be non-negative, got $alpha")
    val p = prior(df, targetCol)
    val mapping = df.groupBy(col(catCol))
      .agg(((sum(col(targetCol).cast(dec)).cast("double") + p * alpha) /
        (count(col(targetCol)) + alpha)).as("__te"))
    TargetEncModel(mapping, catCol, p)
  }

  /** Leave-one-out encode of the training rows themselves. `alpha > 0`
    * required: it is the denominator for singleton categories (a singleton
    * encodes to exactly the prior). Rows with a null target encode to null
    * (there is no label to leave out) and are excluded from every other
    * row's sums and counts.
    */
  def looEncode(df: DataFrame, catCol: String, targetCol: String, alpha: Double,
      encCol: String = "te"): DataFrame = {
    require(alpha > 0, s"looEncode needs alpha > 0 (singleton categories), got $alpha")
    val p = prior(df, targetCol)
    val w = Window.partitionBy(col(catCol))
    val y = col(targetCol).cast(dec)
    // null y: the numerator (sum − y) is null, so the encoding is null; the
    // denominator uses the NON-NULL count, so other rows are unaffected
    df.withColumn(encCol,
      ((sum(y).over(w) - y).cast("double") + lit(p) * alpha) /
        (count(y).over(w) - lit(1) + alpha))
  }
}
