package graft.features

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{GopherQuality, NgramLm, Repetition, TextOps}

/** Learned document-quality classifier — the CCNet-style third leg of the
  * corpus-quality stack (Wenzek et al. 2020 train a linear model over
  * LM/heuristic signals; the reference stack's rule battery and perplexity
  * scorer are the other two legs, GopherQuality + NgramLm). A logistic
  * regression over the engine's OWN quality signals: the eight integer
  * Gopher metrics, the Repetition fractions, and (optionally) the bigram-LM
  * mean log-likelihood. Extension scope — no reference counterpart.
  *
  * Architecture: spark.ml LogisticRegression is the TRAINER only. The
  * fitted model is (featureNames, weights, intercept) — persisted as a
  * tiny parquet table like a Categorify dictionary — and SERVING is a plain
  * column expression (`margin`), so scoring rides whole-stage codegen with
  * no ml runtime, no UDF, and no vector assembly on the hot path. The
  * sigmoid is monotone, so `keep` thresholds the margin at 0 directly —
  * the probability itself is only computed when asked for.
  *
  * Scale notes: featurize is the union of its inputs' shapes (Gopher: pure
  * projection; Repetition: two partial-agg shuffles; LM: two broadcast
  * joins + one agg). Train aggregates gradients over however much labeled
  * data exists — labeled sets are corpus-samples, small by construction.
  * Scoring is one pure projection over the feature frame: zero shuffles,
  * broadcast nothing, collect nothing.
  */
object QualityClassifier {

  /** The default feature set: the eight integer Gopher metrics plus the
    * two repetition fractions (all engine-reproducible, no floats beyond
    * the fractions' single division). */
  val BaseFeatures: Seq[String] = Seq(
    "n_words", "total_len", "n_alpha", "n_sym", "n_lines", "n_bullet",
    "n_ellipsis", "n_stop", "top_gram_frac", "dup_line_frac")

  final case class Model(featureNames: Seq[String], weights: Array[Double],
      intercept: Double) {
    require(featureNames.size == weights.length,
      s"${featureNames.size} names vs ${weights.length} weights")
  }

  /** Assemble the quality-signal feature frame: id + one numeric column per
    * feature. `lm` adds `ll_mean` (bigram mean log-likelihood; docs with no
    * bigrams get the neutral 0.0 — a real null would poison the margin). */
  def featurize(docs: DataFrame, idCol: String, textCol: String,
      lm: Option[NgramLm.Model] = None): DataFrame = {
    val gopher = GopherQuality.metrics(docs, idCol, textCol).drop("keep")
    val rep = Repetition.topNgramStats(
        docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks")),
        idCol, col("__toks"), 2)
      .select(col(idCol), col("top_gram_frac"))
    val dup = docs.select(col(idCol),
      Repetition.duplicateLineFraction(split(col(textCol), "\n")).as("dup_line_frac"))
    val base = gopher.join(rep, Seq(idCol)).join(dup, Seq(idCol))
    lm match {
      case None => base
      case Some(m) =>
        base.join(
          NgramLm.scoreDocs(docs, idCol, TextOps.tokens(col(textCol)), m)
            .select(col(idCol), coalesce(col("ll_mean"), lit(0.0)).as("ll_mean")),
          Seq(idCol))
    }
  }

  /** The linear margin z = intercept + Σ wᵢ·xᵢ as ONE column expression,
    * associated strictly left-to-right so an external engine replaying the
    * same text reproduces it bit-for-bit (IEEE ops round identically when
    * the association order matches — the oracle contract). */
  def margin(model: Model): Column =
    marginOver(model, model.featureNames.map(n => n -> col(n)).toMap)

  /** The same margin over EXPLICIT feature expressions — lets a caller
    * build a pure single-pass filter from per-row expressions (e.g. the
    * Gopher metrics over raw text) instead of materialized columns. */
  def marginOver(model: Model, features: Map[String, Column]): Column =
    model.featureNames.zip(model.weights).foldLeft(lit(model.intercept)) {
      case (acc, (name, w)) => acc + lit(w) * features(name).cast("double")
    }

  /** Score a feature frame: margin `z`, probability `p` = σ(z), and the
    * decision `keep` = z > 0 (σ is monotone; the threshold never needs the
    * transcendental). Pure projection — no shuffle, no UDF, no ml. */
  def score(features: DataFrame, model: Model): DataFrame = {
    val z = margin(model)
    features.withColumn("z", z)
      .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("z"))))
      .withColumn("keep", col("z") > 0)
  }

  /** Fit by L-BFGS logistic regression (spark.ml) on a labeled feature
    * frame. `standardization = false` keeps the learned weights in raw
    * feature units so `margin` applies them without carrying scaler state.
    * Determinism: the gradient is a commutative+associative treeAggregate
    * over a deterministic input — QualityClassifierSpec pins fit-twice
    * equality. */
  def train(features: DataFrame, labelCol: String,
      featureNames: Seq[String] = BaseFeatures, regParam: Double = 0.0,
      maxIter: Int = 50): Model = {
    val assembled = new VectorAssembler()
      .setInputCols(featureNames.toArray).setOutputCol("__features")
      .transform(features.select(
        (col(labelCol).cast("double").as("__label")) +:
          featureNames.map(n => col(n).cast("double").as(n)): _*))
    val lr = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setRegParam(regParam).setMaxIter(maxIter).setStandardization(false)
    val fitted = lr.fit(assembled)
    Model(featureNames, fitted.coefficients.toArray, fitted.intercept)
  }

  /** Persist as one tiny parquet table (feature, idx, weight; the intercept
    * is the idx = -1 row) — the Categorify-dictionary artifact philosophy:
    * a restart [[load]]s instead of refitting. */
  def save(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    (model.featureNames.zipWithIndex.map { case (n, i) =>
      (n, i, model.weights(i))
    } :+ (("__intercept", -1, model.intercept)))
      .toDF("feature", "idx", "weight")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .select("feature", "idx", "weight").collect()
    val feats = rows.filter(_.getInt(1) >= 0).sortBy(_.getInt(1))
    Model(feats.map(_.getString(0)).toSeq, feats.map(_.getDouble(2)),
      rows.find(_.getInt(1) == -1).map(_.getDouble(2)).getOrElse(0.0))
  }
}
