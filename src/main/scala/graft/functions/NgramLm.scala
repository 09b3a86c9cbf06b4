package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, StringType, StructType, StructField}

/** Bigram language-model quality scoring (the CCNet/KenLM-style filter:
  * Wenzek et al. 2020 — score documents by likelihood under an LM fitted
  * on a trusted reference corpus; low-likelihood docs are boilerplate,
  * gibberish, or wrong-domain). The LM here is an add-α-smoothed bigram
  * model — counts as DataFrames, so the "model" is two joinable tables
  * (same artifact philosophy as Categorify dictionaries and LangId
  * profiles), not driver state.
  *
  * Scale notes: fit is two partial-aggregated shuffles over the reference
  * (bigram and unigram counts); scoring is two left joins (broadcast when
  * the reference vocabulary is small, shuffle otherwise) + one per-doc
  * aggregation. The per-doc log-likelihood is summed through an exact
  * DECIMAL cast (same determinism contract as QueryHelpers.dsum), so
  * scores are bit-identical across partitionings.
  */
object NgramLm {

  case class Model(bigrams: DataFrame, unigrams: DataFrame, vocab: Long) {
    /** Release the fit-time blocks deterministically — BOTH fit modes
      * (round-10 advice): the `cache = true` caches unpersist directly;
      * the `cache = false` localCheckpoint blocks are freed via
      * Checkpoints.free (a no-op on any other plan shape, e.g. loaded
      * parquet models), so a bench loop reclaims vocabulary-sized blocks
      * immediately instead of waiting for driver GC to let the
      * ContextCleaner notice the dead frame. The model is unusable after
      * this call in checkpoint mode (blocks are unrecomputable). */
    def unpersist(): Unit = {
      bigrams.unpersist(); unigrams.unpersist()
      graft.operators.Checkpoints.free(bigrams)
      graft.operators.Checkpoints.free(unigrams)
    }

    /** Alias of [[unpersist]] (the explicit lifecycle verb used by the
      * graph loops' Checkpoints API). */
    def free(): Unit = unpersist()
  }

  /** Adjacent-token pair array: struct(w1, w2) per position; empty for
    * docs shorter than 2 tokens. `toks` must be a materialized column
    * (TextOps PERF CONTRACT). */
  def bigramPairs(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"), element_at(toks, i + 1).as("w2"))))
      .otherwise(array().cast(ArrayType(StructType(Seq(
        StructField("w1", StringType), StructField("w2", StringType))))))

  /** Fit bigram + unigram counts and vocabulary size on a reference
    * corpus. With `cache = true` (the default for a model scored more than
    * once) both count tables are cached — they are model artifacts,
    * vocabulary-sized, tiny next to the corpus — and the caller owns
    * releasing them via `model.unpersist()`. With `cache = false`
    * (fit-score-once paths that never get a post-materialization hook —
    * the q87 oracle query, bench reps) the tables are still materialized
    * ONCE, as eager localCheckpoints (round 10): the old pass-through
    * form re-ran the corpus aggregation for the vocabulary count AND for
    * every scoring join. Checkpoint blocks are vocabulary-sized and
    * ContextCleaner-reclaimed when the model frame dies, so nothing
    * accumulates across bench reps — the liability the flag existed to
    * avoid. [[save]] / [[load]] is the durable form. */
  def fit(ref: DataFrame, toks: Column, cache: Boolean = true): Model = {
    val bound = ref.select(toks.as("__toks"))
    val bi0 = bound.select(explode(bigramPairs(col("__toks"))).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    val uni0 = bound.select(explode(col("__toks")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val (bi, uni) = if (cache) (bi0.cache(), uni0.cache())
      else (bi0.localCheckpoint(), uni0.localCheckpoint())
    Model(bi, uni, uni.count())
  }

  /** Persist the fitted model as two parquet count tables — the durable
    * serving form, same artifact philosophy as Categorify dictionaries:
    * a restart [[load]]s instead of re-aggregating the reference corpus. */
  def save(model: Model, path: String): Unit = {
    model.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    model.unigrams.write.mode("overwrite").parquet(s"$path/unigrams")
  }

  /** Inverse of [[save]]: an uncached model backed by the parquet tables
    * (scoring joins read them directly; nothing to unpersist). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val uni = spark.read.parquet(s"$path/unigrams")
    Model(spark.read.parquet(s"$path/bigrams"), uni, uni.count())
  }

  /** Per-document add-α bigram log-likelihood against the model:
    * `n_bigrams`, `n_oov` (bigrams unseen in the reference), `sum_c12` /
    * `sum_c1` (exact integer evidence sums — the oracle-checkable half),
    * and `ll_mean` = mean over bigrams of ln((c12+α)/(c1+α·V)). Docs with
    * no bigrams report 0 counts and null ll_mean. */
  def scoreDocs(docs: DataFrame, idCol: String, toks: Column, model: Model,
      alpha: Double = 1.0, broadcastModel: Boolean = true): DataFrame = {
    // alpha = 0 would make an OOV bigram's logp = ln(0) = -Inf, which the
    // decimal cast nulls out — the doc would get a plausible-looking score
    // computed only over its SEEN bigrams instead of -Inf
    require(alpha > 0, s"alpha must be positive: $alpha")
    val bi0 = model.bigrams
    val uni0 = model.unigrams
    val (bi, uni) =
      if (broadcastModel) (broadcast(bi0), broadcast(uni0)) else (bi0, uni0)
    val pairs = docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol), explode(bigramPairs(col("__toks"))).as("p"))
      .select(col(idCol), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val logp = log((coalesce(col("c12"), lit(0L)) + lit(alpha)) /
      (coalesce(col("c1"), lit(0L)) + lit(alpha) * model.vocab))
    val scored = pairs
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("c12").isNull, 1)).as("n_oov"),
        sum(coalesce(col("c12"), lit(0L))).as("sum_c12"),
        sum(coalesce(col("c1"), lit(0L))).as("sum_c1"),
        // exact decimal sum of the per-row logs → partitioning-invariant
        (sum(logp.cast(DecimalType(38, 18))).cast("double") / count(lit(1)))
          .as("ll_mean"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("sum_c12"), lit(0L)).as("sum_c12"),
        coalesce(col("sum_c1"), lit(0L)).as("sum_c1"),
        col("ll_mean"))
  }
}
