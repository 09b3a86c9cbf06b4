package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data mixture construction: deterministically down-sample a
  * corpus so each group (source, language, domain...) contributes a target
  * share of the output — the "data mix" step of a pre-training pipeline
  * (e.g. 50% web / 30% code / 20% books). Extension scope; the reference's
  * nearest analog is its global Bernoulli `SAMPLE(1)` pull
  * (my_merlin_flow.py:151-152), which has no per-group control.
  *
  * Determinism contract (same as Relational.hashSample): rows are ranked
  * inside each group by md5(key) — reproducible across runs, partitionings,
  * and engines, so the selected set is stable and oracle-checkable.
  *
  * Scale notes: caps live in a DataFrame keyed by group (broadcast-joined;
  * never a driver-side map over unbounded group cardinality). The rank is a
  * per-group window — partitioned, spillable; for a skewed hot group
  * compose with the two-phase pattern of Relational.topKPerGroupSalted.
  */
object DataMix {

  /** Keep at most `cap(group)` rows per group, deterministically: rows are
    * ranked by md5(key) inside each group and ranks above the group's cap
    * are dropped. Groups absent from `caps` are dropped entirely (an explicit
    * mix lists everything it wants). `caps` must have columns (groupCol,
    * `cap`). */
  def capPerGroup(df: DataFrame, groupCol: String, key: Column, caps: DataFrame): DataFrame = {
    val rank = row_number().over(
      Window.partitionBy(col(groupCol)).orderBy(md5(key.cast("string")), key))
    // join BEFORE ranking so dropped groups are never sorted
    df.join(broadcast(caps), Seq(groupCol))
      .withColumn("__rank", rank)
      .filter(col("__rank") <= col("cap"))
      .drop("__rank", "cap")
  }

  /** Keep at most `cap` rows per group for a CONSTANT cap — the
    * RefinedWeb/C4 per-domain cap: no caps table, no broadcast, one
    * per-group window with the same deterministic md5 rank as
    * [[capPerGroup]] (groups here are unbounded-cardinality URL hosts, so
    * a caps-table broadcast would grow with the corpus — the constant
    * folds into the filter instead). A single viral domain rides the
    * window partitioned, spillable; compose with the
    * topKPerGroupSalted two-phase pattern if one domain dominates the
    * corpus. */
  def capPerGroupConstant(df: DataFrame, group: Column, key: Column,
      cap: Long): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val rank = row_number().over(
      Window.partitionBy(group).orderBy(md5(key.cast("string")), key))
    df.withColumn("__rank", rank).filter(col("__rank") <= cap).drop("__rank")
  }

  /** Down-sample to a target mix: `proportions` maps group value → share of
    * `totalRows`; each group's cap is floor(share · totalRows). Groups with
    * fewer rows than their cap simply contribute everything they have (the
    * rank filter can never exceed a group's size, so no separate count pass
    * over the corpus is needed — the standard mixture behavior when a
    * source runs dry). Callers wanting exactly totalRows should over-ask
    * and trim. */
  def sampleToMix(df: DataFrame, groupCol: String, key: Column,
      proportions: Map[String, Double], totalRows: Long): DataFrame = {
    require(proportions.values.forall(p => p >= 0 && p <= 1),
      s"proportions must be in [0,1]: $proportions")
    val spark = df.sparkSession
    import spark.implicits._
    val caps = proportions.toSeq.toDF(groupCol, "__p")
      .select(col(groupCol), floor(col("__p") * totalRows).cast("long").as("cap"))
    capPerGroup(df, groupCol, key, caps)
  }

  /** Temperature-reweighted mixture shares (the standard multilingual /
    * multi-source mixing rule — XLM-R's α-sampling, the Pile/Llama source
    * weighting): share_g = n_g^α / Σ_h n_h^α over the observed group
    * counts. α = 1 is proportional, α = 0 uniform; in between upsamples
    * small sources. One group-cardinality-sized aggregate + a 1-row
    * broadcast total — no driver round trip, no corpus second pass.
    *
    * Determinism: the group weight is QUANTIZED to an exact integer,
    * floor(n^α · 2²⁶), so the total is an exact integer sum (association-
    * free) and the share one double division of two exact longs —
    * bit-identical in any engine, any partitioning. A float weight sum
    * would associate by partition arrival; a DECIMAL cast of a double is
    * engine-specific in its 18th digit — both measured traps. The <2⁻²⁶
    * relative quantization is noise against mixing-share semantics.
    * α = 0.5 rides IEEE `sqrt` (correctly rounded — reproducible in ANY
    * engine); other α run through `pow` (libm-specific — spec territory,
    * keep it off oracle surfaces). */
  val WeightScale: Long = 1L << 26

  def temperatureShares(df: DataFrame, groupCol: String, alpha: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1]: $alpha")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val w = if (alpha == 0.5) sqrt(col("n")) else pow(col("n"), lit(alpha))
    val weighted = counts.withColumn("__w",
      floor(w * lit(WeightScale)).cast("long"))
    // Sum the quantized weights through DECIMAL(38,0), not LONG: at α = 1
    // the total is Σ n_g · 2²⁶ = corpusRows · 2²⁶, which wraps a non-ANSI
    // long sum once the corpus passes ~2³⁷ ≈ 1.4e11 rows. DECIMAL(38,0)
    // is exact to 10³⁸ (≈ 2¹²⁶ row-equivalents — no practical ceiling),
    // and the two casts to double below are correctly rounded by IEEE
    // rule in any engine, so cross-engine bit-parity of `share` survives.
    val total = weighted.agg(
      sum(col("__w").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("__t"))
    weighted.crossJoin(broadcast(total))
      .select(col(groupCol), col("n"),
        (col("__w").cast("double") / col("__t").cast("double")).as("share"))
  }

  /** Down-sample to the temperature mix: each group's cap is
    * floor(share_g · totalRows) over [[temperatureShares]]; selection is
    * the same deterministic md5 rank as [[sampleToMix]]. */
  def sampleToTemperatureMix(df: DataFrame, groupCol: String, key: Column,
      alpha: Double, totalRows: Long): DataFrame = {
    val caps = temperatureShares(df, groupCol, alpha)
      .select(col(groupCol),
        floor(col("share") * totalRows).cast("long").as("cap"))
    capPerGroup(df, groupCol, key, caps)
  }

  /** Token-budget epoch plan — the "how many passes over each source" table
    * a pre-training run publishes (the Llama/Pile data recipe: sample
    * source g for e_g epochs so the mixture hits temperature shares within
    * a total token budget). Input: one row per group with its total token
    * count `n_tokens`; output adds
    *  - `share`   = w_g / Σw (temperature share over TOKEN mass, same
    *                quantized-integer weights as [[temperatureShares]]),
    *  - `epochs_e6` = min(maxEpochsE6, floor(share·budget/n_tokens · 10⁶))
    *                — fractional epochs in 1e-6 fixed point, capped by the
    *                repetition ceiling (data-repetition studies cap useful
    *                epochs; past the cap a source just contributes less),
    *  - `planned_tokens` = epochs_e6 · n_tokens DIV 10⁶ (exact integers —
    *                the number the shard packer actually draws).
    *
    * Determinism: weights/total are exact integers; `share` and the epoch
    * fraction are short identical-association double chains (each IEEE op
    * correctly rounded — reproducible in any engine; the only libm escape
    * is pow at α ∉ {0, 0.5, 1}, same contract as temperatureShares);
    * planned_tokens multiplies through DECIMAL(38,0) so a 10¹³-token
    * source times a 10⁸ epoch fraction cannot overflow a long. Uncapped
    * groups under-consume the budget only by floor dust; capped groups
    * return their surplus to nobody by design — re-run with the residual
    * budget over the uncapped groups if exact budget exhaustion matters
    * (two bounded passes, documented trade vs an iterative waterfill). */
  def epochPlan(tokenCounts: DataFrame, groupCol: String, alpha: Double,
      budgetTokens: Long, maxEpochsE6: Long): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1]: $alpha")
    require(budgetTokens > 0 && maxEpochsE6 > 0,
      s"budget and epoch cap must be positive: $budgetTokens, $maxEpochsE6")
    val w = if (alpha == 0.5) sqrt(col("n_tokens"))
      else pow(col("n_tokens"), lit(alpha))
    val weighted = tokenCounts.withColumn("__w",
      floor(w * lit(WeightScale)).cast("long"))
    val total = weighted.agg(
      sum(col("__w").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("__t"))
    weighted.crossJoin(broadcast(total))
      .withColumn("share",
        col("__w").cast("double") / col("__t").cast("double"))
      .withColumn("epochs_e6",
        when(col("n_tokens") > 0,
          least(
            floor(col("share") * lit(budgetTokens) / col("n_tokens")
              * lit(1000000.0)).cast("long"),
            lit(maxEpochsE6)))
          .otherwise(lit(0L)))
      .withColumn("planned_tokens",
        expr("CAST(CAST(epochs_e6 AS DECIMAL(38,0)) * CAST(n_tokens AS DECIMAL(38,0)) DIV 1000000 AS BIGINT)"))
      .select(col(groupCol), col("n_tokens"), col("share"),
        col("epochs_e6"), col("planned_tokens"))
  }
}
