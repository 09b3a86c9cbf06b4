package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * NeurIPS): pick raw-corpus documents whose hashed-n-gram distribution
  * looks like a trusted target corpus, by importance weight
  * w(x) = p_target(x) / p_raw(x) under two bag-of-hashed-n-grams models,
  * then Gumbel-top-k resample. The public method behind "quality-matched"
  * pre-training subsets; extension scope next to GopherQuality (rules),
  * QualityClassifier (learned) and NgramLm/CCNet (perplexity) — DSIR is the
  * fourth standard selector, the distribution-matching one.
  *
  * Spark-first dataflow: the "model" is a bucket-count DataFrame of bounded
  * size (`buckets` rows, default 8192) — broadcastable by construction, the
  * same artifact philosophy as Categorify dictionaries and NgramLm counts.
  * Fit = one explode + partial-aggregated groupBy per corpus (map-side
  * combine collapses to ≤`buckets` rows per task before the shuffle).
  * Scoring = explode + two broadcast left joins + one per-doc aggregation;
  * nothing is all-pairs and no driver state exists at any point, so the
  * whole path survives a 1000-executor 100 TB corpus unchanged.
  *
  * Cross-engine determinism: the feature hash is the first 12 hex digits of
  * md5 (QueryHelpers.hex48Sql replays it in ANSI SQL); the integer evidence
  * columns (n_feats, n_oov_t, sum_ct, sum_cr) are exact and sit on the
  * oracle surface; the per-doc log-weight is summed through an exact
  * decimal cast (QueryHelpers.dsum contract) so it is partitioning-
  * invariant, but ln itself is libm territory (last-ulp spread measured on
  * the BM25 surface, SCALE.md) — logw stays off hash-checked surfaces and
  * the SELECTION (integer doc_ids, boundary gaps many orders above ulp
  * noise) is what q122 oracle-checks.
  */
object Dsir {

  /** Hashed feature bucket of an n-gram string: 48-bit md5 prefix mod
    * `buckets` — positive, engine-replayable (no Spark-private hash). */
  def bucketOf(s: Column, buckets: Int): Column =
    conv(substring(md5(s), 1, 12), 16, 10).cast("long") % buckets

  /** Per-document hashed bag-of-n-grams feature array (unigrams + bigrams,
    * the DSIR paper's feature space). `toks` must be a materialized column
    * (TextOps PERF CONTRACT — HOF lambdas re-evaluate captured
    * expressions). Bigrams join on a single space: tokens are whitespace-
    * split, so "w1 w2" can never collide with a unigram. */
  def featureBuckets(toks: Column, buckets: Int): Column = {
    val unis = transform(toks, w => bucketOf(w, buckets))
    val bis = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => bucketOf(
          concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)),
          buckets)))
      .otherwise(array().cast("array<bigint>"))
    concat(unis, bis)
  }

  /** A fitted hashed-n-gram multinomial: bucket counts (≤ `buckets` rows)
    * plus the total feature count. Smoothed probability of bucket b is
    * (c_b + alpha) / (total + alpha·buckets). */
  case class Model(counts: DataFrame, total: Long, buckets: Int,
      aux: Seq[DataFrame] = Nil) {
    /** Release the fit-time blocks deterministically — both fit modes
      * (round-10 advice, same contract as NgramLm.Model.unpersist): the
      * cache unpersists directly; the `cache = false` localCheckpoint
      * blocks are freed via Checkpoints.free (no-op for loaded/other
      * plans). `aux` carries any corpus-scale scaffolding the fit
      * materialized ([[fitRawAndScore]]'s exploded feature frame — round-16
      * ADVICE: it was block-manager-resident with no release handle) and
      * is freed here too — call only AFTER the scored frame has been
      * consumed (localCheckpoint blocks are unrecomputable). The model is
      * unusable after this call in checkpoint mode. */
    def unpersist(): Unit = {
      counts.unpersist()
      Checkpoints.free(counts)
      aux.foreach(Checkpoints.free)
    }

    /** Alias of [[unpersist]]. */
    def free(): Unit = unpersist()
  }

  /** Fit bucket counts over a corpus: one explode + one partial-aggregated
    * groupBy (at most `buckets` distinct keys → map-side combine bounds the
    * shuffle at tasks·buckets rows regardless of corpus size). With
    * `cache = true` (the default for a model scored more than once) the
    * count table is cached — it is a model artifact, ≤ `buckets` rows, tiny
    * next to the corpus — so the total here and every later scoring join
    * reuse ONE corpus pass; the caller owns `model.unpersist()`. With
    * `cache = false` the table is still materialized ONCE, as an eager
    * localCheckpoint (round 10): the old pass-through form re-ran the
    * whole corpus tokenize+aggregate for the `total` row AND for every
    * scoring join — two to three corpus passes per fit-score-once query
    * (measured on q121/q122). The checkpoint is ≤ `buckets` rows of
    * blocks, reclaimed by the ContextCleaner when the model frame dies,
    * so nothing accumulates across bench reps — the liability the flag
    * existed to avoid. [[save]]/[[load]] is the durable form. */
  def fit(corpus: DataFrame, toks: Column, buckets: Int = 8192,
      cache: Boolean = true): Model = {
    val c0 = corpus.select(toks.as("__toks"))
      .select(explode(featureBuckets(col("__toks"), buckets)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
    val c = if (cache) c0.cache() else c0.localCheckpoint()
    // coalesce: an EMPTY fit corpus sums to NULL — the model then has
    // total 0 and every bucket scores the uniform smoothing floor
    Model(c, c.agg(coalesce(sum(col("c")), lit(0L))).head.getLong(0), buckets)
  }

  /** Persist / load the model as a parquet count table (durable serving
    * form, same as NgramLm.save — a restart never re-aggregates the fit
    * corpus). */
  def save(model: Model, path: String): Unit =
    model.counts.withColumn("total", lit(model.total))
      .withColumn("buckets", lit(model.buckets))
      .write.mode("overwrite").parquet(path)

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val df = spark.read.parquet(path)
    val head = df.select(col("total"), col("buckets")).head
    Model(df.select(col("bucket"), col("c")), head.getLong(0), head.getInt(1))
  }

  /** Per-document importance evidence against a target and a raw model:
    * `n_feats` (hashed n-gram occurrences), `n_oov_t` (features unseen in
    * the target corpus), `sum_ct`/`sum_cr` (exact integer count evidence —
    * the oracle-checkable half, mirroring NgramLm.scoreDocs), and `logw` =
    * Σ_i [ln p_t(b_i) − ln p_r(b_i)] decimal-summed (partitioning-
    * invariant; association order mirrored in the oracle text). Docs with
    * no tokens report 0 counts and null logw. Both models must share
    * `buckets`. */
  def scoreDocs(docs: DataFrame, idCol: String, toks: Column,
      target: Model, raw: Model, alpha: Double = 1.0): DataFrame =
    scoreFeats(docs, idCol,
      docs.select(col(idCol), toks.as("__toks"))
        .select(col(idCol),
          explode(featureBuckets(col("__toks"), target.buckets)).as("bucket")),
      target, raw, alpha)

  /** Fit the RAW model and score in ONE feature-hash pass (round 15,
    * optimization: guide §2.3 "don't compute things twice"). The standard
    * fit-raw-then-score composition (q121/q122/q128, dsirSelect) evaluated
    * `featureBuckets` — an md5+conv per unigram AND bigram — over the SAME
    * raw corpus twice: once inside [[fit]] for the bucket counts, once
    * inside [[scoreDocs]] for the per-doc join. Here the exploded
    * (id, bucket) frame is materialized once (eager localCheckpoint, the
    * SetSimJoin precedent — blocks are corpus-feature-linear and reclaimed
    * by the ContextCleaner when the result dies) and BOTH the raw bucket
    * counts and the scoring join read it. The raw model and every output
    * column are value-identical to the two-pass composition: the counts
    * aggregate the identical exploded expression, and the scoring core is
    * the same [[scoreFeats]]. Returns (raw model, scored frame) — the raw
    * model's counts frame is the materialized ≤ `buckets`-row aggregate,
    * same contract as `fit(cache = false)`.
    *
    * SCALE NOTE (round-16, ADVICE r15): unlike [[fit]]'s ≤ buckets-row
    * checkpoint, the `feats` frame is CORPUS-LINEAR (one row per hashed
    * unigram+bigram occurrence) and non-reliably checkpointed — the price
    * of running the md5 feature hash once instead of twice. The returned
    * model carries it in `aux`: callers that consume the scored frame
    * (pipelines, tests) should `model.unpersist()` AFTER the final action
    * to release the blocks deterministically; query fns that return the
    * scored frame unconsumed rely on the ContextCleaner (the NgramLm
    * cache=false precedent), which reclaims the blocks when the frame
    * dies. On a multi-tenant cluster where an executor loss mid-read
    * must be recoverable, prefer the two-pass fit + scoreDocs form. */
  def fitRawAndScore(docs: DataFrame, idCol: String, toks: Column,
      target: Model, alpha: Double = 1.0): (Model, DataFrame) = {
    val feats = docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        explode(featureBuckets(col("__toks"), target.buckets)).as("bucket"))
      .localCheckpoint()
    val counts = feats.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val raw = Model(counts,
      counts.agg(coalesce(sum(col("c")), lit(0L))).head.getLong(0),
      target.buckets, aux = Seq(feats))
    (raw, scoreFeats(docs, idCol, feats, target, raw, alpha))
  }

  /** Scoring core over a pre-exploded (idCol, bucket) feature frame —
    * shared by [[scoreDocs]] (derives the frame lazily) and
    * [[fitRawAndScore]] (derives it once, materialized). */
  private def scoreFeats(docs: DataFrame, idCol: String, feats: DataFrame,
      target: Model, raw: Model, alpha: Double): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    require(target.buckets == raw.buckets,
      s"bucket spaces differ: ${target.buckets} vs ${raw.buckets}")
    val t = broadcast(target.counts
      .select(col("bucket"), col("c").as("ct")))
    val r = broadcast(raw.counts
      .select(col("bucket"), col("c").as("cr")))
    // per-feature log ratio; denominators are per-model constants, kept
    // inside the per-feature term so the oracle replays one association
    val logp =
      log((coalesce(col("ct"), lit(0L)) + lit(alpha)) /
        lit(target.total + alpha * target.buckets)) -
      log((coalesce(col("cr"), lit(0L)) + lit(alpha)) /
        lit(raw.total + alpha * raw.buckets))
    val scored = feats
      .join(t, Seq("bucket"), "left")
      .join(r, Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        count(when(col("ct").isNull, 1)).as("n_oov_t"),
        sum(coalesce(col("ct"), lit(0L))).as("sum_ct"),
        sum(coalesce(col("cr"), lit(0L))).as("sum_cr"),
        (sum(logp.cast(DecimalType(38, 18))).cast("double"))
          .as("logw"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("n_oov_t"), lit(0L)).as("n_oov_t"),
        coalesce(col("sum_ct"), lit(0L)).as("sum_ct"),
        coalesce(col("sum_cr"), lit(0L)).as("sum_cr"),
        col("logw"))
  }

  /** Deterministic Gumbel-top-k resampling over scored docs: keep the k
    * docs with the largest logw + G_i, where G_i = −ln(−ln(u_i)) and u_i is
    * the md5-derived uniform (h+0.5)/2⁴⁸ ∈ (0,1) of `seed|id` — the
    * without-replacement sample ∝ softmax(logw) (Gumbel-max trick), fully
    * reproducible across runs, partitionings, and engines (same md5-rank
    * determinism contract as Relational.hashSample). Docs with null logw
    * (no tokens) sort last and are never selected while scored docs
    * remain. Global top-k = TakeOrdered (per-partition heaps + driver
    * merge of k rows), never a full sort. */
  def gumbelTopK(scored: DataFrame, idCol: String, k: Int,
      seed: String = "dsir"): DataFrame = {
    val h = conv(substring(
      md5(concat(lit(seed + "|"), col(idCol).cast("string"))), 1, 12),
      16, 10).cast("long").cast("double")
    val u = (h + lit(0.5)) / lit(281474976710656.0) // 2^48
    val gumbel = -log(-log(u))
    scored.withColumn("__g", col("logw") + gumbel)
      .orderBy(col("__g").desc_nulls_last, col(idCol))
      .limit(k)
      .drop("__g")
  }
}
