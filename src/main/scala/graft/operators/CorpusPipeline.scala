package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.TextDedup
import graft.functions.{GopherQuality, Pii, TextOps}
import graft.models.{Dag, DagModel}

/** Declared-stage corpus pipeline — the LLM-corpus counterpart of the
  * relational DAG registry (`models/Dag`, the dbt-style per-model
  * materialization walk). A user composes the standard pre-training data
  * path — quality gate → PII redaction → dedup tier → token count →
  * seeded shuffle/shard → example pack — as NAMED stages instead of
  * re-deriving the q99 wiring, and gets the registry's semantics for
  * free: any stage can be `materialized` to parquet and reused across
  * runs, refresh cascades downstream, and the default (nothing
  * materialized) composes lazily so Catalyst sees the whole chain and
  * prunes/pushes across stage boundaries.
  *
  * Scale notes: the registry adds NOTHING to the dataflow — each stage is
  * exactly the operator it names (same plan as calling it directly, pinned
  * by CorpusPipelineSpec's q99 parity test). Materialization boundaries
  * trade cross-stage pushdown for rerunnability, the same trade as
  * `StarDag.dag`; a 100 TB run materializes the expensive tiers (dedup)
  * and leaves the projections lazy.
  */
object CorpusPipeline {

  /** One named stage: a DataFrame transform over the previous stage's
    * output. `Stage(name)(df => ...)` for session-free transforms;
    * `Stage.withSession` when the transform needs the SparkSession. */
  final case class Stage(name: String)(val f: (SparkSession, DataFrame) => DataFrame)

  def stage(name: String)(f: DataFrame => DataFrame): Stage =
    Stage(name)((_, df) => f(df))

  // ---- the standard corpus stages, thin named wrappers over the
  // ---- already-oracle-checked operators

  /** HTML → text extraction (q108 operator) — the crawl-corpus entry
    * stage; replaces `htmlCol` with clean text and adds `title`. */
  def htmlExtract(htmlCol: String): Stage =
    stage("html_extract")(graft.functions.HtmlExtract.extract(_, htmlCol))

  /** HTML → text extraction with anchor-dense boilerplate lines dropped
    * (q110/q111 operator — the jusText-lite link-density leg): structural
    * lines whose visible characters are more than `maxAnchorPermille`‰
    * inside <a> elements are removed before tag stripping. */
  def htmlExtractDropBoilerplate(htmlCol: String,
      maxAnchorPermille: Int = 500): Stage =
    stage("html_extract")(df => df
      .withColumn("title", graft.functions.HtmlExtract.title(col(htmlCol)))
      .withColumn(htmlCol, graft.functions.HtmlExtract
        .textDropBoilerplate(col(htmlCol), maxAnchorPermille)))

  /** URL canonicalization + keep-first URL dedup (q112/q113 operator) —
    * the crawl-entry dedup C4/RefinedWeb run BEFORE any content work;
    * slots ahead of `html_extract` so duplicate fetches of one page never
    * reach extraction. Adds `url_canon`; keeps the least-`tieBreak` row
    * per canonical URL. */
  def urlDedup(urlCol: String, tieBreak: String): Stage =
    stage("url_dedup")(df =>
      graft.functions.UrlCanon.dedupByUrl(df, urlCol, Seq(col(tieBreak))))

  /** Per-domain document cap (q116 operator) — the RefinedWeb-style
    * crawl-entry down-sample: at most `maxPerDomain` docs per URL host,
    * selected by the deterministic md5 rank; slots after `url_dedup`,
    * before extraction, so no single domain floods the corpus. */
  def domainCap(urlCol: String, idCol: String, maxPerDomain: Long): Stage =
    stage("domain_cap")(df => DataMix.capPerGroupConstant(
      df, graft.functions.UrlCanon.host(col(urlCol)), col(idCol), maxPerDomain))

  /** Unicode-script census (q126 operator) as an APPENDING row-local
    * stage: per-script char counts + digits + argmax `main_script` added
    * to every row — the zero-model language triage a multilingual crawl
    * runs before routing to per-language gates. Pure codegen projection,
    * so it is batch≡stream like the other row-local stages. */
  def scriptCensus(textCol: String): Stage =
    stage("script_census")(
      graft.functions.LangId.withScriptProfile(_, textCol))

  /** Gopher rule battery as a pushdown-friendly filter (q95 operator). */
  def qualityGate(textCol: String, minWords: Int = 50,
      maxWords: Int = 100000, minStopwords: Int = 2): Stage =
    stage("quality_gate")(_.filter(
      GopherQuality.keepExpr(col(textCol), minWords, maxWords, minStopwords)))

  /** In-place PII redaction of the text column (q92 operator). */
  def piiRedact(textCol: String): Stage =
    stage("pii_redact")(_.withColumn(textCol, Pii.redact(col(textCol))))

  /** Compression-ratio gate (the q139 signal as a row-local stage): keep
    * docs whose DEFLATE ratio lies in [minRatio, maxRatio] — below the
    * floor is template spam / repeated boilerplate, above the ceiling is
    * gibberish or binary soup (MassiveText's compressibility band). Pure
    * per-row filter over the codegen graft_deflate_len expression —
    * pushdown-friendly, zero shuffle; requires GraftFunctions.register
    * (handled by the session bootstrap paths that run registry stages).
    * Empty docs divide a 2-byte deflate floor by octet_length 0 → NULL
    * ratio → dropped (an empty doc passes no quality band). */
  def deflateGate(textCol: String, minRatio: Double = 0.05,
      maxRatio: Double = 0.98): Stage =
    stage("deflate_gate")(df => {
      graft.sql.GraftFunctions.register(df.sparkSession)
      df.filter((graft.sql.GraftFunctions.deflateLen(col(textCol))
        .cast("double") / octet_length(col(textCol)))
        .between(minRatio, maxRatio))
    })

  /** Learned-classifier gate (q104 operator) as a PURE FILTER: the margin
    * is evaluated over the codegen Gopher metric expressions directly, so
    * the stage stays a pushdown-friendly per-row Filter like qualityGate.
    * The model must therefore use only the eight Gopher metrics —
    * aggregation-needing features (top_gram_frac, ll_mean) have no
    * single-pass expression form; score those via
    * [[graft.features.QualityClassifier.featurize]] + `score` instead. */
  def classifierGate(textCol: String,
      model: graft.features.QualityClassifier.Model): Stage = {
    val unsupported = model.featureNames.filterNot(GopherQuality.MetricNames.contains)
    require(unsupported.isEmpty,
      s"classifierGate supports Gopher-metric features only; got $unsupported")
    stage("classifier_gate")(df => df.filter(
      graft.features.QualityClassifier.marginOver(model,
        GopherQuality.metricExprMap(col(textCol))) > 0))
  }

  /** Two-pass learned-classifier gate (q114 operator) — the form that
    * supports AGGREGATION features: [[graft.features.QualityClassifier.featurize]]
    * computes per-doc feature aggregations a single-pass filter cannot
    * express (top_gram_frac needs the per-doc gram argmax; ll_mean two
    * broadcast joins + an agg), the codegen margin scores the feature
    * frame, and a left-semi join keeps the passing docs. Two passes over
    * `textCol` by construction — when the text is DERIVED (an upstream
    * extraction), materialize that upstream stage (the q109 inlining
    * lesson), or the derivation replays inside every feature
    * aggregation. For Gopher-only models prefer [[classifierGate]]: one
    * pass, pure Filter. */
  def classifierScore(idCol: String, textCol: String,
      model: graft.features.QualityClassifier.Model,
      lm: Option[graft.functions.NgramLm.Model] = None): Stage =
    stage("classifier_score") { df =>
      val feats = graft.features.QualityClassifier.featurize(df, idCol, textCol, lm)
      val kept = graft.features.QualityClassifier.score(feats, model)
        .filter(col("keep")).select(col(idCol))
      df.join(kept, Seq(idCol), "left_semi")
    }

  /** DSIR selection stage (q121/q122 operator): keep the `k` docs whose
    * hashed-n-gram distribution best matches the TARGET model (a fitted
    * artifact — parquet via Dsir.save/load, the Categorify philosophy),
    * Gumbel-top-k ∝ softmax(logw). The RAW model is fit on the incoming
    * frame itself (the DSIR contract: importance is target-vs-THIS-corpus),
    * one extra bounded-agg pass; uncached (fit-score-once, the NgramLm
    * precedent). Slots after the cheap gates so the fit pass runs on the
    * surviving slice. */
  def dsirSelect(idCol: String, textCol: String, target: Dsir.Model,
      k: Int, seed: String = "dsir"): Stage =
    stage("dsir_select") { df =>
      val toks = df.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      // one feature-hash pass for raw fit + scoring (round 15, guide §2.3
      // — the two-pass form md5-hashed every n-gram of the incoming frame
      // twice); value-identical by construction
      val (_, scored) = Dsir.fitRawAndScore(toks, idCol, col("__toks"), target)
      df.join(Dsir.gumbelTopK(scored, idCol, k, seed).select(col(idCol)),
        Seq(idCol), "left_semi")
    }

  /** Soft-dedup annotation stage (q125 operator): every row survives,
    * gaining `n_dups` (CCNet-normalized exact-dup cluster size) and
    * `weight` = 1/n_dups for loss reweighting — the keep-everything
    * alternative to the drop tiers. */
  def softDedupAnnotate(idCol: String, textCol: String): Stage =
    stage("soft_dedup") { df =>
      df.join(TextDedup.softDedupWeights(df, idCol,
          TextOps.ccnetFingerprint(col(textCol)))
        .select(col(idCol), col("n_dups"), col("weight")), Seq(idCol))
    }

  /** Exact-duplicate removal tier (q32 operator; min-id canonical). */
  def exactDedup(idCol: String, textCol: String): Stage =
    stage("exact_dedup")(TextDedup.dropExactDuplicates(_, idCol, textCol))

  /** CCNet-normalized exact-duplicate removal tier (q118 operator):
    * dedup keyed on the hashing-normalized fingerprint (lowercase, NFD
    * accent strip, digits→0, whitespace collapse — Wenzek 2020 §3.2), so
    * case/accent/digit/spacing variants of one document collapse; the
    * kept document keeps its ORIGINAL text. Same one-shuffle shape as
    * exact_dedup; distinct stage name so a pipeline can run both tiers. */
  def exactDedupNormalized(idCol: String, textCol: String): Stage =
    stage("exact_dedup_norm")(df => TextDedup.dropExactDuplicatesBy(
      df, idCol, TextOps.ccnetFingerprint(col(textCol))))

  /** MinHash-LSH near-duplicate removal tier (q38 operator). */
  def nearDedup(idCol: String, textCol: String, threshold: Double = 0.8,
      numHashes: Int = 16, rowsPerBand: Int = 2): Stage =
    stage("near_dedup")(df => TextDedup.dropNearDuplicates(df, idCol,
      TextOps.wordShingles(TextOps.tokens(col(textCol)), 8),
      numHashes, rowsPerBand, threshold))

  /** Cluster-consistent near-duplicate removal with a quality-priority
    * keep (q119 operator — the FineWeb policy): connected components
    * over the verified near-dup pair graph, then one member per cluster
    * survives — the highest-`quality` (ties to smallest id). Costs the
    * near_dedup chain plus the iterative components fixpoint; use when
    * WHICH duplicate survives matters (keep the longest/cleanest copy),
    * `nearDedup` when any survivor will do. */
  def nearDedupKeepBest(idCol: String, textCol: String, quality: Column,
      threshold: Double = 0.8, numHashes: Int = 16, rowsPerBand: Int = 2): Stage =
    stage("near_dedup_cluster")(df => TextDedup.dropNearDuplicatesKeepBest(
      df, idCol, TextOps.wordShingles(TextOps.tokens(col(textCol)), 8),
      quality, numHashes, rowsPerBand, threshold))

  /** Token counting — the weight column shuffle/pack stages consume. */
  def tokenCount(textCol: String, out: String = "n_tokens"): Stage =
    stage("token_count")(_.withColumn(out, size(TextOps.tokens(col(textCol)))))

  /** Seeded deterministic shuffle + token-budget shard packing (q97). */
  def shuffleShards(idCol: String, seed: String, budget: Long,
      weightCol: String = "n_tokens"): Stage =
    stage("shuffle_shards")(
      CorpusShuffle.shuffledShards(_, idCol, col(weightCol), seed, budget))

  /** Fixed-length example packing in seeded epoch order (q101/q103). */
  def packExamples(idCol: String, seed: String, exampleLen: Long,
      weightCol: String = "n_tokens"): Stage =
    stage("pack_examples")(df => ExamplePack.packExamples(
      df.withColumn("__k", CorpusShuffle.shuffleKey(seed, col(idCol))),
      idCol, col(weightCol), exampleLen, "__k", tieBreak = Seq(col(idCol))))

  /** Build the registry: a linear Dag `source → stages…` rooted at
    * `warehouseDir`. `materialized` names the stages persisted as parquet
    * and reused across runs (Dag's _SUCCESS-keyed reuse + cascading
    * refresh); everything else composes lazily. */
  def dag(source: SparkSession => DataFrame, stages: Seq[Stage],
      warehouseDir: String, materialized: Set[String] = Set.empty): Dag = {
    val names = stages.map(_.name)
    require(names.distinct == names, s"duplicate stage names: $names")
    val known = names.toSet + "source"
    require((materialized -- known).isEmpty,
      s"materialized names unknown: ${materialized -- known}")
    val src = DagModel("source", Nil, materialized("source"))((s, _) => source(s))
    val models = stages.zipWithIndex.map { case (st, i) =>
      val dep = if (i == 0) "source" else names(i - 1)
      DagModel(st.name, Seq(dep), materialized(st.name))((s, d) => st.f(s, d(dep)))
    }
    new Dag(src +: models, warehouseDir)
  }

  /** Resolve the final stage (the composed pipeline output). */
  def run(spark: SparkSession, pipeline: Dag, lastStage: String,
      refresh: Set[String] = Set.empty): DataFrame =
    pipeline.resolve(spark, lastStage, refresh)

  /** Per-stage row accounting — the Dolma-style corpus report (how many
    * documents each gate dropped). One shared resolution walk, then one
    * count per named stage. Lazy stages recompute their upstream chain
    * per count, so audit a MATERIALIZED pipeline when the corpus is big —
    * with the registry that is one `materialized` flag, and each count
    * becomes a parquet metadata read. */
  def audit(spark: SparkSession, pipeline: Dag,
      stageNames: Seq[String]): DataFrame = {
    import spark.implicits._
    val resolved = pipeline.runAll(spark)
    stageNames.map(n => (n, resolved(n).count())).toDF("stage", "rows")
  }
}
