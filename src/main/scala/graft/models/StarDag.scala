package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.operators.Relational

/** The reference's 8-model dbt DAG (the sql models under
  * src/dbt/models/metaflow/), re-expressed as composable DataFrame
  * transforms over the star-schema
  * analogs: transactions = orders ⨝ lineitem, articles = part,
  * customers = customer, images = synthesized URLs for even article ids
  * (so the left join genuinely keeps null-URL articles, like
  * articles_metadata.sql:4-8).
  *
  * Unlike dbt, models compose lazily by default — Catalyst sees the whole
  * DAG and prunes/pushes across model boundaries; materialize any
  * intermediate with .write.parquet when rerunnability matters (SURVEY §4
  * "materialization boundaries").
  */
object StarDag {

  val txSchema: StructType = StructType(Seq(
    StructField("customer_id", LongType), StructField("article_id", LongType),
    StructField("price", DoubleType), StructField("sales_channel_id", IntegerType),
    StructField("t_dat_us", LongType)))

  val articleSchema: StructType = StructType(Seq(
    StructField("article_id", LongType), StructField("brand", StringType),
    StructField("ptype", StringType), StructField("psize", IntegerType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("customer_id", LongType), StructField("mktsegment", StringType),
    StructField("acctbal", DoubleType)))

  val imageSchema: StructType = StructType(Seq(
    StructField("article_id", LongType), StructField("s3_url", StringType)))

  /** Raw sources (the CSV-analog inputs before envelope encoding). */
  def transactionsRaw(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    orders.join(li, orders("o_orderkey") === li("l_orderkey"))
      .select(col("o_custkey").as("customer_id"), col("l_partkey").as("article_id"),
        col("l_extendedprice").as("price"), col("l_linenumber").as("sales_channel_id"),
        // o_orderdate is TIMESTAMP_NTZ in the fixture parquet; session TZ is
        // pinned UTC so the cast is value-preserving (= DuckDB epoch_us).
        unix_micros(col("o_orderdate").cast("timestamp")).as("t_dat_us"))
  }

  def articlesRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part").select(col("p_partkey").as("article_id"),
      col("p_brand").as("brand"), col("p_type").as("ptype"), col("p_size").as("psize"))

  def customersRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer").select(col("c_custkey").as("customer_id"),
      col("c_mktsegment").as("mktsegment"), col("c_acctbal").as("acctbal"))

  /** Image URLs exist only for even article ids (P3 concat; forces real
    * left-join null handling downstream). */
  def imagesRaw(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part").filter(col("p_partkey") % 2 === 0)
      .select(col("p_partkey").as("article_id"),
        concat(lit("https://img.example.com/"), col("p_partkey").cast("string"),
          lit(".jpg")).as("s3_url"))

  /** Staging: latest ETL batch (J1/O1 — partition-pruned when bronze is
    * partitioned by etl_id) + envelope decode with explicit casts (P1). */
  def staging(envelopes: DataFrame, schema: StructType): DataFrame =
    Relational.fromEnvelope(
      Relational.latestBatch(envelopes, "etl_id", "etl_timestamp"), schema)
  // (A/B-measured at sf0.1: fromEnvelopeVariant decodes q25's bronze in the
  // same wall time as from_json — flat tiny payloads are parse-bound either
  // way — and produces identical output, so the portable form stays.)

  /** articles_metadata.sql: left join images, qualified-star projection
    * (P4: `i_s.S3_URL, cd.*`). */
  def articlesMetadata(articles: DataFrame, images: DataFrame): DataFrame =
    articles.as("a").join(images.as("i"), Seq("article_id"), "left")
      .select(col("i.s3_url") +: articles.columns.map(c => col(s"a.$c")): _*)

  /** dedup_transactions.sql: 5-tuple GROUP-BY dedup + whole-partition
    * LAST_VALUE (A2 + W1-W3, duplicate-preserving — see Relational doc). */
  def dedupTransactions(tx: DataFrame): DataFrame =
    Relational.dedupWithLastValue(tx, Seq("article_id", "customer_id"),
      "t_dat_us", Seq("price", "sales_channel_id"))

  /** joined_dataframe.sql: 3-way join, dims broadcast (J3). */
  def joinedDataframe(dedup: DataFrame, meta: DataFrame, customers: DataFrame): DataFrame =
    dedup.join(broadcast(meta), Seq("article_id"))
      .join(broadcast(customers), Seq("customer_id"))

  /** filtered_dataframe.sql: training-window count ≥ min per customer (P8 +
    * A1) then semi join of the full table (J4).
    *
    * `freqSource` defaults to `joined` (the dbt model's own input); pass the
    * pre-join deduped transactions instead when FK integrity holds (every
    * article/customer key resolves) — the inner dim joins are then
    * count-preserving, so the frequency branch skips recomputing them and
    * the per-customer counts are identical. Check the precondition with
    * `fkViolations` (run() does when asked).
    */
  def filteredDataframe(joined: DataFrame, trainEndUs: Long, minInteractions: Long,
      freqSource: Option[DataFrame] = None): DataFrame = {
    val src = freqSource.getOrElse(joined)
    val freq = src.filter(col("t_dat_us") < trainEndUs)
      .groupBy(col("customer_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minInteractions).select(col("customer_id"))
    joined.join(freq, Seq("customer_id"), "left_semi")
  }

  /** Transactions whose article/customer keys do NOT resolve against the
    * dims — the FK-integrity precondition of the `freqSource = dedup` fast
    * path, as data (empty ⇔ the inner joins are count-preserving). The
    * dims are broadcast, so each anti join is one corpus pass. */
  def fkViolations(dedup: DataFrame, meta: DataFrame, customers: DataFrame): DataFrame = {
    val badArticle = dedup.join(broadcast(meta.select(col("article_id"))),
      Seq("article_id"), "left_anti")
    val badCustomer = dedup.join(broadcast(customers.select(col("customer_id"))),
      Seq("customer_id"), "left_anti")
    badArticle.select(col("customer_id"), col("article_id"), lit("article").as("missing_fk"))
      .unionByName(badCustomer.select(col("customer_id"), col("article_id"),
        lit("customer").as("missing_fk")))
  }

  /** The model-feed pull (my_merlin_flow.py:154-185): wide projection built
    * as a column-set union (P5/U2), lowercased names (P6), time order (O2). */
  def finalPull(filtered: DataFrame): DataFrame = {
    val txCols = Seq("customer_id", "article_id", "t_dat_us", "price",
      "sales_channel_id", "last_price", "last_sales_channel_id", "last_t_dat_us")
    val artCols = Seq("brand", "ptype", "psize", "s3_url")
    val custCols = Seq("mktsegment", "acctbal")
    val wide = columnUnion(Seq(txCols, artCols, custCols))
    lowercaseColumns(filtered.select(wide.map(col): _*))
      .orderBy(col("t_dat_us"), col("customer_id"), col("article_id"),
        col("price"), col("sales_channel_id"))
  }

  /** U2: ordered, deduplicated union of column groups (NVT op-graph `+`). */
  def columnUnion(groups: Seq[Seq[String]]): Seq[String] =
    groups.flatten.distinct

  /** P6: lowercase all column names (my_merlin_flow.py:190-192). */
  def lowercaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  /** Models 5-8 (metadata join → dedup → 3-way join → filter → pull) over
    * ALREADY-STAGED inputs — shared by the in-memory `run` and the
    * bronze-warehouse bench form (q25b), so the two measure the same plan
    * downstream of staging. */
  def runFromStaged(tx: DataFrame, art: DataFrame, cust: DataFrame,
      img: DataFrame, trainEndUs: Long = 946684800000000L,
      minInteractions: Long = 5L, verifyFk: Boolean = false): DataFrame = {
    val meta = articlesMetadata(art, img)
    // Materialized ONCE (round 15, guide §2.3): dedup_transactions is read
    // by the joined branch AND the frequency branch (freqSource = dedup),
    // and the plan carried the whole transactions lineage twice — envelope
    // JSON decode of the biggest table, the dedup exchange, and the
    // LAST_VALUE window (no exchange reuse fires across the branches).
    // Blocks are deduped-transaction-linear, ContextCleaner-reclaimed;
    // this is exactly dbt's `materialized: table` boundary on the model
    // every downstream model reads (the registry form declares the same
    // boundary via `tables`). Values unchanged — deterministic lineage.
    // CONTRACT (round-16, ADVICE r15): the checkpoint is EAGER — calling
    // this (or buildStarDag) runs the envelope-decode + dedup + window job
    // of the biggest table at DAG-construction time, even when the caller
    // never executes the consuming branches, and the blocks are
    // non-reliable (an executor loss cannot recompute them; rebuild the
    // DAG instead). Every current caller (q25/q25b, the registry form,
    // the specs) executes the result immediately, so construction-time
    // laziness buys nothing here; a caller that needs a lazy DAG handle
    // should take the staged frames and compose dedupTransactions itself.
    val dedup = dedupTransactions(tx).localCheckpoint()
    if (verifyFk) {
      val bad = fkViolations(dedup, meta, cust).limit(5).collect()
      require(bad.isEmpty,
        s"freqSource=dedup requires FK integrity; violations: ${bad.mkString(", ")}")
    }
    val joined = joinedDataframe(dedup, meta, cust)
    finalPull(filteredDataframe(joined, trainEndUs, minInteractions, freqSource = Some(dedup)))
  }

  /** The whole DAG from in-memory envelopes (etl batch `etlId`).
    *
    * The frequency branch counts from the pre-join deduped transactions (one
    * fewer recomputation of the dim joins) — valid only under FK integrity;
    * `verifyFk = true` asserts it with one broadcast anti-join pass before
    * composing (the dbt-test analog). The fixture DAG satisfies it by
    * construction (StarDagSpec pins this), so q25 leaves it off.
    */
  def run(spark: SparkSession, dir: String, trainEndUs: Long = 946684800000000L,
      minInteractions: Long = 5L, verifyFk: Boolean = false): DataFrame = {
    def env(df: DataFrame, tpe: String) =
      Relational.toEnvelope(df, tpe, 1700000000L, "batch-1")
    val tx = staging(env(transactionsRaw(spark, dir), "transactions"), txSchema)
    val art = staging(env(articlesRaw(spark, dir), "articles"), articleSchema)
    val cust = staging(env(customersRaw(spark, dir), "customers"), customerSchema)
    val img = staging(env(imagesRaw(spark, dir), "images"), imageSchema)
    runFromStaged(tx, art, cust, img, trainEndUs, minInteractions, verifyFk)
  }

  /** The same 8-model DAG through the materialization registry (Dag):
    * every dbt model is declared with its deps; `tables` marks which are
    * materialized to `warehouseDir` and reused on later runs (dbt's
    * `materialized: table`). `resolve("final_pull")` with tables = ∅ is
    * plan-identical to `run` above.
    */
  def dag(dir: String, warehouseDir: String, tables: Set[String] = Set.empty,
      trainEndUs: Long = 946684800000000L, minInteractions: Long = 5L): Dag = {
    def env(df: DataFrame, tpe: String) =
      Relational.toEnvelope(df, tpe, 1700000000L, "batch-1")
    def t(name: String) = tables.contains(name)
    new Dag(Seq(
      DagModel("stg_transactions", Nil, t("stg_transactions"))((s, _) =>
        staging(env(transactionsRaw(s, dir), "transactions"), txSchema)),
      DagModel("stg_articles", Nil, t("stg_articles"))((s, _) =>
        staging(env(articlesRaw(s, dir), "articles"), articleSchema)),
      DagModel("stg_customers", Nil, t("stg_customers"))((s, _) =>
        staging(env(customersRaw(s, dir), "customers"), customerSchema)),
      DagModel("stg_images", Nil, t("stg_images"))((s, _) =>
        staging(env(imagesRaw(s, dir), "images"), imageSchema)),
      DagModel("articles_metadata", Seq("stg_articles", "stg_images"),
        t("articles_metadata"))((_, d) =>
        articlesMetadata(d("stg_articles"), d("stg_images"))),
      DagModel("dedup_transactions", Seq("stg_transactions"),
        t("dedup_transactions"))((_, d) =>
        dedupTransactions(d("stg_transactions"))),
      DagModel("joined_dataframe",
        Seq("dedup_transactions", "articles_metadata", "stg_customers"),
        t("joined_dataframe"))((_, d) =>
        joinedDataframe(d("dedup_transactions"), d("articles_metadata"), d("stg_customers"))),
      DagModel("filtered_dataframe", Seq("joined_dataframe", "dedup_transactions"),
        t("filtered_dataframe"))((_, d) =>
        filteredDataframe(d("joined_dataframe"), trainEndUs, minInteractions,
          freqSource = Some(d("dedup_transactions")))),
      DagModel("final_pull", Seq("filtered_dataframe"), t("final_pull"))((_, d) =>
        finalPull(d("filtered_dataframe")))),
      warehouseDir)
  }
}
