package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.bronze.CsvEnvelopeLoader
import graft.models.StarDag
import graft.operators.Relational
import QueryHelpers._

/** End-to-end pipeline coverage: CSV source → envelope bronze → staging
  * (q18, SURVEY §2.1 S1/S2/S4) and the full 8-model DAG → wide model-feed
  * pull (q25, §3.1) — each hash-checked against a DuckDB oracle over the
  * raw tables (the envelope/CSV legs are identities, so the oracle is the
  * relational semantics itself).
  */
object DagQueries {

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val defs: Map[String, QueryFn] = Map(
    // CSV (header, quoted) → explicit-schema read → envelope encode →
    // partitioned parquet bronze → latest-batch scan → typed decode.
    "q18_csv_envelope_bronze" -> { (s, d) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_bronze").toString
      val nation = table(s, d, "nation")
      CsvEnvelopeLoader.writeCsv(nation, s"$tmp/csv/nation")
      val fromCsv = CsvEnvelopeLoader.readCsv(s, s"$tmp/csv/nation", nationSchema)
      CsvEnvelopeLoader.loadBatch(fromCsv, "nation", 1700000000L, "batch-1", s"$tmp/bronze")
      val bronze = CsvEnvelopeLoader.readBronze(s, s"$tmp/bronze", "nation")
      StarDag.staging(bronze, nationSchema).orderBy(col("n_nationkey"))
    },

    // The 8-model DAG end to end (staging ×4 → articles_metadata →
    // dedup_transactions → joined → filtered → wide pull).
    "q25_e2e_dag" -> { (s, d) =>
      StarDag.run(s, d)
    })

  /** The four DAG sources and their declared schemas, in ingest order. */
  private val rawSpecs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, StructType)] =
    Seq(
      ("transactions", StarDag.transactionsRaw _, StarDag.txSchema),
      ("articles", StarDag.articlesRaw _, StarDag.articleSchema),
      ("customers", StarDag.customersRaw _, StarDag.customerSchema),
      ("images", StarDag.imagesRaw _, StarDag.imageSchema))

  /** Deterministic per-sfDir fixture root for the q25 bench split — keyed
    * on the sanitized FULL sfDir (QueryHelpers.fixtureKey), not a 32-bit
    * hashCode, so two data dirs can never collide onto one committed
    * fixture. Still per-path shared state: bench/verify runs against the
    * SAME sfDir must stay exclusive (the bench docs' standing rule). */
  private def benchRoot(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_bench_q25_${QueryHelpers.fixtureKey(d)}"

  private def committed(s: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Untimed bench fixture (idempotent, keyed on _SUCCESS markers like
    * Dag.committed): the four raw tables staged as CSV — the shape the
    * reference ingests — and ONE committed bronze warehouse for the
    * DAG-over-bronze form to read. */
  def benchSetup(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    val root = benchRoot(d)
    rawSpecs.foreach { case (name, raw, _) =>
      if (!committed(s, s"$root/csv/$name"))
        CsvEnvelopeLoader.writeCsv(raw(s, d), s"$root/csv/$name")
    }
    rawSpecs.foreach { case (name, _, schema) =>
      // loadBatch APPENDS: re-loading the same etl batch would double the
      // partition's rows, so the warehouse is written exactly once
      if (!committed(s, s"$root/bronze/$name"))
        CsvEnvelopeLoader.loadBatch(
          CsvEnvelopeLoader.readCsv(s, s"$root/csv/$name", schema),
          name, 1700000000L, "batch-1", s"$root/bronze")
    }
  }

  /** Bench forms of the q25 pipeline, split at the materialization boundary
    * a warehouse actually has (VERDICT r5 task 1): the in-memory e2e form
    * re-encoded envelopes every rep, so its wall time breathed 1.9× with
    * parse cost that a real deployment pays once per batch, not per query.
    * Correctness of the composed DAG stays oracle-checked as q25_e2e_dag in
    * Verify; these two carry its bench duty (SparkEntry.benchSkip).
    */
  val benchDefs: Map[String, QueryFn] = Map(
    // Ingest leg, measured per rep against a FRESH warehouse: CSV parse
    // (explicit schema) → envelope encode → parquet bronze partitioned by
    // etl_id. This is the once-per-batch cost.
    "q25a_csv_to_bronze" -> { (s, d) =>
      val root = benchRoot(d)
      val fresh = java.nio.file.Files.createTempDirectory("graft_q25a").toString
      rawSpecs.foreach { case (name, _, schema) =>
        CsvEnvelopeLoader.loadBatch(
          CsvEnvelopeLoader.readCsv(s, s"$root/csv/$name", schema),
          name, 1700000000L, "batch-1", fresh)
      }
      import s.implicits._
      rawSpecs.map(_._1).toDF("model")
    },
    // Query leg: the 8-model DAG over the committed bronze warehouse —
    // staging prunes to the latest etl_id partition, then the same
    // runFromStaged composition q25 verifies.
    "q25b_dag_over_bronze" -> { (s, d) =>
      val root = benchRoot(d)
      def stg(name: String, schema: StructType) =
        StarDag.staging(CsvEnvelopeLoader.readBronze(s, s"$root/bronze", name), schema)
      StarDag.runFromStaged(
        stg("transactions", StarDag.txSchema), stg("articles", StarDag.articleSchema),
        stg("customers", StarDag.customerSchema), stg("images", StarDag.imageSchema))
    })

  val oracles: Map[String, String] = Map(
    "q18_csv_envelope_bronze" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q25_e2e_dag" ->
      """WITH tx AS (SELECT o_custkey customer_id, l_partkey article_id,
             l_extendedprice price, l_linenumber sales_channel_id,
             epoch_us(o_orderdate) t_dat_us
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         art AS (SELECT p_partkey article_id, p_brand brand, p_type ptype, p_size psize FROM part),
         cust AS (SELECT c_custkey customer_id, c_mktsegment mktsegment, c_acctbal acctbal FROM customer),
         img AS (SELECT p_partkey article_id,
             'https://img.example.com/' || CAST(p_partkey AS VARCHAR) || '.jpg' s3_url
           FROM part WHERE p_partkey % 2 = 0),
         meta AS (SELECT i.s3_url, a.* FROM art a LEFT JOIN img i USING (article_id)),
         ded0 AS (SELECT DISTINCT article_id, customer_id, price, sales_channel_id, t_dat_us FROM tx),
         ded AS (SELECT *,
             LAST_VALUE(price) OVER w last_price,
             LAST_VALUE(sales_channel_id) OVER w last_sales_channel_id,
             LAST_VALUE(t_dat_us) OVER w last_t_dat_us
           FROM ded0
           WINDOW w AS (PARTITION BY article_id, customer_id
                        ORDER BY t_dat_us, price, sales_channel_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
         j AS (SELECT ded.*, meta.s3_url, meta.brand, meta.ptype, meta.psize,
                      cust.mktsegment, cust.acctbal
               FROM ded JOIN meta USING (article_id) JOIN cust USING (customer_id)),
         freq AS (SELECT customer_id FROM j WHERE t_dat_us < 946684800000000
                  GROUP BY 1 HAVING COUNT(*) >= 5)
         SELECT customer_id, article_id, t_dat_us, price, sales_channel_id,
                last_price, last_sales_channel_id, last_t_dat_us,
                brand, ptype, psize, s3_url, mktsegment, acctbal
         FROM j WHERE customer_id IN (SELECT customer_id FROM freq)
         ORDER BY t_dat_us, customer_id, article_id, price, sales_channel_id""")
}
