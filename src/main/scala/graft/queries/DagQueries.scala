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
