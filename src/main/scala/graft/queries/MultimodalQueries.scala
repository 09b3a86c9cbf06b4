package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.operators.Relational
import QueryHelpers._

/** Multimodal-column (S12/F14) and deterministic-sampling (P11) coverage.
  * The q44 feature extraction is the SQL-expressible stub (hex chunks of
  * md5) so the whole binary-column pipeline shape is oracle-checked; the
  * mapPartitions batch-inference seam with a model function is exercised in
  * MultimodalSpec.
  */
object MultimodalQueries {

  val defs: Map[String, QueryFn] = Map(
    // Binary asset column + typed metadata + deterministic feature columns.
    "q44_multimodal_features" -> { (s, d) =>
      val docs = table(s, d, "documents")
      val withBin = Multimodal.asBinaryAsset(docs, "text", "text/plain")
      withBin.select(
          (col("doc_id") +: col("asset_meta.byte_len").as("byte_len") +:
            (0 until 4).map(j => Multimodal.hashFeature(col("asset"), j).as(s"emb_$j"))): _*)
        .orderBy(col("doc_id"))
    },

    // Deterministic hash sampling: reproducible 10% of orders.
    "q19_hash_sample" -> { (s, d) =>
      Relational.hashSample(table(s, d, "orders"), col("o_orderkey"), 0.1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // Hashing-trick bucketing (Categorify's no-dictionary sibling for
    // unbounded cardinalities): brand into 16 buckets, type into 64 —
    // stateless, reproducible across engines (same md5 coin as q19/q56).
    "q68_hash_bucket" -> { (s, d) =>
      graft.features.HashBucket.bucketize(
          table(s, d, "part").select(col("p_partkey"), col("p_brand"), col("p_type")),
          Seq("p_brand" -> 16, "p_type" -> 64))
        .orderBy(col("p_partkey"))
    },

    // Stratified deterministic sampling, rates-as-dimension form: keep all
    // purchases, 25% of clicks, 10% of views, 5% of everything else — the
    // training-set rebalance. The rates side broadcasts (map-side filter,
    // no fact shuffle); selection is the same md5 coin as q19, so it is
    // reproducible and composable across engines.
    "q56_stratified_sample" -> { (s, d) =>
      import s.implicits._
      val rates = Seq(("purchase", 1.0), ("click", 0.25), ("view", 0.1))
        .toDF("event_type", "rate")
      Relational.stratifiedSampleBy(table(s, d, "events"), "event_type",
          col("event_id"), rates, defaultRate = 0.05)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    })

  val oracles: Map[String, String] = Map(
    "q44_multimodal_features" -> {
      // DuckDB md5 takes VARCHAR; it hashes the same UTF-8 bytes the Spark
      // side hashes through the binary column.
      val h = "md5(text)"
      s"""SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS byte_len,
          ${(0 until 4).map(j => s"CAST(${hex4Sql(h, j * 4)} AS DOUBLE) / 65535.0 AS emb_$j").mkString(", ")}
          FROM documents ORDER BY doc_id"""
    },
    "q19_hash_sample" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          WHERE ${hex4Sql("md5(CAST(o_orderkey AS VARCHAR))", 0)} < ${math.floor(0.1 * 65536).toInt}
          ORDER BY o_orderkey""",
    "q68_hash_bucket" -> {
      def hex8(expr: String) =
        s"(${hex4Sql(s"md5($expr)", 0)}::BIGINT * 65536 + ${hex4Sql(s"md5($expr)", 4)}::BIGINT)"
      s"""SELECT p_partkey, p_brand, p_type,
          CAST(${hex8("p_brand")} % 16 AS INT) AS p_brand_bucket,
          CAST(${hex8("p_type")} % 64 AS INT) AS p_type_bucket
          FROM part ORDER BY p_partkey"""
    },
    "q56_stratified_sample" ->
      s"""WITH rates(event_type, rate) AS (VALUES
            ('purchase', 1.0), ('click', 0.25), ('view', 0.1))
          SELECT e.event_id, e.event_type, e.value
          FROM events e LEFT JOIN rates r USING (event_type)
          WHERE ${hex4Sql("md5(CAST(e.event_id AS VARCHAR))", 0)}
            < CAST(FLOOR(CAST(COALESCE(r.rate, 0.05) AS DOUBLE) * 65536) AS INT)
          ORDER BY e.event_id""")
}
