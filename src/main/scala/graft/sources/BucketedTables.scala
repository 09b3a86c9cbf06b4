package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table materialization for co-located fact-to-fact joins
  * (SURVEY §4 / the 100 TB join strategy): write both join sides
  * `bucketBy(n, key)` once, and every subsequent equi-join on that key
  * reads co-located buckets — NO exchange on either side, at any number of
  * re-runs. This is the persisted counterpart of `repartition(key)`:
  * repartition pays its shuffle per query, bucketing pays it once at write
  * time (exactly how a 100 TB fact table should be laid out for its
  * dominant join key).
  *
  * Spark-first notes: bucket pruning + bucketed scan-join require
  * `saveAsTable` (bucket metadata lives in the catalog, not the parquet
  * files) and matching bucket counts on both sides (or a multiple, with
  * spark.sql.bucketing.coalesceBucketsInJoin.enabled).
  * BucketedJoinSpec asserts the no-exchange plan property.
  */
object BucketedTables {

  /** Materialize `df` as a bucketed catalog table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCol: String, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata flows from the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
