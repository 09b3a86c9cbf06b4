package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the interchange format LLM corpora actually
  * ship in (one JSON object per line; Dolma, RedPajama, FineWeb, The Pile
  * all distribute this way). Spark's json reader/writer IS line-delimited
  * by default, so this is a thin, deliberately boring wrapper whose value
  * is the contract it enforces: explicit schema on read (never inference —
  * same rule as CsvEnvelopeLoader; a 100 TB inference pass is a full extra
  * scan and a schema lottery), permissive-with-corrupt-record capture so a
  * malformed crawl line quarantines instead of killing the job.
  *
  * Scale shape: JSONL splits by newline, so reads parallelize per-file
  * block like CSV; a `.gz` corpus is file-per-task (upstream should shard
  * into many files — the standard corpus layout already does).
  */
object Jsonl {

  /** Read line-delimited JSON with an explicit schema. Malformed lines
    * land in `_corrupt_record` (PERMISSIVE) for downstream quarantine
    * (pair with Quality.quarantine) rather than failing the scan. */
  def read(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** Write line-delimited JSON. `shards` controls output file count
    * (0 = keep the upstream partitioning). */
  def write(df: DataFrame, path: String, shards: Int = 0): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode("overwrite").json(path)
  }
}
