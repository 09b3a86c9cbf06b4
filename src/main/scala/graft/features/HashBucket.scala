package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashing-trick bucketing — Categorify's sibling for categoricals too
  * unbounded to dictionary-encode (NVTabular's HashBucket op): map a value
  * to `md5(value) mod numBuckets`. No fit, no dictionary, no shuffle, no
  * state — the trade is collisions (birthday-bounded by numBuckets) for a
  * fixed embedding-table size that holds at any cardinality, which is why
  * it is the 100 TB default for ids in the hundreds of millions.
  *
  * The md5 coin makes buckets reproducible across runs, engines and
  * partitionings (oracle q68) — NOT across numBuckets (no nesting property
  * like hashSample's threshold; changing D remaps everything, retrain).
  * Nulls pass through as null buckets — compose with FillMissing upstream
  * if nulls should land in a real bucket.
  */
object HashBucket {

  /** Bucket id in [0, numBuckets) from the first 8 md5 hex digits. */
  def bucket(c: Column, numBuckets: Int): Column = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    (conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")
      % numBuckets).cast("int")
  }

  /** Add `<col>_bucket` columns for each (column, numBuckets) spec. */
  def bucketize(df: DataFrame, specs: Seq[(String, Int)]): DataFrame =
    specs.foldLeft(df) { case (d, (c, n)) =>
      d.withColumn(s"${c}_bucket", bucket(col(c), n))
    }
}
