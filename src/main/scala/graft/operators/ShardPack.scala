package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard packing: assign rows (documents) to output shards by a
  * cumulative weight budget (e.g. "each shard holds ~50M tokens"), in a
  * deterministic total order. Extension scope — the dataset-assembly step a
  * 100 TB pre-training pipeline runs after filtering/dedup (the reference's
  * analog is the per-split parquet hand-off, my_merlin_flow.py:241).
  *
  * The primitive is an EXACT distributed prefix sum over a total order.
  * A naive `sum(w) over (order by k)` is a single-partition window — the
  * classic driver-melting global window at scale. This implementation is
  * two-level:
  *
  *   1. range-bucket the order key into `buckets` coarse bins (bounds from
  *      one min/max aggregate — two values to the driver, scale-safe);
  *   2. per-bucket running sum — a PARTITIONED window (parallel, spillable);
  *   3. exclusive bucket offsets — a global window over `buckets` rows
  *      (tiny by construction), broadcast-joined back.
  *
  * Weights must be integral (token/char/byte counts) so the running sums are
  * exact and engine-independent; the result is bit-identical to the
  * single-window form regardless of partitioning.
  */
object ShardPack {

  /** Adds `out` = inclusive running sum of `weight` in (`orderCol`,
    * `tieBreak`*) order. The combined key must be unique (an undetermined
    * order would make "the" prefix sum ill-defined); `orderCol` itself must
    * be numeric. Tied `orderCol` values share a bucket (bucketing is by
    * VALUE), so tie-break columns only ever order rows within one
    * partitioned window — the two-level decomposition stays exact.
    * Weights are cast to long. */
  def cumsum(df: DataFrame, orderCol: String, weight: Column, out: String,
      buckets: Int = 256, tieBreak: Seq[Column] = Nil): DataFrame = {
    // loud type check — a non-numeric key would cast its min/max to null
    // and silently take the empty-input path below
    require(df.schema(orderCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"orderCol '$orderCol' must be numeric, got ${df.schema(orderCol).dataType}")
    val bounds = df.agg(min(col(orderCol)).cast("double"),
      max(col(orderCol)).cast("double")).head()
    if (bounds.isNullAt(0)) return df.withColumn(out, lit(null).cast("long"))
    val (mn, mx) = (bounds.getDouble(0), bounds.getDouble(1))
    val span = math.max(mx - mn, 1.0)
    // bucket id in [0, buckets): monotone in orderCol, so bucket order == key order
    val bucketId = least(
      floor((col(orderCol).cast("double") - lit(mn)) / lit(span) * buckets).cast("int"),
      lit(buckets - 1))
    val w = df.withColumn("__w", weight.cast("long")).withColumn("__g", bucketId)
    val inBucket = sum(col("__w"))
      .over(Window.partitionBy(col("__g")).orderBy(col(orderCol) +: tieBreak: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    // exclusive prefix of per-bucket totals: `buckets` rows, so the global
    // window here is bounded by construction (not by the data)
    val offsets = w.groupBy(col("__g")).agg(sum(col("__w")).as("__t"))
      .select(col("__g"),
        (coalesce(sum(col("__t")).over(
          Window.orderBy(col("__g"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)), lit(0L))
          - col("__t")).as("__off"))
    w.withColumn("__in", inBucket)
      .join(broadcast(offsets), Seq("__g"))
      .withColumn(out, col("__off") + col("__in"))
      .drop("__w", "__g", "__in", "__off")
  }

  /** Adds `shard_id`: the zero-based shard each row starts in, packing rows
    * in `orderCol` order until each shard's cumulative weight reaches
    * `budget` (a shard may overflow by at most one row's weight — rows are
    * never split). shard_id = exclusive-prefix-sum / budget, so it is exact,
    * deterministic, and reproducible by any engine's window cumsum. */
  def assignShards(df: DataFrame, orderCol: String, weight: Column,
      budget: Long, buckets: Int = 256, tieBreak: Seq[Column] = Nil): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    // `div` = exact integer division (long `/` would go through double and
    // lose exactness past 2^53)
    cumsum(df, orderCol, weight, "__cum", buckets, tieBreak)
      .withColumn("__excl", col("__cum") - weight.cast("long"))
      .withColumn("shard_id", expr(s"CAST(__excl DIV ${budget}L AS INT)"))
      .drop("__cum", "__excl")
  }

  /** Per-shard release MANIFEST: row count, exact weight sum, and an
    * order-independent 48-bit content fingerprint (bit_xor of each
    * member's md5-prefix id hash) — the integrity record a data release
    * ships beside its shards, so a consumer re-derives (count, weight,
    * xor) from any shard it downloaded and catches dropped, duplicated,
    * or cross-shard-mixed rows. XOR is associative/commutative/self-
    * inverse → one partial-aggregated groupBy, partitioning-invariant,
    * and replayable in any engine with the same md5 arithmetic (the
    * whole manifest sits on the oracle hash surface). */
  /** Diff two release [[manifest]]s (old `a` → new `b`): one row per shard
    * id present in either, with `status` added / removed / changed /
    * unchanged — "changed" when any of (n_rows, sum_weight, content_xor)
    * moved. This is the incremental-release validation a data consumer
    * runs before re-downloading: only `changed`/`added` shards need
    * transfer, and an unexpected `changed` deep in a supposedly
    * append-only release is the alarm. One full-outer join over two
    * |shards|-sized frames (manifests are corpus-volume-free by
    * construction); every column integer/string-exact, so the whole diff
    * sits on the oracle hash surface. */
  def releaseDiff(a: DataFrame, b: DataFrame,
      shardCol: String = "shard_id"): DataFrame = {
    def side(m: DataFrame, s: String): DataFrame =
      m.select(col(shardCol), col("n_rows").as(s"n_rows_$s"),
        col("sum_weight").as(s"sum_weight_$s"),
        col("content_xor").as(s"content_xor_$s"))
    side(a, "a").join(side(b, "b"), Seq(shardCol), "full_outer")
      .withColumn("status",
        when(col("n_rows_a").isNull, lit("added"))
          .when(col("n_rows_b").isNull, lit("removed"))
          .when(col("n_rows_a") === col("n_rows_b")
            && col("sum_weight_a") === col("sum_weight_b")
            && col("content_xor_a") === col("content_xor_b"), lit("unchanged"))
          .otherwise(lit("changed")))
  }

  def manifest(shards: DataFrame, shardCol: String, idCol: String,
      weight: Column): DataFrame = {
    val h = conv(substring(
      md5(concat(lit("m|"), col(idCol).cast("string"))), 1, 12), 16, 10)
      .cast("long")
    shards.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(weight).cast("long").as("sum_weight"),
        bit_xor(h).as("content_xor"))
  }
}
