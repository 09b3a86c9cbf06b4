package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded deterministic corpus shuffle — the global reorder every
  * pre-training pipeline runs between dedup/filtering and shard packing,
  * so that training order carries no source/crawl locality. Extension
  * scope — no reference counterpart (the reference's Snowflake SAMPLE is
  * its only ordering-adjacent op).
  *
  * The shuffle key is the first 48 bits of md5(seed || id) — the engine's
  * standard engine-reproducible hash device (hashSample, DataMix, negative
  * sampling use the same construction), so the permutation is a pure
  * function of (seed, id): stable across runs, partitionings, and engines,
  * and changing the seed is a fresh permutation. Ties (≈ n²/2⁴⁹ pairs) are
  * broken by id via [[ShardPack.cumsum]]'s tie-break columns, keeping the
  * total order unique WITHOUT widening the bucket key.
  *
  * Scale shape: shuffledShards is ShardPack's two-level exact prefix sum
  * over the hashed order — one min/max aggregate, one partitioned window,
  * one broadcast of `buckets` offsets. No global single-partition window,
  * no driver-side permutation table.
  */
object CorpusShuffle {

  /** 48-bit md5-prefix shuffle key for (seed, id) — monotone in nothing,
    * deterministic in everything. */
  def shuffleKey(seed: String, id: Column): Column =
    conv(substring(md5(concat(lit(seed + "|"), id.cast("string"))), 1, 12),
      16, 10).cast("long")

  /** Adds `shuffle_key` and `shard_id`: rows are packed into shards of
    * cumulative `weight` ≤ `budget` (+ at most one row) in seeded-shuffle
    * order. The (shuffle_key, id) order is total and engine-reproducible,
    * so shard contents are bit-stable. */
  def shuffledShards(df: DataFrame, idCol: String, weight: Column,
      seed: String, budget: Long, buckets: Int = 256): DataFrame =
    ShardPack.assignShards(
      df.withColumn("shuffle_key", shuffleKey(seed, col(idCol))),
      "shuffle_key", weight, budget, buckets, tieBreak = Seq(col(idCol)))
}
