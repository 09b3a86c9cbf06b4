package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.TextDedup

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as plain dataflow —
  * the point-frequency member of the engine's mergeable-summary family
  * (ApproxStats: HLL++ distinct, GK quantiles, Misra–Gries heavy
  * hitters). depth×width counters; a key's estimate is the MINIMUM of
  * its depth counters, an overestimate by at most ε·N with
  * ε ≈ e/width at confidence 1 − e^−depth. Extension scope — no
  * reference counterpart.
  *
  * Hashes are the engine-standard device: 32-bit md5-prefix base hash
  * composed with [[TextDedup.minhashCoefficients]]'s affine maps mod the
  * minhash prime, then mod width — plain constants, exact 64-bit
  * arithmetic, so an external oracle replays every counter bit-for-bit.
  *
  * Scale shape: building the sketch is ONE partial-aggregated shuffle
  * whose key space is depth×width (constant), so a corpus-hot key
  * collapses map-side — the sketch never shuffles the key universe,
  * and the finished sketch (≤ depth·width rows) broadcasts anywhere.
  * `merge` is a union + re-sum: sketches from different corpus shards /
  * streaming batches combine associatively.
  */
object CountMin {

  /** A built sketch WITH its dimensions: estimates computed against a
    * sketch must hash probe keys with the same (depth, width) the
    * counters were built with — a mismatched pair silently violates the
    * CMS est ≥ cnt guarantee — so the pair travels with the counters
    * and probe/merge validate instead of trusting callers to repeat the
    * parameters. */
  final case class Sketch(counters: DataFrame, depth: Int, width: Int)

  private def baseHash(key: Column): Column =
    conv(substring(md5(key), 1, 8), 16, 10).cast("long")

  private def bucketFor(h: Column, i: Int, width: Int): Column = {
    val (a, b) = TextDedup.minhashCoefficients(i + 1)(i)
    ((h * a + b) % TextDedup.MinhashPrime % width).cast("int")
  }

  /** Build the sketch: counters (row, bucket, cnt) — at most depth×width
    * rows. Every input row contributes weight 1 to one bucket per
    * sketch row. */
  def sketch(df: DataFrame, key: Column, depth: Int = 4,
      width: Int = 256): Sketch = {
    require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2")
    Sketch(df.select(baseHash(key).as("__h"))
      .select(posexplode(array(
        (0 until depth).map(i => bucketFor(col("__h"), i, width)): _*))
        .as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt")), depth, width)
  }

  /** Combine sketches: union + re-sum. Associative and commutative —
    * the streaming/sharded merge. Raises on mismatched dimensions. */
  def merge(a: Sketch, b: Sketch): Sketch = {
    require(a.depth == b.depth && a.width == b.width,
      s"cannot merge sketches of different shape: " +
        s"${a.depth}x${a.width} vs ${b.depth}x${b.width}")
    Sketch(a.counters.unionByName(b.counters)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt")), a.depth, a.width)
  }

  /** Point-frequency estimates for `probes` (a DataFrame with `keyCol`):
    * min over the key's depth counters; a bucket the sketch never saw
    * counts 0. Probe hashing reuses the sketch's own (depth, width).
    * The sketch side is broadcast — it is ≤ depth×width rows by
    * construction — so probing any number of keys is one map-side
    * join, no shuffle of the probe stream. */
  def estimate(sk: Sketch, probes: DataFrame, keyCol: String): DataFrame = {
    val lookups = probes
      .select(col(keyCol), baseHash(col(keyCol)).as("__h"))
      .select(col(keyCol), posexplode(array(
        (0 until sk.depth).map(i => bucketFor(col("__h"), i, sk.width)): _*))
        .as(Seq("row", "bucket")))
    lookups.join(broadcast(sk.counters), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
