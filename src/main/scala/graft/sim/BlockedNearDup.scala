package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sql.GraftFunctions

/** Embedding near-duplicate pairs within blocks, with oversized blocks
  * routed through SRP-LSH sub-buckets (the operator form of the
  * block-cap composition SCALE.md prescribed for q42; reference analog:
  * CLIP similarity over a full catalog, pred_inspector.py:103-108).
  *
  * Blocks at or under `maxBlock` rows are compared EXACTLY (every in-block
  * pair scored). A hotter block is split by the low `s` bits of a
  * deterministic sign-random-projection bucket, where `s` is the smallest
  * split (capped at `maxSplitBits`) with expectedBlock/2^s <= maxBlock —
  * so the expected sub-block size is always <= maxBlock and the per-block
  * pair space collapses from n² to n²/2^s. Near-identical vectors agree on
  * every SRP sign w.h.p. (exactly at cos = 1), so true duplicates keep
  * colliding after the split; the loss is only among borderline pairs.
  *
  * Scale plan (100 TB): block sizes are ONE map-side-combined aggregation
  * (|blocks| rows — broadcast back; block cardinality is assumed dimension-
  * like, not corpus-like). The corpus then crosses ONE full-width exchange,
  * an explicit repartition on (block, sub) — deliberately NOT on block
  * alone, so a hot block's sub-buckets land on DIFFERENT tasks and the
  * exchange is shared by both self-join sides (ReuseExchange). Everything
  * per-row (normalize, 8 sign dots, mask) is codegen'd projection work.
  *
  * Fully deterministic: hyperplanes derive from md5 constants (Knn.srpSigns)
  * embeddable in an external oracle's SQL, and the split ladder is integer
  * CASE logic — no float log2 edge cases to diverge across engines.
  */
object BlockedNearDup {

  /** Pairs (block, a, b, cos) with cos >= threshold, a < b, compared within
    * (block, sub-bucket). dim is the embedding width (hyperplane length).
    *
    * `broadcastSizes = true` (default) assumes block cardinality is
    * dimension-like (the per-block count table broadcasts); set it false
    * when blocks number in the many-millions — the count then comes from a
    * window over the block key (one extra corpus exchange, no driver-side
    * table). */
  def pairs(df: DataFrame, idCol: String, vecCol: String, blockCol: String,
      maxBlock: Int, threshold: Double, dim: Int, maxSplitBits: Int = 8,
      broadcastSizes: Boolean = true): DataFrame = {
    require(maxBlock >= 1 && maxSplitBits >= 1 && maxSplitBits <= 16)
    GraftFunctions.register(df.sparkSession)
    val signs = Knn.srpSigns(maxSplitBits, dim)

    // Smallest power-of-two split that brings the expected sub-block size
    // under maxBlock: mod = 2^s with s minimal s.t. bn <= maxBlock * 2^s.
    val subMod = (0 until maxSplitBits).foldRight(lit(1L << maxSplitBits)) { (s, acc) =>
      when(col("__bn") <= lit(maxBlock.toLong << s), lit(1L << s)).otherwise(acc)
    }

    val withBn =
      if (broadcastSizes) {
        val sizes = df.groupBy(col(blockCol)).agg(count(lit(1)).as("__bn"))
        df.join(broadcast(sizes), Seq(blockCol))
      } else {
        import org.apache.spark.sql.expressions.Window
        df.withColumn("__bn",
          count(lit(1)).over(Window.partitionBy(col(blockCol))))
      }
    val withSub = withBn
      .select(col(blockCol), col(idCol),
        GraftFunctions.l2NormalizeF32(col(vecCol)).as("__nv"),
        (Knn.srpBucket(col(vecCol), signs) % subMod).as("__sub"))
      .repartition(col(blockCol), col("__sub"))

    val a = withSub.select(col(blockCol), col("__sub"),
      col(idCol).as("a"), col("__nv").as("na"))
    val b = withSub.select(col(blockCol), col("__sub"),
      col(idCol).as("b"), col("__nv").as("nb"))
    a.join(b, Seq(blockCol, "__sub"))
      .filter(col("a") < col("b"))
      .select(col(blockCol), col("a"), col("b"),
        GraftFunctions.dotF32(col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** End-to-end embedding near-duplicate REMOVAL — the vector analog of
    * TextDedup.dropNearDuplicates, same keep-smallest-id per-pair policy
    * (and the same transitive-chain caveat documented there): every pair at
    * or above the threshold drops its larger id; one anti join on the id
    * after the pair pipeline. */
  def dropNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, maxBlock: Int, threshold: Double, dim: Int,
      maxSplitBits: Int = 8): DataFrame = {
    val dupIds = pairs(df, idCol, vecCol, blockCol, maxBlock, threshold, dim, maxSplitBits)
      .select(col("b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }
}
