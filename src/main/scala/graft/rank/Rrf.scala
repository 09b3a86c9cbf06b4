package graft.rank

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack & Clarke, SIGIR 2009) — the standard
  * score-free combiner for hybrid retrieval: fused(d) = Σ_lists 1/(c + rank)
  * over every ranked list the document appears in. Pairs the engine's two
  * retrieval legs (Bm25 keyword top-k, sim.Knn embedding top-k) into the
  * hybrid search a curation pipeline runs over a corpus; extension scope
  * next to the reference's single-modality dot-product ranking
  * (pred_inspector.py:103-108).
  *
  * Scale + determinism: inputs are ALREADY top-k lists (k rows each — the
  * expensive global selection happened upstream as TakeOrdered/
  * WindowGroupLimit), so the fusion is a chain of k-row outer joins —
  * broadcast-sized by construction, never a corpus-wide shuffle. The score
  * is a FIXED left-to-right sum of per-list terms (1/(c+rank) — exact
  * IEEE rationals of integer ranks, no transcendentals), not a
  * shuffle-order SUM, so fused scores are bit-identical across runs,
  * partitionings, and engines; a missing list contributes +0.0, which is
  * the exact identity for finite doubles.
  */
object Rrf {

  /** Fuse ranked lists. Each frame must carry (`idCol`, `rankCol`) with
    * rank starting at 1. Output: idCol, one `rank_i` column per input list
    * (null where absent), and `rrf` = Σ_i coalesce(1/(c+rank_i), 0)
    * composed left-to-right. */
  def fuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
      c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(c >= 0, s"rank constant must be non-negative: $c")
    val renamed = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col(rankCol).cast("long").as(s"rank_$i"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = lists.indices
      .map(i => coalesce(lit(1.0) / (lit(c.toLong) + col(s"rank_$i")), lit(0.0)))
      .reduce(_ + _) // left-assoc, mirrored verbatim in oracle SQL
    joined.select(
      (col(idCol) +: lists.indices.map(i => col(s"rank_$i"))) :+ score.as("rrf"): _*)
  }

  /** [[fuse]] then keep the k best fused docs (rrf desc, id tie-break). */
  def fuseTopK(lists: Seq[DataFrame], idCol: String, rankCol: String, k: Int,
      c: Int = 60): DataFrame =
    fuse(lists, idCol, rankCol, c).orderBy(col("rrf").desc, col(idCol)).limit(k)

  /** Attach a 1-based `rank` to an ALREADY top-k frame by the given order.
    * The window is single-partition by design — it runs over ≤ k rows
    * (callers order-and-limit first; the global selection is TakeOrdered,
    * which scales; this ranking step is O(k)). */
  def rankBy(topK: DataFrame, order: Seq[Column]): DataFrame =
    topK.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(order: _*)))
}
