package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator computing the element-wise mean of Array[Float] vectors
  * per group — the engine's UDAF extension point (SURVEY §2.11; no UDAF
  * exists in the reference, so this is the extension surface a user would
  * reach for first: per-label centroids feed IVF-style coarse quantization
  * on top of the SRP-LSH path, and cluster summaries for embedding QA).
  *
  * Merge-associative partial aggregation (sum + count) → map-side combine,
  * one shuffle of dim+1 doubles per group per partition.
  */
object VecCentroidAgg extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) = {
    if (a == null) return b
    val sums = if (b._1.isEmpty) new Array[Double](a.length) else b._1
    var i = 0
    while (i < a.length && i < sums.length) { sums(i) += a(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) return y
    if (y._1.isEmpty) return x
    val sums = x._1.clone()
    var i = 0
    while (i < sums.length && i < y._1.length) { sums(i) += y._1(i); i += 1 }
    (sums, x._2 + y._2)
  }

  override def finish(r: (Array[Double], Long)): Array[Float] =
    if (r._2 == 0) Array.empty[Float]
    else r._1.map(s => (s / r._2).toFloat)

  override def bufferEncoder: Encoder[(Array[Double], Long)] = ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Float]] = ExpressionEncoder()

  /** Column form for DataFrame groupBy.agg. */
  def centroid(vec: Column): Column =
    org.apache.spark.sql.functions.udaf(this).apply(vec)
}
