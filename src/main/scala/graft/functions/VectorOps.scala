package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column operations over ArrayType(FloatType) embeddings
  * (reference: CLIP vectors + dot-product similarity ranking,
  * pred_inspector.py:103-108 / app_utils.py:21-25, SURVEY §2.8 F7-F8).
  *
  * Two tiers:
  *  - `dotExact` / `cosineExact`: reductions through exact decimal sums —
  *    order-independent and bit-identical across engines; used by the
  *    oracle-checked queries.
  *  - `dot` / `cosine`: plain double higher-order-function fold — fast path
  *    for ANN/bench; see graft.sql.DotProduct for the codegen Expression.
  */
object VectorOps {

  /** Deterministic dot product: per-element double multiply (IEEE-
    * deterministic) and a strict sequential left-fold in array order —
    * the same evaluation order DuckDB's list_sum uses, so results are
    * bit-identical across engines. (A decimal accumulator would be order-
    * independent too, but Spark's aggregate() HOF cannot keep a stable
    * decimal accumulator type: each + grows precision until the 38-cap
    * shrinks the scale and the lambda no longer typechecks.) */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm2Exact(a: Column): Column = sqrt(dotExact(a, a))

  /** Exact cosine similarity (association order fixed: dot / (na * nb)). */
  def cosineExact(a: Column, b: Column): Column =
    dotExact(a, b) / (norm2Exact(a) * norm2Exact(b))

  /** Fast double-fold dot product (bench path; not cross-engine-exact). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** L2-normalize a float vector (reference: app_utils.py:24 F8). */
  def l2Normalize(a: Column): Column = {
    val n = norm2(a)
    transform(a, x => (x.cast("double") / n).cast("float"))
  }
}
