package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column operations over ArrayType(FloatType) embeddings
  * (reference: CLIP vectors + dot-product similarity ranking,
  * pred_inspector.py:103-108 / app_utils.py:21-25, SURVEY §2.8 F7-F8).
  *
  * Determinism argument (why the oracle-checked queries can hash-match
  * DuckDB): per-element float→double widening and multiplication are
  * IEEE-deterministic, and `aggregate` folds strictly sequentially in array
  * order — the same evaluation order DuckDB's `list_sum` uses on a
  * `list_transform` result — so both engines produce bit-identical doubles.
  * The scalar arithmetic after the fold (`dot / (na * nb)`) is written with
  * the same association order in both SQL texts.
  *
  * For hot paths at CLIP-scale dims, graft.sql.DotF32 is the codegen'd
  * Catalyst Expression form of `dot` (primitive-array loop, no per-element
  * lambda dispatch); it computes the identical sequential fold.
  */
object VectorOps {

  /** Sequential-fold dot product (see determinism note above). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (association order fixed: dot / (na * nb)). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** L2-normalize a float vector (reference: app_utils.py:24 F8).
    *
    * HOF reference form — the captured norm is re-evaluated per element
    * (O(dim²)/row) and a same-select explode hoists it above the Generate.
    * Hot paths use graft.sql.L2NormalizeF32 (codegen, bit-identical);
    * parity between the two is asserted in DotF32Spec.
    */
  def l2Normalize(a: Column): Column = {
    val n = norm2(a)
    transform(a, x => (x.cast("double") / n).cast("float"))
  }
}
