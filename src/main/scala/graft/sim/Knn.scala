package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.operators.Relational

/** Approximate/exact nearest-neighbor search over an embedding column
  * (extension scope; reference analog: CLIP dot-product ranking in
  * pred_inspector.py:103-108).
  *
  * Scale design: brute force is O(|Q|·|C|) — correct baseline, fine when the
  * query set is small and broadcastable (it is scanned as the build side of
  * a broadcast nested-loop join, so the candidate table streams through one
  * pass, no shuffle). For |Q| ~ |C| at 100 TB use `lshTopK`: sign-random-
  * projection buckets cut the pair space to per-bucket cross products, one
  * shuffle on the bucket key.
  */
object Knn {

  /** Exact brute-force top-k by cosine. `queries` must be small (broadcast).
    * simFn lets callers pick the scoring kernel (exact-decimal for oracle
    * parity, fast double / codegen Expression for throughput). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, simFn: (Column, Column) => Column = VectorOps.cosine): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), simFn(col("__qv"), col("__cv")).as("cos"))
    Relational.topKPerGroup(scored, Seq("query_id"),
      Seq(col("cos").desc, col("neighbor_id").asc), k)
  }

  /** Deterministic sign-random-projection bucket id: `bits` hyperplanes
    * whose coefficients are pseudo-random in {-1,+1} derived from
    * xxhash64(plane, dim) — reproducible across runs/engines with no stored
    * model. Bucket = the sign-bit string. */
  def srpBucket(vec: Column, dim: Int, bits: Int): Column = {
    val planeBits = (0 until bits).map { p =>
      // dot(vec, hyperplane_p) where hyperplane_p[d] = ±1 from a hash
      val contrib = (0 until dim).map { d =>
        val sign = when(xxhash64(lit(p), lit(d)).bitwiseAND(lit(1L)) === 1L, 1.0).otherwise(-1.0)
        element_at(vec, d + 1).cast("double") * sign
      }.reduce(_ + _)
      when(contrib >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    planeBits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k: candidates restricted to the query's SRP bucket. One shuffle
    * on the bucket key; recall tuned by `bits` (fewer bits = bigger buckets =
    * higher recall, more compute). Multi-probe: pass probes>0 to also search
    * buckets at Hamming distance 1 (flipping each of the first `probes`
    * bits). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int, bits: Int,
      k: Int, probes: Int = 0): DataFrame = {
    val withBucket = df.select(col(idCol), col(vecCol),
      srpBucket(col(vecCol), dim, bits).as("bucket"))
    val qBuckets =
      if (probes == 0) withBucket.select(col(idCol), col(vecCol), col("bucket"))
      else {
        val flips = lit(0L) +: (0 until probes).map(p => shiftleft(lit(1L), p))
        withBucket.select(col(idCol), col(vecCol),
          explode(array(flips.map(f => col("bucket").bitwiseXOR(f)): _*)).as("bucket"))
      }
    val q = qBuckets.select(col("bucket"), col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = withBucket.select(col("bucket"), col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosine(col("__qv"), col("__cv")).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("cos")).as("cos"))
    Relational.topKPerGroup(scored, Seq("query_id"),
      Seq(col("cos").desc, col("neighbor_id").asc), k)
  }
}
