package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog as DATAFLOW (Flajolet et al. 2007): the register table —
  * (bucket, max_rho) over a keyed corpus — is itself the sketch artifact,
  * built with one partial-aggregated groupBy, merged across batches with
  * another (`GREATEST` is associative/commutative/idempotent), persisted
  * as parquet like every other model artifact (Categorify/NgramLm/Dsir
  * philosophy). Completes the mergeable-summary family next to CountMin
  * (point frequency) and the Bloom blocklist (membership): HLL answers
  * incremental DISTINCT-COUNT — "how many unique URLs/fingerprints so
  * far" across a rolling crawl without ever rescanning history.
  *
  * Spark-first + oracle design: the hash is md5 (engine-replayable, the
  * repo-wide determinism device) — bucket = first 3 hex digits (4096
  * registers, p=12), rho = leading-zero count + 1 of the NEXT 48 bits,
  * computed by an integer comparison ladder (a CASE battery over powers
  * of two — the percentileBuckets technique), so the whole register
  * table is exact integers any engine reproduces bit-for-bit. The
  * harmonic-mean ESTIMATE involves 2^-r floats and stays spec-land
  * (Spark's own approx_count_distinct cross-checks it), off the oracle
  * hash surface — same split as Dsir's logw.
  *
  * Scale: registers ≤ 4096 rows by construction (map-side combine bounds
  * every shuffle at tasks×4096 rows); merge is register-table-sized;
  * nothing grows with the corpus. Standard error ≈ 1.04/√4096 ≈ 1.6%.
  */
object Hll {

  val Buckets = 4096 // p = 12 bits
  val RhoBits = 48   // rho computed over md5 hex digits 4..15
  val MaxRho = RhoBits + 1

  /** Register index: first 3 hex digits of md5(key) — [0, 4096). */
  def bucketOf(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 3), 16, 10).cast("int")

  /** The 48-bit window the rank is computed over (hex digits 4..15). */
  private def window(key: Column): Column =
    conv(substring(md5(key.cast("string")), 4, 12), 16, 10).cast("long")

  /** rho = leading-zero count + 1 over the 48-bit window; w = 0 → 49.
    * A pure integer comparison ladder — identical CASE battery emitted
    * for the DuckDB oracle by [[rhoSql]]; no log2/float anywhere. */
  def rhoOf(key: Column): Column = {
    val w = window(key)
    // w >= 2^(48-r) ⇒ rho = r, first match wins (r = 1 strongest)
    (1 to RhoBits).foldRight(lit(MaxRho): Column) { case (r, acc) =>
      when(w >= (1L << (RhoBits - r)), lit(r)).otherwise(acc)
    }
  }

  /** The same ladder as ANSI SQL over a hex-window BIGINT expression
    * `wExpr` (see QueryHelpers.hex48Sql for the window itself). */
  def rhoSql(wExpr: String): String =
    (1 to RhoBits).map(r => s"WHEN $wExpr >= ${1L << (RhoBits - r)} THEN $r")
      .mkString("CASE ", " ", s" ELSE $MaxRho END")

  /** Build the register table: (bucket, max_rho), ≤ [[Buckets]] rows.
    * Buckets never touched by any key are absent (sparse form — the
    * merge and estimate treat absence as rho 0). */
  def registers(df: DataFrame, key: Column): DataFrame =
    df.select(bucketOf(key).as("bucket"), rhoOf(key).as("__rho"))
      .groupBy(col("bucket")).agg(max(col("__rho")).as("max_rho"))

  /** Merge sketches: per-bucket GREATEST — associative, commutative,
    * idempotent, so batches can merge in any order/grouping (the union
    * of the inputs equals the sketch of the unioned corpora). */
  def merge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col("bucket")).agg(max(col("max_rho")).as("max_rho"))
  }

  /** Per-group register tables in ONE corpus pass: (group, bucket,
    * max_rho), ≤ |groups| × [[Buckets]] rows — the partial-aggregated
    * shuffle is bounded the same way as [[registers]]. */
  def registersBy(df: DataFrame, groupCol: String, key: Column): DataFrame =
    df.select(col(groupCol), bucketOf(key).as("bucket"), rhoOf(key).as("__rho"))
      .groupBy(col(groupCol), col("bucket")).agg(max(col("__rho")).as("max_rho"))

  /** Pairwise UNION sketches over a per-group register table: for every
    * unordered group pair (a < b), the per-bucket GREATEST of the two
    * sketches, summarized as exact integers — (group_a, group_b,
    * n_union_buckets, sum_union_rho). With the per-group summaries this
    * is everything inclusion–exclusion needs for an overlap estimate
    * (|A∩B| ≈ est(A) + est(B) − est(A∪B)); the float estimate itself
    * stays spec-land ([[estimate]]), off the oracle hash surface.
    *
    * Scale: operates ONLY on register tables (|groups| × 4096 rows, no
    * corpus data) — both joins broadcast the pair list; the pair space is
    * |groups|², never corpus volume. The exact q133 overlap matrix joins
    * the full distinct-gram sets; this is its sketch counterpart when the
    * gram universe no longer fits a join. */
  def pairUnionSummary(regs: DataFrame, groupCol: String): DataFrame = {
    val gs = regs.select(col(groupCol).as("__g")).distinct()
    val pairs = gs.select(col("__g").as("__ga"))
      .join(gs.select(col("__g").as("__gb")), col("__ga") < col("__gb"))
    val aSide = regs.join(broadcast(pairs), col(groupCol) === col("__ga"))
    val bSide = regs.join(broadcast(pairs), col(groupCol) === col("__gb"))
    aSide.unionByName(bSide)
      .groupBy(col("__ga").as("group_a"), col("__gb").as("group_b"), col("bucket"))
      .agg(max(col("max_rho")).as("max_rho"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).as("n_union_buckets"),
        sum(col("max_rho")).as("sum_union_rho"))
  }

  def save(registers: DataFrame, path: String): Unit =
    registers.write.mode("overwrite").parquet(path)

  def load(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Distinct-count estimate from a register table: the HLL harmonic
    * mean with the standard small-range (linear counting) correction.
    * Driver-side arithmetic over ≤ 4096 collected rows — bounded by
    * construction. */
  def estimate(registers: DataFrame): Double = {
    val rows = registers.select(col("max_rho")).collect().map(_.getInt(0))
    val m = Buckets.toDouble
    val zeros = m - rows.length // absent buckets count as rho 0
    val sum = zeros * 1.0 + rows.map(r => math.pow(2.0, -r)).sum
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }
}
