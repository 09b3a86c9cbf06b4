package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Shared helpers for the oracle-checked query surface.
  *
  * Cross-engine determinism strategy (Spark vs the driver's DuckDB oracle):
  *  - every floating-point REDUCTION goes through an exact decimal sum
  *    (`dsum`): per-row double arithmetic is IEEE-deterministic, the cast to
  *    decimal is deterministic, and decimal addition is exact and
  *    order-independent — so both engines produce bit-identical doubles
  *    regardless of partitioning/parallelism;
  *  - scalar double arithmetic after the reduction is written with the same
  *    association order in both SQL texts;
  *  - timestamps are emitted as epoch microseconds (parquet ns vs Spark µs
  *    precision would otherwise diverge);
  *  - every query output carries an explicit total ORDER BY.
  */
object QueryHelpers {
  type QueryFn = (SparkSession, String) => DataFrame

  /** Exact, order-independent sum of a double column: cast each value to
    * DECIMAL(18,scale), sum exactly, return as double. Oracle-side mirror:
    * CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE).
    * Precision headroom: sum type is DECIMAL(28,s) → safe to ~1e10 rows of
    * 1e9-magnitude values; beyond that widen to DECIMAL(28,s) inputs.
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic mean built from dsum / count. */
  def dmean(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(lit(1))

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)
}
