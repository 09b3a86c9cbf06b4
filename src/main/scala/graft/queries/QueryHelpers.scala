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

  /** Collision-free tmp-fixture key for a data directory: the sanitized
    * FULL path (not a 32-bit hashCode, which can collide across sfDirs and
    * silently reuse another dir's committed fixture). Distinct sfDir
    * strings always map to distinct keys. Fixtures keyed this way are
    * still per-path shared state: concurrent drivers pointed at the SAME
    * sfDir share the fixture, so bench/verify runs stay exclusive (the
    * bench docs' standing requirement). */
  def fixtureKey(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** DuckDB SQL for the value of 4 hex digits of `hexExpr` starting at
    * 1-based offset `off` — the oracle-side mirror of Spark's
    * conv(substring(hex, off+1, 4), 16, 10). */
  def hex4Sql(hexExpr: String, off: Int): String =
    Seq(4096, 256, 16, 1).zipWithIndex.map { case (m, i) =>
      s"(strpos('0123456789abcdef', ($hexExpr)[${off + i + 1}:${off + i + 1}]) - 1) * $m"
    }.mkString("(", " + ", ")")

  /** DuckDB SQL for the first 12 hex digits of `hexExpr` as a 48-bit BIGINT —
    * mirror of Spark's CAST(conv(substring(hex, 1, 12), 16, 10) AS BIGINT). */
  def hex48Sql(hexExpr: String): String =
    s"(${hex4Sql(hexExpr, 0)}::BIGINT * 4294967296 + ${hex4Sql(hexExpr, 4)}::BIGINT * 65536 + ${hex4Sql(hexExpr, 8)}::BIGINT)"
}
