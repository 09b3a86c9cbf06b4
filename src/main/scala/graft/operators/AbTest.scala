package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic A/B experiment readout: hash-based arm assignment (the
  * standard salt|unit-id bucketing — same user, same arm, every engine,
  * no assignment table to store) + the two-proportion z-test on a
  * per-unit conversion predicate.
  *
  * Determinism: the arm is a parity bit of md5(salt|unit) — the repo's
  * engine-replayable hash device — so assignment reproduces anywhere;
  * counts are exact longs; the lift/z chain is written with one fixed
  * association order of correctly-rounded IEEE ops (sqrt included), so
  * even the float cells hash-replay.
  *
  * Scale: one user-keyed partial-aggregated shuffle to per-unit
  * conversion flags, one 2-row aggregate, one 1-row pivot. Nothing else.
  */
object AbTest {

  private def hex48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Arm 0/1 from the salt|unit parity bit. */
  def arm(unit: Column, salt: String): Column =
    (hex48(concat(lit(salt + "|"), unit.cast("string"))) % 2).cast("int")

  /** Per-arm counts + conversion rates + lift + two-proportion z, one row.
    *
    * @param events    event rows
    * @param unitCol   randomization unit (user id)
    * @param converted row-level predicate; a unit converts if ANY of its
    *                  rows satisfies it
    * @param salt      experiment name — determines the assignment
    */
  def report(events: DataFrame, unitCol: String, converted: Column,
      salt: String): DataFrame = {
    val units = events
      .groupBy(col(unitCol).as("__u"))
      .agg(max(when(converted, 1L).otherwise(0L)).as("__conv"))
      .select(arm(col("__u"), salt).as("__arm"), col("__conv"))
    val byArm = units.groupBy(col("__arm"))
      .agg(count(lit(1)).as("n"), sum(col("__conv")).as("c"))
    val one = byArm.agg(
      max(when(col("__arm") === 0, col("n"))).as("n0"),
      max(when(col("__arm") === 0, col("c"))).as("c0"),
      max(when(col("__arm") === 1, col("n"))).as("n1"),
      max(when(col("__arm") === 1, col("c"))).as("c1"))
    // fixed association order, mirrored verbatim in the oracle SQL
    val p0 = col("c0").cast("double") / col("n0")
    val p1 = col("c1").cast("double") / col("n1")
    val p = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
    val se = sqrt((p * (lit(1.0d) - p))
      * (lit(1.0d) / col("n0") + lit(1.0d) / col("n1")))
    // degenerate experiment (everyone or no one converts): the pooled SE
    // is 0 and z is undefined — NULL, not an ANSI divide-by-zero
    one.select(col("n0"), col("c0"), col("n1"), col("c1"),
      p0.as("p0"), p1.as("p1"), (p1 - p0).as("lift"),
      when(se > 0.0d, (p1 - p0) / se).as("z"))
  }
}
