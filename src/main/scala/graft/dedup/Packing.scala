package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared (id, pos) → long packing for first-occurrence aggregates.
  *
  * `min(id·2^21 + pos)` stays a HashAggregate with map-side combine,
  * whereas `min(struct(id, pos))` compiles to a SortAggregate (measured 2×
  * slower at 4M rows — see SCALE.md, line-dedup entry). Packing is
  * order-preserving w.r.t. (id, pos) because 0 ≤ pos < 2^21 (guarded at
  * runtime) and id ≥ 0.
  */
object Packing {

  /** Positions must stay under 2^21 (2M lines/tokens per document). */
  val MaxPos: Long = 1L << 21

  /** Ids must stay under 2^42 so `id·2^21 + pos` fits a signed long;
    * a snowflake-style 64-bit id would otherwise wrap negative and
    * silently corrupt the min-based first-occurrence selection. */
  val MaxId: Long = 1L << 42

  /** `id·2^21 + pos` with a runtime guard; raises on out-of-range input
    * instead of silently mis-ordering. */
  def pack(id: Column, pos: Column): Column =
    when(pos >= 0 && pos < MaxPos && id >= 0 && id < MaxId,
        shiftleft(id.cast("long"), 21) + pos)
      .otherwise(raise_error(format_string(
        "Packing: need 0 <= pos < 2^21 and 0 <= id < 2^42, got id=%s pos=%s",
        id, pos)).cast("long"))

  def unpackId(packed: Column): Column = shiftright(packed, 21)

  def unpackPos(packed: Column): Column =
    packed.bitwiseAND(lit(MaxPos - 1)).cast("int")
}
