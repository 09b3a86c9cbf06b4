package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") left join — the feature-store primitive the
  * reference's training pull needs for label-leakage safety: every spine row
  * (a label event at time t) is enriched with the value of the most recent
  * feature row at-or-before t for the same key, never a later one.
  * (Reference analog: the training window cut of my_merlin_flow.py:48-61
  * guards leakage at the split level only; a per-row as-of join is the
  * general form when features themselves are time-varying.)
  *
  * Spark has no ASOF JOIN operator, and the naive formulations melt at scale:
  * a range join (`s.key = f.key AND f.t <= s.t` + argmax) is O(|matches|)
  * with no equi-bound on the time side, and a per-spine-row correlated
  * subquery is not expressible distributively at all. This implementation is
  * the sort-merge formulation instead: union the two sides, sort each key
  * partition once by (t, side), and carry the last non-null feature value
  * forward with an IGNORE NULLS window — ONE exchange on the key for
  * spine+features together, linear work per partition, no row
  * multiplication. That plan survives 100 TB: it is the same shape as any
  * windowed aggregation, AQE handles skewed keys, and nothing is collected.
  *
  * Semantics (asserted against a brute-force argmax in AsOfJoinSpec and a
  * DuckDB ASOF LEFT JOIN oracle, q55):
  *  - inclusive: a feature at exactly spine time IS visible (feature rows
  *    order before spine rows at equal t);
  *  - no match (or match older than `toleranceOpt`) => null feature columns;
  *  - several feature rows at the same (key, t) resolve to the greatest
  *    `valueCols` tuple (explicit tie-break, deterministic across engines —
  *    callers wanting different precedence should pre-dedup the feature side
  *    with e.g. Relational.keepFirstPerKey);
  *  - output columns: every spine column, plus `asof_<c>` for each value
  *    column and `asof_<featureTs>` (the matched feature's time, for
  *    staleness accounting downstream).
  *
  * `spineTs`/`featureTs` must be mutually comparable and orderable (same
  * numeric/timestamp type on both sides; at cross-engine parity boundaries
  * pass epoch micros). `toleranceOpt` (max allowed staleness, inclusive) is
  * in the units of the time column's LONG cast — native units for numeric
  * time columns, whole SECONDS for timestamp columns; pass epoch-micro longs
  * when sub-second tolerance matters.
  */
object AsOfJoin {

  /** Resample each key's event stream onto a regular time grid — the
    * fixed-rate input prep for sequence models: per key, ticks run from
    * floor(min ts / step)·step to max ts inclusive, and each tick carries
    * the most recent observation at-or-before it (ticks before the first
    * observation stay null). `tsCol` must be an integral time (epoch
    * ms/µs). Output: keys, `tick`, asof_<valueCols>, asof_<tsCol>.
    *
    * Plan: one aggregation for per-key bounds, an explode for the grid
    * (grid size = range/step per key — pick `step` accordingly), then the
    * [[asOf]] single-exchange carry. No fact-table self-joins.
    */
  def resample(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCols: Seq[String],
      step: Long): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    val grid = df
      .groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("__mn"), max(col(tsCol)).as("__mx"))
      .select(keys.map(col) :+
        explode(sequence(expr(s"(__mn div ${step}L) * ${step}L"),
          col("__mx"), lit(step))).as("tick"): _*)
    asOf(grid, df.select((keys :+ tsCol).map(col) ++ valueCols.map(col): _*),
      keys, "tick", tsCol, valueCols)
  }

  def asOf(
      spine: DataFrame,
      features: DataFrame,
      keys: Seq[String],
      spineTs: String,
      featureTs: String,
      valueCols: Seq[String],
      toleranceOpt: Option[Long] = None): DataFrame = {
    require(valueCols.nonEmpty, "asOf needs at least one feature value column")
    val spineCols = spine.columns.toSeq
    require(!spineCols.exists(c => valueCols.contains(c)),
      s"spine/feature column collision: ${spineCols.intersect(valueCols)}")

    val fTypes = features.schema.fields.map(f => f.name -> f.dataType).toMap
    val sTypes = spine.schema.fields.map(f => f.name -> f.dataType).toMap

    // Shared union schema: spine columns ++ feature value columns ++ the
    // feature time (re-typed nulls on the side that lacks each column).
    val spineSide = spine
      .withColumn("__t", col(spineTs))
      .withColumn("__side", lit(1))
      .select(spineCols.map(col) ++
        valueCols.map(c => lit(null).cast(fTypes(c)).as(c)) :+
        lit(null).cast(fTypes(featureTs)).as("__ft") :+
        col("__t") :+ col("__side"): _*)
    val featureSide = features
      .withColumn("__t", col(featureTs).cast(sTypes(spineTs)))
      .withColumn("__side", lit(0))
      .select(spineCols.map(c =>
          if (keys.contains(c)) col(c) else lit(null).cast(sTypes(c)).as(c)) ++
        valueCols.map(col) :+
        col(featureTs).as("__ft") :+
        col("__t") :+ col("__side"): _*)

    // One wide exchange: the window partitions on the key; order is
    // (t, side, values) so feature-before-spine at equal t gives inclusive
    // semantics and the trailing value columns break exact feature ties.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc +: col("__side").asc +: valueCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Carry the matched feature ROW as one struct, not column-by-column:
    // per-column last(..., ignoreNulls) would skip a feature's legitimate
    // null VALUE and stitch together fields of different feature rows
    // (mis-timing staleness and emitting tuples that never existed). The
    // struct is null exactly on spine rows, so ignoreNulls carries the
    // latest whole feature row — row-wise, like a real ASOF join.
    val featRow = when(col("__side") === 0,
      struct(valueCols.map(col) :+ col("__ft").as("__ft"): _*))
    val carried = spineSide.unionAll(featureSide)
      .withColumn("__asof", last(featRow, ignoreNulls = true).over(w))

    val fresh = toleranceOpt match {
      case Some(tol) => col("__asof.__ft").isNotNull &&
        col("__t").cast("long") - col("__asof.__ft").cast("long") <= tol
      case None => col("__asof").isNotNull
    }
    carried
      .filter(col("__side") === 1)
      .select(spineCols.map(col) ++
        valueCols.map(c => when(fresh, col(s"__asof.$c")).as(s"asof_$c")) :+
        when(fresh, col("__asof.__ft")).as(s"asof_$featureTs"): _*)
  }
}
