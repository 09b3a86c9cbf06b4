package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality gate — the engine form of the reference's dbt schema tests
  * (schema.yml: `unique` + `not_null` on ARTICLE_ID / CUSTOMER_ID), extended
  * from pass/fail assertions into row-level QUARANTINE: at 100 TB a failed
  * batch is not "rerun after fixing the source", it is "route the bad rows
  * aside and keep the pipeline moving".
  *
  * Row checks (not-null, accepted-values, range) are pure predicates —
  * free, codegen'd, no shuffle. Uniqueness is not row-local: it becomes a
  * per-key window count (one shuffle per distinct key set). Null-valued
  * predicates count as PASSING (dbt's convention: range/accepted tests
  * skip nulls; pair them with notNull to reject nulls) — and the same CASE
  * WHEN NULL semantics holds in any SQL engine, which keeps the audit
  * oracle-checkable.
  */
object Quality {

  final case class Check(name: String, passes: Column)

  def notNull(c: String): Check = Check(s"not_null_$c", col(c).isNotNull)
  def accepted(c: String, values: Seq[String]): Check =
    Check(s"accepted_$c", col(c).isin(values: _*))
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"range_$c", col(c).between(lo, hi))

  /** Percentile bucketing — the CCNet head/middle/tail device (Wenzek et
    * al. 2020 split a corpus into perplexity tertiles and sample the mix
    * from them) generalized to any score and bucket count: row → index of
    * the quantile bucket its `metric` falls in (0 = lowest scores).
    * Thresholds are ONE exact-percentile aggregate (nBuckets − 1 values)
    * broadcast back as a 1-row cross join; bucket = Σᵢ 1[metric > tᵢ], so
    * assignment is a pure comparison battery — no sort of the corpus, no
    * ntile window (ntile would force a single global ordering). NULL
    * metrics get a NULL bucket (percentile ignores them, so thresholds
    * are unaffected). For sketch-scale corpora swap in ApproxStats' GK
    * quantiles at the same seam. */
  def percentileBuckets(df: DataFrame, metric: Column, nBuckets: Int,
      out: String = "bucket"): DataFrame = {
    require(nBuckets >= 2, s"need nBuckets >= 2: $nBuckets")
    val ts = (1 until nBuckets)
    val thresholds = df.agg(
      percentile(metric, lit(1.0 / nBuckets)).as("__t1"),
      ts.tail.map(i => percentile(metric, lit(i.toDouble / nBuckets)).as(s"__t$i")): _*)
    df.crossJoin(broadcast(thresholds))
      .withColumn(out,
        when(metric.isNull, lit(null))
          .otherwise(ts.map(i => when(metric > col(s"__t$i"), 1).otherwise(0))
            .reduce(_ + _)))
      .drop(ts.map(i => s"__t$i"): _*)
  }

  /** Per-group percentile calibration: percent_rank of `metric` inside each
    * group — the standard fix when one quality score must gate SEVERAL
    * heterogeneous sources (a classifier margin distributes differently on
    * web text vs books vs code; a single global threshold keeps all of one
    * and none of another — FineWeb-class pipelines therefore threshold the
    * per-source RANK, not the raw score). `tieBreak` must make the order
    * total so the rank — and the (rank−1)/(n−1) division, one IEEE op —
    * is a pure function of the data (engine-exact; single-member groups
    * are 0.0 in every engine). One partitioned window: spillable,
    * parallel across groups; compose with the topKPerGroupSalted two-phase
    * pattern if one source dominates the corpus. */
  def percentileCalibrate(df: DataFrame, groupCol: String, metric: Column,
      tieBreak: Seq[Column], out: String = "pr"): DataFrame =
    df.withColumn(out, percent_rank().over(
      Window.partitionBy(col(groupCol)).orderBy(metric +: tieBreak: _*)))

  /** Quantile-threshold pruning: keep rows whose `metric` lies inside the
    * [loQ, hiQ] exact percentiles of the corpus (the score-based corpus
    * trim a cleaning pipeline runs after quality scoring — drop the
    * shortest/longest, most/least repetitive tail). Thresholds come from
    * ONE exact-percentile aggregate (2 values, broadcast back as a 1-row
    * cross join — no driver round trip in the lineage); for sketch-scale
    * corpora swap in ApproxStats' GK quantiles at the same seam. */
  def trimOutliers(df: DataFrame, metric: Column, loQ: Double, hiQ: Double): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ, s"need 0 <= loQ < hiQ <= 1: $loQ, $hiQ")
    val bounds = df.agg(
      percentile(metric, lit(loQ)).as("__lo"),
      percentile(metric, lit(hiQ)).as("__hi"))
    df.crossJoin(broadcast(bounds))
      .filter(metric >= col("__lo") && metric <= col("__hi"))
      .drop("__lo", "__hi")
  }

  /** Line-granular quality filtering + document reassembly — the
    * FineWeb/RefinedWeb line-removal pass (filter the BAD LINES, keep the
    * doc): exploded (id, pos, line) rows are kept where `keep` holds and
    * each document is rebuilt from its surviving lines in order (the
    * LineDedup rebuild — one partial-agg shuffle on the doc key). Every
    * input doc survives, possibly as "" — the gate downstream decides.
    * `keep` should be a pure row-local predicate (integer
    * cross-multiplied ratios, the GopherQuality device) so the whole
    * pass is filter + rebuild, no extra pass over the corpus. */
  def filterLines(lines: DataFrame, idCol: String, posCol: String,
      lineCol: String, keep: Column, sep: String = "\n"): DataFrame =
    graft.dedup.LineDedup.rebuild(
      lines.filter(keep).select(col(idCol), col(posCol), col(lineCol)),
      lines, idCol, posCol, lineCol, sep)

  /** Annotate every row with `failures`: a deterministic comma-joined list
    * of failed check names (empty string = clean row). `uniqueKeys` adds a
    * dbt-style uniqueness check per key set. */
  def audit(df: DataFrame, checks: Seq[Check],
      uniqueKeys: Seq[Seq[String]] = Nil): DataFrame = {
    val uniq = uniqueKeys.map { ks =>
      // dbt's unique test ignores NULL keys (its SQL filters `where col is
      // not null`) — null-keyed rows pass here and are notNull's business,
      // otherwise pairing the two per dbt convention double-counts.
      val anyNull = ks.map(col(_).isNull).reduce(_ || _)
      Check(s"unique_${ks.mkString("_")}",
        anyNull || count(lit(1)).over(Window.partitionBy(ks.map(col): _*)) <= 1)
    }
    val all = checks ++ uniq
    require(all.nonEmpty, "audit needs at least one check")
    df.withColumn("failures",
      concat_ws(",", all.map(c => when(!c.passes, lit(c.name))): _*))
  }

  /** Split into (clean, quarantined) — quarantined rows keep their
    * `failures` annotation for triage. */
  def quarantine(df: DataFrame, checks: Seq[Check],
      uniqueKeys: Seq[Seq[String]] = Nil): (DataFrame, DataFrame) = {
    val a = audit(df, checks, uniqueKeys)
    (a.filter(col("failures") === "").drop("failures"),
      a.filter(col("failures") =!= ""))
  }

  /** Per-check violation counts — the dbt test report, as one aggregation. */
  def summary(df: DataFrame, checks: Seq[Check],
      uniqueKeys: Seq[Seq[String]] = Nil): DataFrame =
    audit(df, checks, uniqueKeys)
      .select(explode(split(col("failures"), ",")).as("check"))
      .filter(col("check") =!= "")
      .groupBy(col("check")).agg(count(lit(1)).as("violations"))
}
