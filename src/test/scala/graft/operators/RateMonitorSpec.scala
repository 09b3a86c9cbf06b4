package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RateMonitorSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], num: Long = 3L) =
    RateMonitor.spikes(rows.toDF("g", "bucket", "n"), "g", "bucket", "n",
        num = num)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap

  test("baseline is the exact halved-weight sum of prior buckets") {
    val out = run(Seq(("a", 1L, 8L), ("a", 2L, 8L), ("a", 3L, 8L), ("a", 4L, 100L)))
    assert(out(("a", 1L))._2 === 0L) // no history
    assert(out(("a", 2L))._2 === 8L / 2)
    assert(out(("a", 3L))._2 === 8L / 2 + 8L / 4)
    assert(out(("a", 4L))._2 === 8L / 2 + 8L / 4 + 8L / 8)
    // 100 > 3 * 7 -> spike; steady rows are not
    assert(out(("a", 4L))._3 === true)
    assert(out(("a", 3L))._3 === false)
  }

  test("warmup rows (baseline 0) never flag, even when huge") {
    val out = run(Seq(("a", 1L, 1000000L), ("a", 2L, 5L)))
    assert(out(("a", 1L))._3 === false, "first bucket has no baseline to compare")
  }

  test("groups are independent windows") {
    val out = run(Seq(("a", 1L, 4L), ("b", 1L, 400L), ("a", 2L, 4L), ("b", 2L, 400L)))
    assert(out(("a", 2L))._2 === 2L && out(("b", 2L))._2 === 200L)
    assert(!out(("a", 2L))._3 && !out(("b", 2L))._3)
  }

  test("ratio is integer cross-multiplied (num/den respected exactly)") {
    // n=7, baseline=4: 7*2 > 3*4 is true for 3/2 ratio; 7*1 > 3*4 false for 3/1
    val rows = Seq(("a", 1L, 8L), ("a", 2L, 7L))
    val loose = RateMonitor.spikes(rows.toDF("g", "bucket", "n"), "g", "bucket", "n",
      num = 3L, den = 2L).filter($"bucket" === 2L).head().getBoolean(4)
    val strict = RateMonitor.spikes(rows.toDF("g", "bucket", "n"), "g", "bucket", "n",
      num = 3L, den = 1L).filter($"bucket" === 2L).head().getBoolean(4)
    assert(loose && !strict)
  }

  private def runCusum(rows: Seq[(String, Long, Long)], warmup: Int = 3,
      threshold: Long = 2L) =
    RateMonitor.cusum(rows.toDF("g", "bucket", "n"), "g", "bucket", "n",
        warmup = warmup, threshold = threshold)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getBoolean(4))).toMap

  test("cusum: a sustained small drift alarms where the spike test never would") {
    // baseline mean 10 (warmup 3); then six buckets of 13 — each bucket is
    // far below the 3x spike bar, but the drift accumulates:
    // dev = 13*3 - 30 = 9 per bucket; threshold 2*30 = 60 crossed at +7 devs? 9*7=63
    val rows = (1L to 3L).map(b => ("a", b, 10L)) ++
      (4L to 10L).map(b => ("a", b, 13L))
    val out = runCusum(rows)
    assert(out(("a", 4L)) == (9L, false))
    assert(out(("a", 9L)) == (54L, false))
    assert(out(("a", 10L)) == (63L, true), "7th drift bucket crosses 2x warmup-mean")
    // the EWMA spike test stays silent on the same series
    val spikes = RateMonitor.spikes(rows.toDF("g", "bucket", "n"), "g", "bucket", "n")
      .filter(col("is_spike")).count()
    assert(spikes == 0L)
  }

  test("cusum: warmup rows report zero and never alarm") {
    val out = runCusum((1L to 3L).map(b => ("a", b, 1000000L)))
    assert(out.values.forall(_ == (0L, false)))
  }

  test("cusum: a downward shift alarms on the absolute value") {
    val rows = (1L to 3L).map(b => ("a", b, 10L)) ++
      (4L to 11L).map(b => ("a", b, 1L))
    val out = runCusum(rows)
    // dev = 1*3 - 30 = -27 per bucket; |cusum| > 60 at bucket 6 (-81)
    assert(out(("a", 5L)) == (-54L, false) && out(("a", 6L)) == (-81L, true))
  }

  test("cusum: groups are independent; exact integer arithmetic") {
    val rows = Seq(("a", 1L, 2L), ("b", 1L, 9L), ("a", 2L, 2L), ("b", 2L, 9L),
      ("a", 3L, 2L), ("b", 3L, 9L), ("a", 4L, 4L), ("b", 4L, 9L))
    val out = runCusum(rows)
    assert(out(("a", 4L))._1 == 4L * 3 - 6L)
    assert(out(("b", 4L))._1 == 0L)
  }
}
