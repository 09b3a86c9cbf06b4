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
}
