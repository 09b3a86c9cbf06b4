package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpecBase {
  import spark.implicits._

  private def toks = tbl("documents")
    .select(explode(TextOps.tokens($"text")).as("k"))

  test("estimates never undercount, and are exact without collisions") {
    val sk = CountMin.sketch(toks, $"k")
    val exact = toks.groupBy($"k").agg(count(lit(1)).as("cnt"))
    val est = CountMin.estimate(sk, exact.select($"k"), "k")
      .join(exact, Seq("k"))
      .as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (k, e, c) =>
      assert(e >= c, s"CMS undercounted '$k': est $e < exact $c")
    }
    // a vocabulary far under width*depth capacity: no collisions, all exact
    val tiny = (0 until 40).flatMap(n => Seq.fill(n + 1)(s"t$n")).toDF("k")
    val tsk = CountMin.sketch(tiny, $"k", depth = 4, width = 4096)
    val texact = tiny.groupBy($"k").agg(count(lit(1)).as("cnt"))
    val tEst = CountMin.estimate(tsk, texact.select($"k"), "k")
      .join(texact, Seq("k")).as[(String, Long, Long)].collect()
    assert(tEst.forall { case (_, e, c) => e == c },
      s"40 keys in 4096 buckets should not collide: $tEst")
  }

  test("sketches merge associatively across corpus shards") {
    val a = toks.filter(md5($"k").startsWith("0") || md5($"k") < "8")
    val b = toks.exceptAll(a)
    val merged = CountMin.merge(CountMin.sketch(a, $"k"), CountMin.sketch(b, $"k"))
      .counters.orderBy($"row", $"bucket").as[(Int, Int, Long)].collect().toSeq
    val whole = CountMin.sketch(toks, $"k")
      .counters.orderBy($"row", $"bucket").as[(Int, Int, Long)].collect().toSeq
    assert(merged == whole, "merge(shard sketches) must equal the whole-corpus sketch")
  }

  test("mismatched sketch shapes raise instead of silently underestimating") {
    val a = CountMin.sketch(toks, $"k", depth = 4, width = 256)
    val b = CountMin.sketch(toks, $"k", depth = 4, width = 512)
    val e = intercept[IllegalArgumentException] { CountMin.merge(a, b) }
    assert(e.getMessage.contains("4x256") && e.getMessage.contains("4x512"))
  }

  test("the sketch is bounded at depth x width rows regardless of corpus size") {
    val sk = CountMin.sketch(toks, $"k", depth = 4, width = 64).counters.collect()
    assert(sk.length <= 4 * 64, s"${sk.length} rows exceeds 4x64")
  }

  test("the build is one partial-aggregated shuffle; probing broadcasts the sketch") {
    val sk = CountMin.sketch(toks, $"k")
    val buildPlan = sk.counters.queryExecution.executedPlan.toString
    assert(buildPlan.contains("partial_count"),
      s"hot keys must collapse map-side:\n$buildPlan")
    val probePlan = CountMin.estimate(sk, Seq("the").toDF("k"), "k")
      .queryExecution.executedPlan.toString
    assert(probePlan.contains("BroadcastHashJoin"),
      s"the bounded sketch must broadcast to the probes:\n$probePlan")
  }
}
