package graft.sql

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpecBase {
  import spark.implicits._

  private val K = 8

  // direct Horner evaluation — exercises a different arithmetic path than
  // the kernel's rolling update (where an off-by-one-mod bug would hide)
  private def direct(s: String, k: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    (0 to cps.length - k).map(i =>
      (0 until k).foldLeft(0L)((h, j) =>
        (h * RollingHashF.Base + cps(i + j)) % RollingHashF.Mod))
  }

  private def run(s: String, k: Int = K): Seq[Long] = {
    GraftFunctions.register(spark)
    Seq(s).toDF("t")
      .select(GraftFunctions.rollingHash($"t", k).as("h"))
      .as[Seq[Long]].head()
  }

  test("rolling update equals direct Horner evaluation on real text") {
    val texts = tbl("documents").select($"text").limit(10).as[String].collect()
    texts.foreach { t =>
      assert(run(t) == direct(t, K), s"rolling != direct on: ${t.take(40)}…")
    }
  }

  test("hashes are defined over code points, not UTF-16 units") {
    val s = "ab🙂cd🙂ef" // 🙂 is non-BMP: 2 UTF-16 units, 1 code point
    val got = run(s, 3)
    assert(got == direct(s, 3))
    assert(got.length == s.codePointCount(0, s.length) - 2)
  }

  test("output length is max(0, L - k + 1); short and empty inputs are empty") {
    assert(run("", K).isEmpty)
    assert(run("short", K).isEmpty)
    assert(run("exactly8", K).length == 1)
    assert(run("exactly8!", K).length == 2)
  }

  test("all hashes are in [0, M) and equal grams hash equally") {
    val h = run("abcabcabcabc", 3)
    assert(h.forall(x => x >= 0 && x < RollingHashF.Mod))
    assert(h(0) == h(3) && h(1) == h(4), "period-3 text: equal grams, equal hashes")
    assert(h(0) != h(1), "different grams should differ (no degenerate hash)")
  }

  test("a non-literal k fails analysis cleanly, not with an unresolved eval") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq(("abcdefgh", 3)).toDF("t", "k")
        .selectExpr("graft_rolling_hash(t, k)").collect()
    }
    // kExpr is a true child now: the analyzer reports a type-check
    // failure naming the function, never an unresolved-expression throw
    assert(e.getMessage.contains("graft_rolling_hash"), e.getMessage)
    assert(!e.getMessage.contains("Unresolved"), e.getMessage)
  }

  test("the kernel stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // a real scan input — a literal local relation would constant-fold
    // the whole projection at plan time and show no codegen at all
    val plan = tbl("documents")
      .select(GraftFunctions.rollingHash($"text", K).as("h"))
      .queryExecution.executedPlan.toString
    // whole-stage codegen prints as the `*(n)` stage prefix in this string
    assert(plan.contains("*(1) Project [graft_rolling_hash"),
      s"rolling hash must stay inside the codegen'd Project:\n$plan")
  }
}
