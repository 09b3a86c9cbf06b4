package graft.sql

import graft.SparkSpecBase
import graft.functions.TextOps
import org.apache.spark.sql.functions._

class CharNgramsFSpec extends SparkSpecBase {
  import spark.implicits._

  test("identical to the HOF chain it replaced, on real corpus text") {
    GraftFunctions.register(spark)
    val docs = tbl("documents").select($"doc_id", $"text").limit(100)
      .select($"doc_id", TextOps.normalizeText($"text").as("__t"))
    val fused = docs.select($"doc_id", GraftFunctions.charNgrams($"__t", 3).as("g"))
    val hof = docs.select($"doc_id", TextOps.charNgrams($"__t", 3).as("g"))
    assert(fused.exceptAll(hof).isEmpty && hof.exceptAll(fused).isEmpty,
      "kernel must reproduce the HOF chain exactly")
    assert(fused.count() === 100)
  }

  test("multi-byte + astral codepoints count as single chars (substr parity)") {
    GraftFunctions.register(spark)
    // é (2 bytes), 你 (3 bytes), 😀 (4 bytes, astral) — Spark length/substr
    // count them as one char each; the kernel must slice identically
    val df = Seq((1L, "aé你😀b")).toDF("id", "t")
    val fused = df.select(GraftFunctions.charNgrams($"t", 2).as("g"))
      .head.getSeq[String](0)
    val hof = df.select(TextOps.charNgrams($"t", 2).as("g"))
      .head.getSeq[String](0)
    assert(fused == hof)
    assert(fused == Seq("aé", "é你", "你😀", "😀b"))
  }

  test("short strings give the empty array; null gives null") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "ab"), (2L, null.asInstanceOf[String])).toDF("id", "t")
    val got = df.select($"id", GraftFunctions.charNgrams($"t", 3).as("g"))
      .orderBy($"id").collect()
    assert(got(0).getSeq[String](1).isEmpty)
    assert(got(1).isNullAt(1))
  }

  test("the kernel stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val plan = tbl("documents")
      .select(GraftFunctions.charNgrams(TextOps.normalizeText($"text"), 3).as("g"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"),
      s"gram projection must be whole-stage codegen'd:\n$plan")
  }

  test("callable from raw SQL; n must be a literal") {
    GraftFunctions.register(spark)
    val s = spark.sql("SELECT graft_char_ngrams('abcd', 2) AS g")
      .head().getSeq[String](0)
    assert(s == Seq("ab", "bc", "cd"))
    // a non-foldable n must be rejected (column reference, not constant)
    val e = intercept[Exception](
      spark.sql("SELECT graft_char_ngrams('abcd', x) AS g FROM (VALUES (2)) t(x)")
        .collect())
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getCause != null && e.getCause.getMessage.toLowerCase.contains("literal"))
  }

  test("langid end-to-end rides the kernel: total, deterministic coverage") {
    // exact VALUES are the q36 oracle row's job (green at sf0.01 with the
    // kernel); here: every doc gets a prediction and reruns agree
    val a = graft.functions.LangId.fitPredict(
      tbl("documents"), "doc_id", "text", "lang")
    val b = graft.functions.LangId.fitPredict(
      tbl("documents").repartition(7), "doc_id", "text", "lang")
    assert(a.count() === tbl("documents").count())
    assert(a.filter($"predicted_lang".isNull).count() === 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "prediction must be partitioning-invariant")
  }
}
