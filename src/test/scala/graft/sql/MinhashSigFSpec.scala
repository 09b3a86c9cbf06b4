package graft.sql

import graft.SparkSpecBase
import graft.dedup.TextDedup
import graft.functions.TextOps
import org.apache.spark.sql.functions._

class MinhashSigFSpec extends SparkSpecBase {
  import spark.implicits._

  /** The HOF chain MinhashSigF replaced — kept here as the parity oracle:
    * one base hash per shingle (md5 prefix), k array_min(transform)s. */
  private def hofSigs(shingles: org.apache.spark.sql.Column, k: Int) = {
    val coef = TextDedup.minhashCoefficients(k)
    val h = transform(shingles, x =>
      conv(substring(md5(x), 1, 8), 16, 10).cast("long"))
    coef.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(h, x => (x * a + b) % TextDedup.MinhashPrime)).as(s"sig_$i")
    }
  }

  test("bit-identical to the HOF chain it replaced, on real corpus text") {
    val docs = tbl("documents").select($"doc_id", $"text").limit(50)
      .withColumn("__toks", split(trim($"text"), "\\s+"))
      .filter(size($"__toks") >= 3)
    val sh = TextOps.wordShingles($"__toks", 3)
    val fused = TextDedup.minhashSignatures(docs, "doc_id", sh, 16)
    val hof = docs.select(($"doc_id" +: hofSigs(sh, 16)): _*)
    assert(fused.exceptAll(hof).isEmpty && hof.exceptAll(fused).isEmpty,
      "fused kernel must reproduce the HOF chain bit-for-bit")
    assert(fused.count() > 0)
  }

  test("empty shingle array yields k NULL sigs (array_min-of-empty parity)") {
    val df = Seq((1L, Seq.empty[String]), (2L, Seq("a b c"))).toDF("id", "sh")
    val got = TextDedup.minhashSignatures(df, "id", $"sh", 4)
      .orderBy($"id").collect()
    assert((0 until 4).forall(i => got(0).isNullAt(i + 1)),
      "shingle-less doc must come back all-null, not hashed")
    assert((0 until 4).forall(i => !got(1).isNullAt(i + 1)))
  }

  test("null elements are skipped, null input is null (array_min semantics)") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Seq[String](null, "x")),   // null element skipped, "x" hashed
      (2L, Seq[String]("x")),          // reference for row 1
      (3L, null)                       // null array → null result
    ).toDF("id", "sh")
    val got = df.select($"id", GraftFunctions.minhashSig($"sh", 2).as("s"))
      .orderBy($"id").collect()
    assert(got(0).getSeq[Long](1) == got(1).getSeq[Long](1),
      "a null element must not contribute to any min")
    assert(got(2).isNullAt(1), "null input array → null output")
  }

  test("duplicate shingles do not change any signature (min over a set)") {
    val a = Seq((1L, Seq("p", "q"))).toDF("id", "sh")
    val b = Seq((1L, Seq("p", "q", "p", "q", "q"))).toDF("id", "sh")
    val sa = TextDedup.minhashSignatures(a, "id", $"sh", 8).collect()(0)
    val sb = TextDedup.minhashSignatures(b, "id", $"sh", 8).collect()(0)
    assert(sa == sb)
  }

  test("the kernel stays inside whole-stage codegen (no HOF fallback)") {
    val docs = tbl("documents")
      .withColumn("__toks", split(trim($"text"), "\\s+"))
      .filter(size($"__toks") >= 3)
    val plan = TextDedup.minhashSignatures(
        docs, "doc_id", TextOps.wordShingles($"__toks", 3), 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"),
      s"signature projection must be whole-stage codegen'd:\n$plan")
  }

  test("callable from raw SQL; k must be a literal") {
    GraftFunctions.register(spark)
    val s = spark.sql("SELECT graft_minhash_sig(array('a', 'b'), 3) AS s")
      .head().getSeq[Long](0)
    assert(s.length == 3 && s.forall(v => v >= 0 && v < TextDedup.MinhashPrime))
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array('a'), CAST(rand() * 4 AS INT))")
        .collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }
}
