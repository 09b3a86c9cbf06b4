package graft.sql

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class UnicodeNormFSpec extends SparkSpecBase {
  import spark.implicits._

  // explicit escapes throughout — composed and decomposed forms are
  // visually identical, so literal non-ASCII here would hide which one
  // the source file actually contains
  private val Composed = "café"        // precomposed é
  private val Decomposed = "café"     // e + U+0301 combining acute

  private def run(s: String, form: String = "NFC"): String = {
    GraftFunctions.register(spark)
    Seq(s).toDF("t")
      .select(GraftFunctions.unicodeNorm($"t", form).as("n"))
      .as[String].head()
  }

  test("NFC composes decomposed sequences; equal text dedups to one form") {
    assert(run(Decomposed) == Composed)
    assert(run(Composed) == Composed, "already-NFC text is a fixed point")
  }

  test("NFC preserves compatibility characters; NFKC folds them") {
    val ligature = "ﬁnal"         // U+FB01 fi ligature + "nal"
    assert(run(ligature, "NFC") == ligature, "NFC must NOT fold the ligature")
    assert(run(ligature, "NFKC") == "final", "NFKC folds the ligature to fi")
    val fullwidth = "Ｈｉ"     // fullwidth Hi
    assert(run(fullwidth, "NFKC") == "Hi")
  }

  test("NFD decomposes what NFC composes (round trip)") {
    val composed = "naïve"             // precomposed ï
    val decomposed = "naïve"          // i + U+0308 combining diaeresis
    assert(run(composed, "NFD") == decomposed)
    assert(run(decomposed, "NFC") == composed)
  }

  test("matches java.text.Normalizer on real corpus text, all four forms") {
    val texts = tbl("documents").select($"text").limit(10).as[String].collect()
    for (t <- texts; f <- UnicodeNormF.Forms) {
      val expect = java.text.Normalizer.normalize(
        t, java.text.Normalizer.Form.valueOf(f))
      assert(run(t, f) == expect, s"form $f mismatch on: ${t.take(40)}…")
    }
  }

  test("null text yields null; empty text yields empty") {
    GraftFunctions.register(spark)
    val got = Seq[(Integer, String)]((1, null), (2, "")).toDF("id", "t")
      .select(GraftFunctions.unicodeNorm($"t").as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(None, Some("")))
  }

  test("an invalid form fails analysis with the function name, not at runtime") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq("x").toDF("t").selectExpr("graft_unicode_norm(t, 'NFX')").collect()
    }
    assert(e.getMessage.contains("graft_unicode_norm"), e.getMessage)
    assert(e.getMessage.contains("NFX"), e.getMessage)
  }

  test("a non-literal form fails analysis cleanly") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq(("x", "NFC")).toDF("t", "f")
        .selectExpr("graft_unicode_norm(t, f)").collect()
    }
    assert(e.getMessage.contains("graft_unicode_norm"), e.getMessage)
  }

  test("the kernel stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val plan = tbl("documents")
      .select(GraftFunctions.unicodeNorm($"text").as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_unicode_norm"),
      s"unicode norm must stay inside the codegen'd Project:\n$plan")
  }

  test("normalization before hashing makes composed/decomposed dedup-equal") {
    // the corpus motivation: without the norm, exact dedup misses the pair
    GraftFunctions.register(spark)
    val df = Seq((1L, s"$Composed society"), (2L, s"$Decomposed society"))
      .toDF("doc_id", "text")
    val rawKeys = df.select(xxhash64($"text")).distinct().count()
    val normKeys = df
      .select(xxhash64(GraftFunctions.unicodeNorm($"text"))).distinct().count()
    assert(rawKeys == 2L, "un-normalized forms hash apart")
    assert(normKeys == 1L, "normalized forms hash together")
  }
}
