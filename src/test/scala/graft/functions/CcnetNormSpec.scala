package graft.functions

import graft.SparkSpecBase
import graft.dedup.TextDedup
import org.apache.spark.sql.functions._

class CcnetNormSpec extends SparkSpecBase {
  import spark.implicits._

  private def norm(s: String): String = {
    graft.sql.GraftFunctions.register(spark)
    Seq(s).toDF("t").select(TextOps.ccnetNormalize($"t").as("n"))
      .as[String].head()
  }

  test("folds case, digits, accents, and whitespace") {
    // explicit escapes: \u00e9 precomposed é, \u0301 combining acute
    assert(norm("  The PRICE was 1984  dollars ") == "the price was 0000 dollars")
    assert(norm("caf\u00e9") == "cafe", "precomposed accent stripped")
    assert(norm("cafe\u0301") == "cafe", "decomposed accent stripped")
    assert(norm("na\u00efve") == "naive", "diaeresis stripped")
  }

  test("composed and decomposed variants share one fingerprint; distinct content does not") {
    graft.sql.GraftFunctions.register(spark)
    val df = Seq(
      (1L, "Caf\u00e9 society 42"),
      (2L, "  cafe\u0301 SOCIETY  99 "),
      (3L, "cafe society x")
    ).toDF("id", "t").select($"id", TextOps.ccnetFingerprint($"t").as("fp"))
    val fps = df.orderBy($"id").as[(Long, String)].collect().map(_._2)
    assert(fps(0) == fps(1), "case/accent/digit/space variants collapse")
    assert(fps(0) != fps(2), "different words stay distinct")
  }

  test("characters with no decomposition survive accent stripping (ø, ł, ß)") {
    assert(norm("br\u00f8d s\u0142owo stra\u00dfe") == "br\u00f8d s\u0142owo stra\u00dfe")
  }

  test("NFD (not NFKD): compatibility forms are preserved") {
    assert(norm("\ufb01nal") == "\ufb01nal", "fi ligature must NOT fold under NFD")
  }

  test("agrees with DuckDB's strip_accents chain on the oracle's own fixtures") {
    // the exact strings q118 injects, both composed and decomposed — the
    // Scala-side statement of the cross-engine convergence the oracle
    // checks end-to-end: strip_accents(lower(x)) ≡ Mn-strip(NFD(lower(x)))
    assert(norm("X price 1984 cafe\u0301") == "x price 0000 cafe")
    assert(norm("  X PRICE  2042 CAF\u00c9") == "x price 0000 cafe")
  }

  test("normalized dedup collapses at least as much as exact dedup") {
    val docs = tbl("documents").select($"doc_id", $"text")
    val exact = TextDedup.exactDupGroups(docs, "doc_id", "text").count()
    val normed = TextDedup.exactDupGroupsBy(docs, "doc_id",
      TextOps.ccnetFingerprint($"text")).count()
    assert(normed <= exact, "normalization can only merge groups, never split")
  }

  test("the normalization chain stays inside whole-stage codegen") {
    graft.sql.GraftFunctions.register(spark)
    val plan = tbl("documents")
      .select(TextOps.ccnetFingerprint($"text").as("fp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"fingerprint projection must be codegen'd:\n$plan")
  }
}
