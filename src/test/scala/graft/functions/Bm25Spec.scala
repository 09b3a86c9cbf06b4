package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  private def withToks(rows: Seq[(Long, String)]) =
    rows.toDF("id", "text")
      .select(col("id"), TextOps.tokens(col("text")).as("t"))

  private val corpus = withToks(Seq(
    (1L, "spark spark spark engine"),   // tf(spark)=3, dl=4
    (2L, "spark engine engine fast"),   // tf(spark)=1, dl=4
    (3L, "nothing relevant here at"),   // no match,    dl=4
    (4L, "fast fast fast fast")))       // tf(fast)=4,  dl=4

  /** Reference BM25 on the tiny corpus — same formulation AND the same
    * association order as the operator (ln(idf_arg) · tf_factor). */
  private def ref(tf: Double, dfT: Double, dl: Double,
      n: Double = 4.0, avgdl: Double = 4.0): Double =
    math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0) *
      (tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl))))

  test("termScores matches the closed-form reference exactly") {
    val got = Bm25.termScores(corpus, "id", col("t"), Seq("spark", "fast"))
      .orderBy("id", "term")
      .select("id", "term", "score").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "spark", ref(3, 2, 4)),
      (2L, "fast", ref(1, 2, 4)),
      (2L, "spark", ref(1, 2, 4)),
      (4L, "fast", ref(4, 2, 4))))
  }

  test("more occurrences of a term rank higher at equal length") {
    val top = Bm25.topK(corpus, "id", col("t"), Seq("spark"), 2)
      .select("id").as[Long].collect().toSeq
    assert(top == Seq(1L, 2L))
  }

  test("rarer terms contribute more (idf ordering)") {
    val c = withToks(Seq(
      (1L, "common rare"), (2L, "common x"), (3L, "common y"), (4L, "common z")))
    val s = Bm25.termScores(c, "id", col("t"), Seq("common", "rare"))
      .filter($"id" === 1L)
      .select("term", "score").as[(String, Double)].collect().toMap
    assert(s("rare") > s("common"))
  }

  test("topK sums per-term contributions and breaks ties by id") {
    val top = Bm25.topK(corpus, "id", col("t"), Seq("spark", "fast"), 4)
      .select("id", "score").as[(Long, Double)].collect().toSeq
    // doc 2 matches both terms; its sum beats doc 2's single-term parts
    assert(top.map(_._1).toSet == Set(1L, 2L, 4L))
    val expected2 = ref(1, 2, 4) + ref(1, 2, 4)
    assert(math.abs(top.find(_._1 == 2L).get._2 - expected2) < 1e-12)
  }

  test("docs with no matching term are absent, not zero-scored") {
    val got = Bm25.termScores(corpus, "id", col("t"), Seq("spark"))
      .select("id").as[Long].collect().toSet
    assert(!got.contains(3L))
  }
}
