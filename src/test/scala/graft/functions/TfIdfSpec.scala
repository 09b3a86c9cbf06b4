package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** TF-IDF distinctive-term extraction. */
class TfIdfSpec extends SparkSpecBase {
  import spark.implicits._

  private def toksOf(texts: Seq[(Long, String)]) =
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("__toks"))

  test("termStats counts tf, df, and corpus size exactly") {
    val docs = toksOf(Seq((1L, "a a b"), (2L, "a c")))
    val rows = TfIdf.termStats(docs, "doc_id", col("__toks"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(("a", 1L)) === ((2L, 2L, 2L))) // tf=2, df=2, n=2
    assert(rows(("b", 1L)) === ((1L, 1L, 2L)))
    assert(rows(("c", 2L)) === ((1L, 1L, 2L)))
  }

  test("ubiquitous terms (df = N) get idf 0 and never outrank rare terms") {
    val docs = toksOf(Seq(
      (1L, "the quantum the the"), (2L, "the cat"), (3L, "the dog")))
    val top = TfIdf.topTermsPerDoc(docs, "doc_id", col("__toks"), 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // "the" has tf=3 in doc 1 but df=3=N -> score 0; "quantum" wins
    assert(top(1L) === "quantum")
    assert(top(2L) === "cat")
    assert(top(3L) === "dog")
  }

  test("within equal rarity, higher tf ranks first; ties break on term") {
    val docs = toksOf(Seq((1L, "zz zz yy aa"), (2L, "filler")))
    val terms = TfIdf.topTermsPerDoc(docs, "doc_id", col("__toks"), 3)
      .filter(col("doc_id") === 1L).orderBy("rk")
      .collect().map(_.getString(2))
    assert(terms.toSeq === Seq("zz", "aa", "yy")) // tf=2 first, then term asc
  }

  test("k bounds the output per doc") {
    val docs = toksOf(Seq((1L, "a b c d e f g h"), (2L, "x")))
    val counts = TfIdf.topTermsPerDoc(docs, "doc_id", col("__toks"), 3)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(1L) === 3L)
    assert(counts(2L) === 1L)
  }
}
