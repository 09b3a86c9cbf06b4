package graft.operators

import graft.SparkSpecBase
import graft.functions.TextOps
import org.apache.spark.sql.functions._

class CorpusAuditSpec extends SparkSpecBase {
  import spark.implicits._

  private def matrix(rows: Seq[(String, String)], n: Int = 2) = {
    val df = rows.toDF("source", "text")
      .select(col("source"), TextOps.tokens(col("text")).as("__toks"))
    CorpusAudit.overlapMatrix(df, "source", TextOps.wordShingles(col("__toks"), n))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
  }

  test("counts distinct shared grams per ordered pair; zero-overlap pairs absent") {
    val m = matrix(Seq(
      ("srcA", "x y z w"),  // grams: {x y, y z, z w}
      ("srcB", "y z w q"),  // grams: {y z, z w, w q} — shares 2 with A
      ("srcC", "p q")))     // grams: {p q} — shares nothing
    assert(m.keySet === Set(("srcA", "srcB")))
    val (shared, na, nb, cont, jac) = m(("srcA", "srcB"))
    assert((shared, na, nb) === (2L, 3L, 3L))
    assert(cont === 2.0 / 3.0 && jac === 2.0 / 4.0)
  }

  test("within-source repeats don't inflate counts (distinct-collapsed)") {
    val m = matrix(Seq(
      ("srcA", "x y z"), ("srcA", "x y z"), ("srcA", "x y q"),
      ("srcB", "x y")))
    // A's distinct grams {x y, y z, x y(dup), x y, y q} -> {x y, y z, y q}
    val (shared, na, nb, cont, _) = m(("srcA", "srcB"))
    assert((shared, na, nb) === (1L, 3L, 1L))
    assert(cont === 1.0) // B fully contained in A
  }

  test("docs shorter than the shingle width contribute nothing") {
    val m = matrix(Seq(("srcA", "solo"), ("srcB", "solo x"), ("srcC", "solo x")))
    assert(m.keySet === Set(("srcB", "srcC"))) // srcA has no 2-grams at all
  }

  test("docDiff: all four statuses; unchanged filtered unless asked") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "fp")
    val b = Seq((1L, "x"), (2L, "Y2"), (4L, "w")).toDF("id", "fp")
    val delta = CorpusAudit.docDiff(a, b, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(delta === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    val full = CorpusAudit.docDiff(a, b, "id", "fp", keepUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(full(1L) === "unchanged" && full.size === 4)
  }
}
