package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class CooccurrenceSpec extends SparkSpecBase {
  import spark.implicits._

  private def df(docs: Seq[String]) =
    docs.map(Tuple1(_)).toDF("text").select(split(col("text"), " ").as("toks"))

  test("weights are LCM/distance and pairs are ordered left-to-right") {
    // "a b c" window 4: (a,b,d1,12), (b,c,d1,12), (a,c,d2,6)
    val m = Cooccurrence.glove(df(Seq("a b c")), col("toks"), 4)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(m == Map(
      ("a", "b") -> (1L, 12L), ("b", "c") -> (1L, 12L), ("a", "c") -> (1L, 6L)))
  }

  test("window truncates at 4; repeated pairs accumulate") {
    // "x y x y": pairs x->y d1 (pos0-1), y->x d1, x->y d1 (pos2-3),
    // x->x d2, y->y d2, x->y d3
    val m = Cooccurrence.glove(df(Seq("x y x y")), col("toks"), 4)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(m(("x", "y")) == (3L, 12L + 12L + 4L))
    assert(m(("y", "x")) == (1L, 12L))
    assert(m(("x", "x")) == (1L, 6L))
    assert(m(("y", "y")) == (1L, 6L))
  }

  test("documents shorter than the window contribute only their pairs") {
    val one = Cooccurrence.glove(df(Seq("solo")), col("toks"), 4)
    assert(one.count() == 0)
    val two = Cooccurrence.glove(df(Seq("p q")), col("toks"), 4).collect()
    assert(two.length == 1 && two.head.getLong(3) == 12L)
  }

  test("pairs never cross document boundaries") {
    val joined = Cooccurrence.glove(df(Seq("a b", "c d")), col("toks"), 4)
    assert(joined.filter(col("w1") === "b" && col("w2") === "c").count() == 0)
  }

  test("plan: one partial-aggregated shuffle, no positional self-join") {
    val g = Cooccurrence.glove(df(Seq("a b c d e")), col("toks"), 4)
    val p = g.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"pair stream must not be a join:\n$p")
  }
}
