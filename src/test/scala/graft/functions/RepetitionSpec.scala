package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RepetitionSpec extends SparkSpecBase {
  import spark.implicits._

  private def withToks(rows: Seq[(Long, String)]) =
    rows.toDF("id", "text")
      .select(col("id"), TextOps.tokens(col("text")).as("__toks"))

  test("topNgramStats finds the dominant bigram and its coverage") {
    // "ha ha" occurs 3× in 7 tokens → frac = 3*2/7
    val df = withToks(Seq((1L, "ha ha x ha ha ha end")))
    val r = Repetition.topNgramStats(df, "id", col("__toks"), 2).head()
    assert(r.getLong(1) == 7L)
    assert(r.getString(3) == "ha ha")
    assert(r.getLong(2) == 3L)
    assert(r.getDouble(4) == 3.0 * 2 / 7)
  }

  test("ties break deterministically to the largest gram") {
    // every bigram occurs exactly once → the max-struct winner is the
    // lexicographically largest gram
    val df = withToks(Seq((1L, "a b c d")))
    val r = Repetition.topNgramStats(df, "id", col("__toks"), 2).head()
    assert(r.getLong(2) == 1L)
    assert(r.getString(3) == "c d")
  }

  test("docs shorter than n report zero repetition, not a dropped row") {
    val df = withToks(Seq((1L, "single"), (2L, "a a a")))
    val out = Repetition.topNgramStats(df, "id", col("__toks"), 2)
      .orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(2) == 0L && out(0).isNullAt(3) && out(0).getDouble(4) == 0.0)
    assert(out(1).getString(3) == "a a" && out(1).getLong(2) == 2L)
  }

  test("duplicateLineFraction over a line array column") {
    val df = Seq(
      (1L, Seq("x", "y", "x", "x")), // 2 repeats of 4 lines
      (2L, Seq("x", "y")),
      (3L, Seq.empty[String])
    ).toDF("id", "lines")
    val out = df.select(col("id"),
        Repetition.duplicateLineFraction(col("lines")).as("f"))
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 0.5), (2L, 0.0), (3L, 0.0)))
  }
}
