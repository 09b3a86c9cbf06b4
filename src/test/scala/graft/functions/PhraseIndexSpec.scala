package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PhraseIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def idx(docs: (Long, String)*) = PhraseIndex.build(
    docs.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks")),
    "doc_id", col("toks"))

  test("phrase must be consecutive, not merely co-present") {
    val i = idx(1L -> "the quick brown fox", 2L -> "quick the brown fox")
    val hits = PhraseIndex.phraseQuery(i, "doc_id", Seq("the", "quick"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L), "doc 2 has both words but not the phrase")
  }

  test("overlapping occurrences each count as a match start") {
    val i = idx(1L -> "a a a a")
    val hits = PhraseIndex.phraseQuery(i, "doc_id", Seq("a", "a")).collect()
    assert(hits.head.getLong(1) == 3L)
  }

  test("single-term phrase degrades to term frequency") {
    val i = idx(1L -> "x y x")
    val hits = PhraseIndex.phraseQuery(i, "doc_id", Seq("x")).collect()
    assert(hits.head.getLong(1) == 2L)
  }

  test("absent phrase yields no rows; three-term phrase matches exactly") {
    val i = idx(1L -> "slow hash batch join", 2L -> "slow hash scan")
    assert(PhraseIndex.phraseQuery(i, "doc_id", Seq("batch", "join")).count() == 1)
    assert(PhraseIndex.phraseQuery(i, "doc_id", Seq("no", "such")).count() == 0)
    val three = PhraseIndex.phraseQuery(i, "doc_id", Seq("slow", "hash", "batch"))
      .collect()
    assert(three.length == 1 && three.head.getLong(0) == 1L)
  }

  test("plan: each leg filters its term before the join (pushdown)") {
    val docs = tbl("documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    val i = PhraseIndex.build(docs, "doc_id", col("toks"))
    val q = PhraseIndex.phraseQuery(i, "doc_id", Seq("slow", "hash"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("term#") && p.contains("= slow") || p.contains("slow"),
      s"term filter missing from plan:\n$p")
    assert(q.count() >= 0)
  }
}
