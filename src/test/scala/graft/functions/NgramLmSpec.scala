package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpecBase {
  import spark.implicits._

  private def withToks(rows: Seq[(Long, String)]) =
    rows.toDF("id", "text")
      .select(col("id"), TextOps.tokens(col("text")).as("t"))

  // reference: "a b" ×2, "b c" ×1 bigrams; unigrams a:2 b:2 c:1 → V=3
  private lazy val model = NgramLm.fit(
    withToks(Seq((1L, "a b c"), (2L, "a b"))), col("t"))

  test("fit counts bigrams, unigrams, and vocabulary") {
    val bi = model.bigrams.as[(String, String, Long)].collect().toSet
    assert(bi == Set(("a", "b", 2L), ("b", "c", 1L)))
    val uni = model.unigrams.as[(String, Long)].collect().toMap
    assert(uni == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    assert(model.vocab == 3L)
  }

  test("scoreDocs matches the closed form (add-1 smoothing)") {
    val out = NgramLm.scoreDocs(withToks(Seq((10L, "a b c"))), "id", col("t"), model)
      .head()
    // bigrams: (a,b): ln((2+1)/(2+3)); (b,c): ln((1+1)/(2+3))
    val expected = (math.log(3.0 / 5.0) + math.log(2.0 / 5.0)) / 2.0
    assert(out.getLong(1) == 2L && out.getLong(2) == 0L)
    assert(math.abs(out.getDouble(5) - expected) < 1e-15)
  }

  test("fluent text outscores reordered and out-of-vocabulary probes") {
    // a reference with real bigram structure (repeated sentences) — the
    // regime the filter exists for; note the tiny-vocabulary caveat: the
    // OOV floor is 1/V regardless of alpha, so with V this small an
    // all-OOV doc can outscore a WORD-SALAD of known-frequent words
    // (c12=0 but large c1 denominators) — production vocabularies put
    // 1/V far below any in-domain conditional
    val ref = withToks((1L to 50L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog")))
    val m = NgramLm.fit(ref, col("t"))
    val probe = withToks(Seq(
      (1L, "the quick brown fox"),    // observed bigrams
      (2L, "fox the brown quick"),    // known words, unseen order
      (3L, "zxq wvu tsr qpo")))       // fully out-of-vocabulary
    val s = NgramLm.scoreDocs(probe, "id", col("t"), m)
      .select("id", "ll_mean").as[(Long, Double)].collect().toMap
    assert(s(1L) > s(2L), s"fluent ${s(1L)} must beat reordered ${s(2L)}")
    assert(s(1L) > s(3L), s"fluent ${s(1L)} must beat OOV ${s(3L)}")
  }

  test("score is invariant to input partitioning (exact decimal log sum)") {
    val docs = tbl("documents")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
    val m = NgramLm.fit(docs.limit(100), col("t"))
    val a = NgramLm.scoreDocs(docs, "doc_id", col("t"), m)
      .orderBy("doc_id").select("ll_mean").as[Double].collect().toSeq
    val b = NgramLm.scoreDocs(docs.repartition(17), "doc_id", col("t"), m)
      .orderBy("doc_id").select("ll_mean").as[Double].collect().toSeq
    assert(a == b)
  }

  test("bigram-less docs survive with zero evidence and null score") {
    val out = NgramLm.scoreDocs(withToks(Seq((1L, "solo"))), "id", col("t"), model)
      .head()
    assert(out.getLong(1) == 0L && out.isNullAt(5))
  }

  test("uncached fit scores identically; block liability is two bounded checkpoints") {
    val docs = withToks(Seq((10L, "a b c"), (11L, "c a")))
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val m = NgramLm.fit(withToks(Seq((1L, "a b c"), (2L, "a b"))), col("t"),
      cache = false)
    val got = NgramLm.scoreDocs(docs, "id", col("t"), m)
      .orderBy("id").collect().toSeq
    val want = NgramLm.scoreDocs(docs, "id", col("t"), model)
      .orderBy("id").collect().toSeq
    assert(got == want)
    // round 10: cache=false materializes the two vocabulary-sized count
    // tables as eager localCheckpoints (one corpus pass instead of one
    // per consumer); the only registered blocks are those two, and the
    // ContextCleaner reclaims them once the model frame is unreachable
    val added = spark.sparkContext.getPersistentRDDs.size - cachedBefore
    assert(added <= 2,
      s"cache=false fit must register at most its two checkpoint tables, got $added")
  }

  test("model save/load round-trips and scores identically with no refit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ngramlm").toString
    NgramLm.save(model, dir)
    val reloaded = NgramLm.load(spark, dir)
    assert(reloaded.vocab == model.vocab)
    val docs = withToks(Seq((10L, "a b c"), (11L, "b c a")))
    val got = NgramLm.scoreDocs(docs, "id", col("t"), reloaded)
      .orderBy("id").collect().toSeq
    val want = NgramLm.scoreDocs(docs, "id", col("t"), model)
      .orderBy("id").collect().toSeq
    assert(got == want)
  }
}
