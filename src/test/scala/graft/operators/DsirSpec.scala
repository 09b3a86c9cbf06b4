package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** DSIR importance resampling (Xie 2023): hashed-n-gram feature space,
  * bucket-count models, integer evidence, deterministic Gumbel-top-k. */
class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  private def toksOf(texts: Seq[(Long, String)]) =
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("__toks"))

  test("featureBuckets emits unigrams + bigrams, all inside the bucket space") {
    val df = toksOf(Seq((1L, "a b c"), (2L, "solo")))
      .select(col("doc_id"),
        Dsir.featureBuckets(col("__toks"), 8192).as("f"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L).size === 5) // 3 unigrams + 2 bigrams
    assert(rows(2L).size === 1) // 1 unigram, no bigram
    assert(rows.values.flatten.forall(b => b >= 0 && b < 8192))
  }

  test("bigram buckets key on the joined string, not the parts") {
    // "a b" as one doc's bigram must hash like the unigram "a b" never can
    // (tokens are whitespace-split) but MUST equal another doc's same bigram
    val df = toksOf(Seq((1L, "x y"), (2L, "x y z")))
      .select(col("doc_id"), Dsir.featureBuckets(col("__toks"), 1 << 20).as("f"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // doc1 bigram (x,y) == doc2 first bigram (x,y)
    assert(rows(1L)(2) === rows(2L)(3))
  }

  test("fit counts every feature occurrence; model is bounded by buckets") {
    val m = Dsir.fit(toksOf(Seq((1L, "a a b"), (2L, "a"))), col("__toks"), 64)
    // 3 + 1 unigrams, 2 + 0 bigrams
    assert(m.total === 6L)
    assert(m.counts.count() <= 64)
    assert(m.counts.agg(sum("c")).head.getLong(0) === 6L)
  }

  test("scoreDocs evidence is integer-exact on a collision-free fixture") {
    val B = 1 << 20
    val target = Dsir.fit(toksOf(Seq((10L, "the cat sat"))), col("__toks"), B)
    val raw = Dsir.fit(toksOf(Seq((20L, "xq zz the"))), col("__toks"), B)
    val docs = toksOf(Seq((1L, "the cat"), (2L, "qqq")))
    val ev = Dsir.scoreDocs(docs, "doc_id", col("__toks"), target, raw)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: feats = {the, cat, "the cat"} — ALL in target (unigrams the,
    // cat + the bigram); raw matches only the(1)
    assert(ev(1L) === ((3L, 0L, 3L, 1L)))
    // doc 2: one unigram, unseen anywhere
    assert(ev(2L) === ((1L, 1L, 0L, 0L)))
  }

  test("target-like docs outweigh off-distribution docs") {
    val B = 8192
    val target = Dsir.fit(
      toksOf(Seq((10L, "good clean prose about science and history"))),
      col("__toks"), B)
    val raw = Dsir.fit(
      toksOf(Seq((20L, "zz xx vv spam spam zz xx"), (21L, "good clean prose"))),
      col("__toks"), B)
    val docs = toksOf(Seq((1L, "clean prose about science"), (2L, "zz xx spam")))
    val w = Dsir.scoreDocs(docs, "doc_id", col("__toks"), target, raw)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(w(1L) > w(2L), s"target-like doc should outweigh spam: $w")
  }

  test("gumbelTopK is deterministic, k-bounded, and partitioning-invariant") {
    val docs = tbl("documents")
      .select(col("doc_id"), col("source"), split(trim(col("text")), "\\s+").as("__toks"))
    val tgt = Dsir.fit(docs.filter(col("source") === "src0"), col("__toks"))
    val raw = Dsir.fit(docs.filter(col("source") =!= "src0"), col("__toks"))
    val scored = Dsir.scoreDocs(docs.filter(col("source") =!= "src0"),
      "doc_id", col("__toks"), tgt, raw)
    val a = Dsir.gumbelTopK(scored, "doc_id", 20).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val b = Dsir.gumbelTopK(scored.repartition(7), "doc_id", 20).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(a.length === 20)
    assert(a.toSeq === b.toSeq)
  }

  test("gumbel selection is weight-tilted: resampling prefers high-logw docs") {
    // 40 equal-length docs (equal feature counts — with B >> corpus the
    // smoothing floor charges every feature, so unequal lengths would
    // confound the tilt): 20 target-like, 20 junk; models fit on held-out
    // samples of each style. Select 10 — the softmax tilt must pick
    // (almost) only target-like docs, with Gumbel noise breaking the ties
    // among their identical weights.
    val B = 8192
    val target = Dsir.fit(toksOf(Seq((100L, "alpha beta gamma delta epsilon"))),
      col("__toks"), B)
    val rawRef = Dsir.fit(toksOf(Seq((200L, "zz xx vv ww uu"))), col("__toks"), B)
    val good = (0L until 20L).map(i => (i, "alpha beta gamma delta epsilon"))
    val junk = (20L until 40L).map(i => (i, "zz xx vv ww uu"))
    val docs = toksOf(good ++ junk)
    val scored = Dsir.scoreDocs(docs, "doc_id", col("__toks"), target, rawRef)
    val picked = Dsir.gumbelTopK(scored, "doc_id", 10).select("doc_id")
      .collect().map(_.getLong(0))
    assert(picked.count(_ < 20L) >= 8, s"expected mostly good docs: ${picked.toSeq}")
  }

  test("save/load round-trips the model and preserves scores") {
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    val fitDocs = toksOf(Seq((1L, "a b c a"), (2L, "b c d")))
    val m = Dsir.fit(fitDocs, col("__toks"), 512)
    Dsir.save(m, s"$dir/m")
    val m2 = Dsir.load(spark, s"$dir/m")
    assert(m2.total === m.total && m2.buckets === m.buckets)
    val docs = toksOf(Seq((5L, "a b x")))
    val s1 = Dsir.scoreDocs(docs, "doc_id", col("__toks"), m, m).head
    val s2 = Dsir.scoreDocs(docs, "doc_id", col("__toks"), m2, m2).head
    assert(s1 === s2)
  }

  test("fitRawAndScore == fit(cache=false) + scoreDocs, model and rows") {
    // the round-15 single-feature-pass path must be VALUE-identical to the
    // two-pass composition it replaces (raw model counts/total AND every
    // scored column, logw included), on real fixture text
    val docs = tbl("documents")
      .select(col("doc_id"), col("source"), split(trim(col("text")), "\\s+").as("__toks"))
    val tgt = Dsir.fit(docs.filter(col("source") === "src0"), col("__toks"))
    val nonT = docs.filter(col("source") =!= "src0")
    val rawRef = Dsir.fit(nonT, col("__toks"), cache = false)
    val ref = Dsir.scoreDocs(nonT, "doc_id", col("__toks"), tgt, rawRef)
      .orderBy("doc_id").collect().toSeq
    val (raw, scored) = Dsir.fitRawAndScore(nonT, "doc_id", col("__toks"), tgt)
    assert(raw.total === rawRef.total)
    assert(raw.buckets === rawRef.buckets)
    val cnt = raw.counts.orderBy("bucket").collect().toSeq
    val cntRef = rawRef.counts.orderBy("bucket").collect().toSeq
    assert(cnt === cntRef)
    assert(scored.orderBy("doc_id").collect().toSeq === ref)
  }

  test("scoreDocs keeps zero-token-array docs at 0 evidence") {
    // a doc whose token array is empty (filtered upstream) still comes out
    val docs = Seq((1L, Seq.empty[String]), (2L, Seq("a"))).toDF("doc_id", "__toks")
    val m = Dsir.fit(toksOf(Seq((9L, "a b"))), col("__toks"), 64)
    val ev = Dsir.scoreDocs(docs, "doc_id", col("__toks"), m, m)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ev(1L) === 0L)
    assert(ev(2L) === 1L)
  }
}
