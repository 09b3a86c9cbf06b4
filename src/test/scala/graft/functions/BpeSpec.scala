package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  private val E = Bpe.Eow

  test("trainer reproduces the hand-computed merges on a known corpus") {
    // corpus: "aa ab aa" → words aa(f=2), ab(f=1); symbol pairs:
    //   (a,a): 2   (a,E): 3 [aa twice + ab once... aa ends a-E, ab ends b-E]
    // precise counts: aa = [a,a,E] ×2 → (a,a):2, (a,E):2; ab = [a,b,E] ×1
    // → (a,b):1, (b,E):1. Best = (a,E) tie (a,a)? (a,a):2 vs (a,E):2 —
    // lexicographic tiebreak: (a,E) has second element \u0001 < "a", so
    // (a,Eow) wins the tie.
    val df = Seq((1L, "aa ab aa")).toDF("id", "text")
    val m = Bpe.fit(df, col("text"), numMerges = 2)
    assert(m.merges.head == (("a", E)),
      s"first merge should be (a, Eow) by tie-break, got ${m.merges.head}")
    // after merging (a,E): aa = [a, aE], ab = [a, b, E] → pairs
    // (a,aE):2, (a,b):1, (b,E):1 → second merge (a, aE)
    assert(m.merges(1) == (("a", "a" + E)), s"second merge: ${m.merges(1)}")
  }

  test("frequent whole words become single tokens; rare words stay subword") {
    val corpus = Seq.fill(50)("the quick fox") ++ Seq("thequickest zebra")
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    // 11 merges fully collapse the three freq-50 words (L-1 pair merges
    // per word, all count-50, chosen before any freq-1 pair); the 12th
    // lands on a rare-word pair — so rare words stay subword by budget
    val m = Bpe.fit(df, col("text"), numMerges = 12)
    val the = Bpe.encodeWord("the", m.ranks)
    assert(the == Seq("the" + E), s"frequent word must collapse to one token: $the")
    val zebra = Bpe.encodeWord("zebra", m.ranks)
    assert(zebra.length > 1, s"rare word must remain subword pieces: $zebra")
    // subword reuse: the unseen word "thequickest" starts with learned pieces
    val unseen = Bpe.encodeWord("quickfox", m.ranks)
    assert(unseen.length < "quickfox".length + 1,
      s"unseen compound must reuse learned merges: $unseen")
  }

  test("encode→detokenize is lossless on real documents") {
    val docs = tbl("documents").select($"doc_id", $"text")
    val m = Bpe.fit(docs, col("text"), numMerges = 200)
    val enc = Bpe.encode(docs, "doc_id", "text", m)
    val back = enc.select($"doc_id", Bpe.detokenize($"tokens").as("detok"))
    val orig = docs.select($"doc_id",
      trim(regexp_replace($"text", "\\s+", " ")).as("norm"))
    val diff = back.join(orig, "doc_id")
      .filter($"detok" =!= $"norm").count()
    assert(diff == 0, s"$diff documents failed lossless round-trip")
  }

  test("encode is partitioning-invariant and zero-shuffle") {
    val docs = tbl("documents").select($"doc_id", $"text").limit(100)
    val m = Bpe.fit(docs, col("text"), numMerges = 50)
    val a = Bpe.encode(docs, "doc_id", "text", m)
      .orderBy($"doc_id").as[(Long, Seq[String])].collect().toSeq
    val b = Bpe.encode(docs.repartition(7), "doc_id", "text", m)
      .orderBy($"doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(a == b)
    // plan assert on the un-limited input: the limit above inserts its own
    // GlobalLimit exchange, which is the test's doing, not encode's
    val plan = Bpe.encode(tbl("documents").select($"doc_id", $"text"),
        "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }

  test("model save/load round-trips and encodes identically with no refit") {
    val docs = tbl("documents").select($"doc_id", $"text").limit(100)
    val m = Bpe.fit(docs, col("text"), numMerges = 50)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Bpe.save(spark, m, dir)
    val reloaded = Bpe.load(spark, dir)
    assert(reloaded.merges == m.merges, "merge table drifted through parquet")
    val a = Bpe.encode(docs, "doc_id", "text", m)
      .orderBy($"doc_id").as[(Long, Seq[String])].collect().toSeq
    val b = Bpe.encode(docs, "doc_id", "text", reloaded)
      .orderBy($"doc_id").as[(Long, Seq[String])].collect().toSeq
    assert(a == b)
  }

  test("fit is deterministic and respects the merge budget") {
    val docs = tbl("documents").select($"doc_id", $"text")
    val m1 = Bpe.fit(docs, col("text"), numMerges = 80)
    val m2 = Bpe.fit(docs.repartition(13), col("text"), numMerges = 80)
    assert(m1.merges == m2.merges, "fit must not depend on partitioning")
    assert(m1.merges.length <= 80)
    assert(m1.merges.distinct.length == m1.merges.length, "duplicate merges")
  }

  test("tokenize-and-pack: BPE token counts drive shard packing end to end") {
    // the last pre-training mile: real tokenizer counts -> token-budget
    // shards (not char or whitespace proxies)
    val docs = tbl("documents").select($"doc_id", $"text")
    val m = Bpe.fit(docs, col("text"), numMerges = 100)
    val counted = Bpe.encode(docs, "doc_id", "text", m)
      .select($"doc_id", size($"tokens").as("n_tokens"))
    val budget = 500L
    val packed = graft.operators.ShardPack.assignShards(
      counted, "doc_id", col("n_tokens"), budget)
    val shards = packed.groupBy($"shard_id")
      .agg(sum($"n_tokens").as("tok"), min($"doc_id").as("lo"), max($"doc_id").as("hi"))
      .orderBy($"shard_id")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(shards.nonEmpty && shards.map(_._1) == shards.indices.map(identity),
      s"shard ids must be dense from 0: ${shards.map(_._1)}")
    // a non-last shard's span runs from its first row's start (within
    // maxRow past the k*budget boundary, carried overflow) to the first
    // start at or past the next boundary: budget-maxRow < tok < budget+maxRow
    val maxRow = packed.agg(max($"n_tokens")).as[Int].head()
    shards.dropRight(1).foreach { case (sid, tok, _, _) =>
      assert(tok > budget - maxRow && tok < budget + maxRow,
        s"shard $sid packed $tok tokens against budget $budget (maxRow $maxRow)")
    }
    // packing respects doc order: shard ranges don't interleave
    shards.sliding(2).foreach {
      case Seq((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("more merges never increase the token count of any document") {
    val docs = tbl("documents").select($"doc_id", $"text").limit(50)
    val small = Bpe.fit(docs, col("text"), numMerges = 20)
    val big = Bpe.fit(docs, col("text"), numMerges = 200)
    val nSmall = Bpe.encode(docs, "doc_id", "text", small)
      .select($"doc_id", size($"tokens").as("n")).orderBy($"doc_id")
      .as[(Long, Int)].collect()
    val nBig = Bpe.encode(docs, "doc_id", "text", big)
      .select($"doc_id", size($"tokens").as("n")).orderBy($"doc_id")
      .as[(Long, Int)].collect()
    nSmall.zip(nBig).foreach { case ((id, s), (_, b)) =>
      assert(b <= s, s"doc $id: $b tokens with 200 merges vs $s with 20")
    }
  }
}
