package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpecBase {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, overlap: Int) =
    Chunking.chunkTokens(
      Seq((1L, text)).toDF("id", "text")
        .select(col("id"), TextOps.tokens(col("text")).as("t")),
      "id", col("t"), size, overlap)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "chunk_tokens")
      .as[(Int, String, Int)].collect().toSeq

  test("overlapping windows advance by chunkSize - overlap") {
    // 10 tokens, size 4, overlap 2 → starts 1,3,5,7 (last start ≤ 10-2=8)
    val got = chunksOf("t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", 4, 2)
    assert(got == Seq(
      (0, "t1 t2 t3 t4", 4),
      (1, "t3 t4 t5 t6", 4),
      (2, "t5 t6 t7 t8", 4),
      (3, "t7 t8 t9 t10", 4)))
  }

  test("trailing partial chunk is emitted once, never an overlap-only tail") {
    // 9 tokens, size 4, step 2: starts 1,3,5,7 → final chunk has 3 tokens
    val got = chunksOf("a b c d e f g h i", 4, 2)
    assert(got.last == (3, "g h i", 3))
    // 4 tokens = exactly one window: no redundant second chunk
    assert(chunksOf("a b c d", 4, 2) == Seq((0, "a b c d", 4)))
  }

  test("short docs yield a single short chunk") {
    assert(chunksOf("only two", 32, 8) == Seq((0, "only two", 2)))
  }

  test("every token is covered and consecutive chunks share exactly overlap") {
    val toks = (1 to 103).map(i => s"w$i")
    val got = chunksOf(toks.mkString(" "), 16, 4)
    val covered = got.flatMap(_._2.split(" ")).toSet
    assert(covered == toks.toSet)
    got.sliding(2).foreach {
      case Seq((_, a, _), (_, b, _)) =>
        assert(a.split(" ").takeRight(4).toSeq == b.split(" ").take(4).toSeq)
      case _ =>
    }
  }

  test("rejects overlap >= chunkSize") {
    intercept[IllegalArgumentException] {
      Chunking.chunkTokens(Seq((1L, Seq("a"))).toDF("id", "t"), "id", col("t"), 4, 4)
    }
  }
}
