package graft.operators

import graft.SparkSpecBase
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Epoch-aware shuffle+pack composition (q103): every epoch is a fresh
  * seeded permutation of the SAME token stream, re-chunked — layouts must
  * differ across epochs while conserving every document's tokens exactly.
  */
class EpochPackSpec extends SparkSpecBase {
  import spark.implicits._

  private def packed(epoch: String) = {
    val docs = tbl("documents")
      .select($"doc_id", size(TextOps.tokens($"text")).as("n_tokens"))
    ExamplePack.packExamples(
      docs.withColumn("k", CorpusShuffle.shuffleKey(epoch, $"doc_id")),
      "doc_id", $"n_tokens", 512L, "k", tieBreak = Seq($"doc_id"))
  }

  test("token conservation: every epoch packs every document's tokens exactly once") {
    val expected = tbl("documents")
      .select($"doc_id", size(TextOps.tokens($"text")).cast("long").as("n"))
      .filter($"n" > 0).as[(Long, Long)].collect().toMap
    Seq("epoch1", "epoch2").foreach { ep =>
      val got = packed(ep).groupBy($"doc_id").agg(sum($"len").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"$ep must conserve the token multiset per doc")
    }
  }

  test("different epochs produce different example layouts") {
    val a = packed("epoch1").orderBy($"doc_id", $"example_id").collect().toSeq
    val b = packed("epoch2").orderBy($"doc_id", $"example_id").collect().toSeq
    assert(a != b, "two seeds must not give the same layout")
    // and re-running the SAME epoch is bit-stable
    val a2 = packed("epoch1").orderBy($"doc_id", $"example_id").collect().toSeq
    assert(a == a2, "same seed must reproduce the same layout")
  }

  test("every example except the stream's last is exactly full") {
    Seq("epoch1", "epoch2").foreach { ep =>
      val sizes = packed(ep).groupBy($"example_id").agg(sum($"len").as("n"))
        .orderBy($"example_id").as[(Int, Long)].collect()
      val last = sizes.map(_._1).max
      sizes.foreach { case (eid, n) =>
        if (eid != last) assert(n == 512L, s"$ep example $eid has $n tokens")
        else assert(n <= 512L)
      }
    }
  }

  test("within an example, spans are contiguous and non-overlapping") {
    val spans = packed("epoch1")
      .select($"example_id", $"off_in_example", $"len").as[(Int, Int, Int)]
      .collect().groupBy(_._1)
    spans.foreach { case (eid, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.head._2 == 0, s"example $eid must start at offset 0")
      sorted.sliding(2).foreach {
        case Array((_, o1, l1), (_, o2, _)) =>
          assert(o1 + l1 == o2, s"example $eid has a gap/overlap at $o2")
        case _ => ()
      }
    }
  }
}
