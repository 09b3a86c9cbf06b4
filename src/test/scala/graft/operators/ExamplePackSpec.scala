package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class ExamplePackSpec extends SparkSpecBase {
  import spark.implicits._

  private val S = 100L

  private def pack(rows: (Long, Int)*) =
    ExamplePack.packExamples(rows.toSeq.toDF("id", "n"), "id", col("n"), S, "id")
      .as[(Long, Int, Int, Int, Int)].collect().toSeq
      .sortBy(t => (t._1, t._2))

  test("every example except the stream's last is exactly full") {
    val spans = pack((1L, 30), (2L, 250), (3L, 40), (4L, 85), (5L, 7))
    val total = 30 + 250 + 40 + 85 + 7
    val byExample = spans.groupBy(_._2).view.mapValues(_.map(_._5).sum)
    val lastEx = (total - 1) / S
    byExample.foreach { case (ex, tok) =>
      if (ex < lastEx) assert(tok == S, s"example $ex holds $tok of $S tokens")
      else assert(tok == total - lastEx * S, s"last example wrong: $tok")
    }
  }

  test("per-document spans tile the document exactly, in order") {
    val docs = Seq((1L, 30), (2L, 250), (3L, 40))
    val spans = pack(docs: _*)
    docs.foreach { case (id, n) =>
      val mine = spans.filter(_._1 == id).sortBy(_._3)
      assert(mine.map(_._5).sum == n, s"doc $id loses tokens")
      // contiguous offsets from 0: each span starts where the previous ended
      assert(mine.scanLeft(0)((acc, sp) => acc + sp._5).init == mine.map(_._3),
        s"doc $id spans are not contiguous: $mine")
    }
  }

  test("within an example, spans tile [0, S) without overlap") {
    val spans = pack((1L, 77), (2L, 123), (3L, 211))
    spans.groupBy(_._2).foreach { case (ex, sps) =>
      val sorted = sps.sortBy(_._4)
      assert(sorted.head._4 == 0, s"example $ex does not start at 0")
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 + a._5 == b._4,
          s"example $ex has a gap/overlap between $a and $b")
        case _ =>
      }
    }
  }

  test("zero-token documents produce no spans; the layout is partition-invariant") {
    val rows = Seq((1L, 50), (2L, 0), (3L, 150), (4L, 0), (5L, 99))
    val a = pack(rows: _*)
    assert(!a.exists(s => s._1 == 2L || s._1 == 4L))
    val b = ExamplePack.packExamples(
        rows.toDF("id", "n").repartition(7), "id", col("n"), S, "id")
      .as[(Long, Int, Int, Int, Int)].collect().toSeq.sortBy(t => (t._1, t._2))
    assert(a == b)
  }

  test("a document spanning many examples explodes to exactly its overlap count") {
    val spans = pack((1L, 5), (2L, 1000))
    // doc 2 occupies tokens [5, 1005): examples 0..10 → 11 spans
    assert(spans.count(_._1 == 2L) == 11)
  }
}
