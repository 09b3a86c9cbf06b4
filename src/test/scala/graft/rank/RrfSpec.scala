package graft.rank

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion: exact-rational fusion of top-k lists. */
class RrfSpec extends SparkSpecBase {
  import spark.implicits._

  private def list(rs: (Long, Int)*) = rs.toSeq.toDF("id", "rank")

  test("fuse sums 1/(c+rank) per list with exact doubles; missing list -> 0") {
    val a = list(1L -> 1, 2L -> 2)
    val b = list(2L -> 1, 3L -> 2)
    val out = Rrf.fuse(Seq(a, b), "id", "rank")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) === 1.0 / 61)
    assert(out(2L) === 1.0 / 62 + 1.0 / 61)
    assert(out(3L) === 1.0 / 62)
  }

  test("a doc ranked in both lists beats a doc top-ranked in one") {
    val a = list(10L -> 1, 20L -> 2)
    val b = list(20L -> 3, 30L -> 1)
    val top = Rrf.fuseTopK(Seq(a, b), "id", "rank", 1).head
    assert(top.getLong(0) === 20L) // 1/62 + 1/63 > 1/61
  }

  test("rank columns surface per input list, null where absent") {
    val out = Rrf.fuse(Seq(list(1L -> 1), list(2L -> 1)), "id", "rank")
      .orderBy("id").collect()
    assert(out(0).getLong(1) === 1L && out(0).isNullAt(2))
    assert(out(1).isNullAt(1) && out(1).getLong(2) === 1L)
  }

  test("fusion is partitioning-invariant (fixed association, no shuffle sum)") {
    val a = list((1L to 40L).map(i => i -> i.toInt): _*)
    val b = list((1L to 40L).map(i => i -> (41 - i).toInt): _*)
    val x = Rrf.fuse(Seq(a, b), "id", "rank").orderBy("id").collect()
    val y = Rrf.fuse(Seq(a.repartition(7), b.repartition(3)), "id", "rank")
      .orderBy("id").collect()
    assert(x.toSeq === y.toSeq)
  }

  test("rankBy attaches 1-based ranks in the given order") {
    val top = Seq((5L, 0.9), (6L, 0.7), (7L, 0.8)).toDF("id", "score")
    val ranked = Rrf.rankBy(top, Seq(col("score").desc, col("id")))
      .orderBy("rank").collect().map(r => r.getLong(0))
    assert(ranked.toSeq === Seq(5L, 7L, 6L))
  }

  test("three-way fusion composes left to right") {
    val out = Rrf.fuse(Seq(list(1L -> 1), list(1L -> 2), list(1L -> 3)),
      "id", "rank").head
    assert(out.getDouble(4) === 1.0 / 61 + 1.0 / 62 + 1.0 / 63)
  }
}
