package graft.graph

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LabelPropagationSpec extends SparkSpecBase {
  import spark.implicits._

  /** Independent single-machine reference: identical synchronous
    * recurrence (self-vote, max count then smallest label). */
  private def reference(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = (edges ++ edges.map(e => (e._2, e._1)))
      .filter(e => e._1 != e._2).distinct
    val nodes = sym.map(_._1).distinct.sorted
    val nbrs = sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 0 until rounds) {
      lab = nodes.map { n =>
        val votes = (n +: nbrs(n).map(identity)).map {
          case v if v == n => lab(n)
          case v => lab(v)
        }
        // NB: the self vote is lab(n); neighbor votes are lab(neighbor)
        val counts = votes.groupBy(identity).map { case (l, vs) => l -> vs.size }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    lab
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    LabelPropagation.run(edges.toDF("a", "b"), "a", "b", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // two triangles bridged by a single edge: the canonical two-community shape
  private val twoTriangles = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), // community A
    (10L, 11L), (11L, 12L), (10L, 12L), // community B
    (3L, 10L)) // bridge

  test("matches the independent reference recurrence round-for-round") {
    for (r <- Seq(1, 2, 3, 5))
      assert(run(twoTriangles, r) === reference(twoTriangles, r), s"rounds=$r")
  }

  test("two bridged triangles resolve to their own min-id communities") {
    val lab = run(twoTriangles, 5)
    assert(Set(lab(1L), lab(2L), lab(3L)) == Set(1L))
    assert(Set(lab(10L), lab(11L), lab(12L)) == Set(10L))
  }

  test("the self-vote damps the bipartite oscillation (stable fixpoint on an edge)") {
    // a single edge {1,2}: pure LPA with no self-vote flips labels every
    // round forever; with the self-vote every vote set ties and the
    // smallest label wins both sides, reaching the fixpoint in one round
    assert(run(Seq((1L, 2L)), 1) === Map(1L -> 1L, 2L -> 1L))
    assert(run(Seq((1L, 2L)), 4) === Map(1L -> 1L, 2L -> 1L))
  }

  test("result is invariant under input partitioning") {
    val df = twoTriangles.toDF("a", "b")
    val a = LabelPropagation.run(df.repartition(7), "a", "b", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = LabelPropagation.run(df.coalesce(1), "a", "b", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("retains O(1) persistent RDDs across rounds (block lifecycle)") {
    val edges = (1L to 40L).map(i => (i, i % 40 + 1)).toDF("a", "b")
    val before = spark.sparkContext.getPersistentRDDs.size
    LabelPropagation.run(edges, "a", "b", rounds = 8).collect()
    val delta = spark.sparkContext.getPersistentRDDs.size - before
    assert(delta <= 2, s"expected O(1) persisted frames, got delta=$delta")
  }
}
