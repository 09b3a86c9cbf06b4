package graft.graph

import graft.SparkSpecBase

class HitsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Independent reference: same integer half-step recurrence including
    * the per-half-step fixed-point DIV rescale. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
      cap: Long = Hits.DefaultCapUnits): Map[Long, (Long, Long)] = {
    val es = edges.distinct
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    def rescale(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = if (m.isEmpty) 0L else m.values.max
      val dv = math.max(1L, mx / cap)
      if (dv == 1L) m else m.map { case (k, v) => k -> v / dv }
    }
    var hub = nodes.map(_ -> 1L).toMap.withDefaultValue(0L)
    var auth = nodes.map(_ -> 1L).toMap.withDefaultValue(0L)
    for (_ <- 0 until iters) {
      auth = rescale(nodes.map(v =>
          v -> es.filter(_._2 == v).map(e => hub(e._1)).sum).toMap)
        .withDefaultValue(0L)
      hub = rescale(nodes.map(v =>
          v -> es.filter(_._1 == v).map(e => auth(e._2)).sum).toMap)
        .withDefaultValue(0L)
    }
    nodes.map(v => v -> (hub(v), auth(v))).toMap
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] =
    Hits.run(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  // two hubs pointing at a shared authority plus a chain
  private val g = Seq((1L, 10L), (2L, 10L), (1L, 11L), (10L, 20L), (3L, 1L))

  test("matches the independent integer recurrence") {
    for (iters <- Seq(1, 2, 3))
      assert(run(g, iters) === reference(g, iters), s"iters=$iters")
  }

  test("the shared target of two hubs is the top authority; the double-pointer the top hub") {
    val r = run(g, 2)
    val topAuth = r.maxBy(_._2._2)
    val topHub = r.maxBy(_._2._1)
    assert(topAuth._1 == 10L, s"expected 10 as top authority: $r")
    assert(topHub._1 == 1L, s"expected 1 as top hub: $r")
  }

  test("on a vertex-transitive symmetric graph all scores are uniform") {
    // hub and auth are offset power-iterates (auth_k = A^(2k-1)·1,
    // hub_k = A^(2k)·1), so they need not be EQUAL even on symmetric
    // graphs — but vertex transitivity (a bidirectional triangle) forces
    // each family uniform across nodes
    val sym = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
    val r = run(sym, 3)
    assert(r.values.map(_._1).toSet.size == 1, s"hubs not uniform: $r")
    assert(r.values.map(_._2).toSet.size == 1, s"auths not uniform: $r")
  }

  test("result is invariant under input partitioning; parallel edges count once") {
    val dup = g ++ g
    val a = Hits.run(dup.toDF("s", "d").repartition(7), "s", "d", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Hits.run(g.toDF("s", "d").coalesce(1), "s", "d", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("fixed-point rescale path matches the reference at a forced small cap") {
    // cap=4 forces div > 1 within three sweeps on the small fixture, so
    // this exercises the exact DIV recurrence (not just the div=1 no-op)
    val r = Hits.run(g.toDF("s", "d"), "s", "d", 3, cap = 4L)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r === reference(g, 3, cap = 4L))
  }

  test("d_max=1e5 star survives 4 sweeps at the default cap (raw recurrence overflows long)") {
    // K(1e5 -> 2): raw scores reach a4 = 8e20 > Long.MaxValue, so the
    // pre-rescale implementation threw an ANSI overflow by sweep 4; the
    // fixed-point rescale keeps every score < 2*cap and completes.
    val star = (1L to 100000L).flatMap(i => Seq((i, 1000001L), (i, 1000002L)))
    val r = run(star, 4)
    assert(r.size == 100002)
    val topAuth = r.maxBy(x => (x._2._2, -x._1))._1
    assert(Set(1000001L, 1000002L)(topAuth), s"sink nodes must top auth")
    assert(r.values.forall { case (h, a) => h >= 0L && a >= 0L })
    assert(r.values.map(_._2).max <= 2L * Hits.DefaultCapUnits)
    assert(r.values.map(_._1).max <= 2L * Hits.DefaultCapUnits)
    // sources are interchangeable: one uniform positive hub score
    assert(r.filter(_._1 <= 100000L).values.map(_._1).toSet.size == 1)
  }

  test("retains O(1) persistent RDDs across sweeps (block lifecycle)") {
    val edges = (1L to 30L).map(i => (i, i % 30 + 1)).toDF("s", "d")
    val before = spark.sparkContext.getPersistentRDDs.size
    Hits.run(edges, "s", "d", 6).collect()
    val delta = spark.sparkContext.getPersistentRDDs.size - before
    assert(delta <= 5, s"expected O(1) persisted frames, got delta=$delta")
  }
}
