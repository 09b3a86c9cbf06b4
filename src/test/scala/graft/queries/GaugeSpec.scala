package graft.queries

import graft.SparkSpecBase

/** The bench artifact's untimed quality gauges (SparkEntry.benchGauges):
  * scalar recall readings carried beside the walls. Pinned here so a
  * broken gauge (the thing that CAUGHT the round-13 MIPS/L2 bug) cannot
  * itself rot unnoticed: each must read a sane recall on the fixture, and
  * the PQ gauge must sit strictly on the sloped part of the curve — a
  * reading pinned at 1.0 would hide regressions (see
  * VectorQueries.annPqRecallAt10 doc).
  */
class GaugeSpec extends SparkSpecBase {

  test("ann_pq_recall_at10 gauge reads a sane, non-saturated recall") {
    val r = VectorQueries.annPqRecallAt10(spark, sfDirMid)
    assert(r >= 0.5 && r <= 1.0, s"PQ serve recall@10 = $r")
    // determinism: the gauge is a pure function of the fixture (seeded
    // k-means, deterministic sample) — two evaluations must agree exactly
    assert(VectorQueries.annPqRecallAt10(spark, sfDirMid) == r)
  }
}
