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
    assert(r >= 0.6 && r <= 1.0, s"PQ serve recall@10 = $r")
    // determinism: the gauge is a pure function of the fixture (seeded
    // k-means, deterministic sample) — two evaluations must agree exactly
    assert(VectorQueries.annPqRecallAt10(spark, sfDirMid) == r)
  }

  test("pq recall responds to the axes the gauge exists to price") {
    // the round-14 decomposition (SCALE.md): at production code width,
    // exhaustive probing must dominate partial probing (probe misses are
    // a real, visible cost) ...
    val partial = VectorQueries.pqServeRecall(spark, sfDirMid,
      nlist = 16, m = 16, k = 256, nprobe = 8, overfetch = 4)
    val full = VectorQueries.pqServeRecall(spark, sfDirMid,
      nlist = 16, m = 16, k = 256, nprobe = 16, overfetch = 4)
    assert(full >= partial, s"full-probe $full < partial-probe $partial")
    // ... and a coarse codebook must cost recall at the same probe
    // budget (code width is the other axis)
    val coarse = VectorQueries.pqServeRecall(spark, sfDirMid,
      nlist = 16, m = 4, k = 16, nprobe = 8, overfetch = 4)
    assert(coarse < full, s"coarse-code $coarse not below full $full")
  }
}
