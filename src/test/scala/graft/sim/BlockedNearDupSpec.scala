package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BlockedNearDupSpec extends SparkSpecBase {
  import spark.implicits._

  private val dim = 8

  /** Deterministic pseudo-random unit-ish vector. */
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dim)(j => (((seed * 131 + j * 17) % 101) - 50) / 50.0f)

  test("small blocks are compared exactly (parity with the plain blocked self-join)") {
    val df = (0 until 40).map(i => (i.toLong, s"blk${i % 5}", vec(i)))
      .toDF("id", "blk", "v")
    val got = BlockedNearDup.pairs(df, "id", "v", "blk",
      maxBlock = 16, threshold = -1.0, dim = dim)
    // every block has 8 rows <= maxBlock -> no splitting -> all in-block pairs
    val expected = df.as("x").join(df.as("y"),
        $"x.blk" === $"y.blk" && $"x.id" < $"y.id")
      .count()
    assert(got.count() == expected)
  }

  test("a hot block is split: per-sub pair space collapses, true dups survive") {
    // 400-row hot block of near-random vectors + two planted exact dups
    val hot = (0 until 400).map(i => (i.toLong, "hot", vec(i)))
    val dups = Seq((1000L, "hot", vec(7)), (1001L, "hot", vec(123)))
    val df = (hot ++ dups).toDF("id", "blk", "v")
    val got = BlockedNearDup.pairs(df, "id", "v", "blk",
      maxBlock = 16, threshold = 0.999, dim = dim)
    val pairs = got.select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((7L, 1000L)) && pairs.contains((123L, 1001L)),
      s"planted exact dups must survive the split, got $pairs")

    // the split bounds the comparison space: with bn=402 and maxBlock=16 the
    // ladder picks mod=32; total compared pairs must be far below n^2/2
    val comparedPairs = BlockedNearDup.pairs(df, "id", "v", "blk",
      maxBlock = 16, threshold = -1.0, dim = dim).count()
    val allPairs = 402L * 401 / 2
    assert(comparedPairs < allPairs / 4,
      s"split must prune the pair space: $comparedPairs vs $allPairs")
  }

  test("dropNearDuplicates removes planted dups (keep-smallest-id) and is idempotent") {
    val base = (0 until 60).map(i => (i.toLong, s"b${i % 3}", vec(i)))
    // exact duplicates of ids 4 and 17, planted with larger ids
    val dups = Seq((100L, "b1", vec(4)), (101L, "b2", vec(17)))
    val df = (base ++ dups).toDF("id", "blk", "v")
    val kept = BlockedNearDup.dropNearDuplicates(df, "id", "v", "blk",
      maxBlock = 16, threshold = 0.9999, dim = dim)
    val ids = kept.select("id").as[Long].collect().sorted.toSeq
    assert(ids == (0L until 60L), s"planted dups 100/101 must drop, originals stay: $ids")
    val again = BlockedNearDup.dropNearDuplicates(kept, "id", "v", "blk",
      maxBlock = 16, threshold = 0.9999, dim = dim)
    assert(again.count() == kept.count(), "idempotent on a deduped corpus")
  }

  test("deterministic across runs and partitionings") {
    val df = (0 until 100).map(i => (i.toLong, s"b${i % 2}", vec(i))).toDF("id", "blk", "v")
    val r1 = BlockedNearDup.pairs(df, "id", "v", "blk", 8, 0.0, dim)
    val r2 = BlockedNearDup.pairs(df.repartition(13), "id", "v", "blk", 8, 0.0, dim)
    assert(r1.exceptAll(r2).isEmpty && r2.exceptAll(r1).isEmpty)
    // the high-block-cardinality form (windowed counts) computes the same
    val r3 = BlockedNearDup.pairs(df, "id", "v", "blk", 8, 0.0, dim,
      broadcastSizes = false)
    assert(r1.exceptAll(r3).isEmpty && r3.exceptAll(r1).isEmpty)
  }
}
