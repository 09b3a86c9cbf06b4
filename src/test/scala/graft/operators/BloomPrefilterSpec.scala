package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BloomPrefilterSpec extends SparkSpecBase {
  import spark.implicits._

  private def big = tbl("orders").select($"o_orderkey", $"o_custkey")
  private def small = tbl("customer").select($"c_custkey")
    .filter($"c_custkey" % 3 === 0)

  test("antiJoin is exactly a plain left_anti join") {
    val got = BloomPrefilter.antiJoin(big, $"o_custkey", small, $"c_custkey", 1000L)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val ref = big.join(small, $"o_custkey" === $"c_custkey", "left_anti")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(got == ref && ref.nonEmpty)
  }

  test("semiJoin is exactly a plain left_semi join") {
    val got = BloomPrefilter.semiJoin(big, $"o_custkey", small, $"c_custkey", 1000L)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val ref = big.join(small, $"o_custkey" === $"c_custkey", "left_semi")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(got == ref && ref.nonEmpty)
  }

  test("exactness holds even at an absurd false-positive rate") {
    // fpp≈50%: half the non-matching rows take the exact-join path — the
    // answer must not change, only the routing
    val got = BloomPrefilter.antiJoin(big, $"o_custkey", small, $"c_custkey",
        1000L, fpp = 0.5)
      .count()
    val ref = big.join(small, $"o_custkey" === $"c_custkey", "left_anti").count()
    assert(got == ref)
  }

  test("null big-side keys: kept by anti, dropped by semi") {
    val b = Seq((1L, Some("a")), (2L, None), (3L, Some("b"))).toDF("id", "k")
    val s = Seq("a").toDF("k")
    val anti = BloomPrefilter.antiJoin(b, $"k", s, $"k", 10L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(anti == Seq(2L, 3L))
    val semi = BloomPrefilter.semiJoin(b, $"k", s, $"k", 10L)
      .select("id").as[Long].collect().toSeq
    assert(semi == Seq(1L))
  }

  test("null small-side keys are ignored, not matched") {
    val b = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val s = Seq(Some("a"), None).toDF("k")
    val anti = BloomPrefilter.antiJoin(b, $"k", s, $"k", 10L)
      .select("id").as[Long].collect().toSeq
    assert(anti == Seq(2L))
  }
}
