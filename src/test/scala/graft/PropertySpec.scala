package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties (SURVEY §5): algebraic invariants of the pure
  * plan-constant generators, plus dataflow invariants (dedup idempotence,
  * split partitioning) over small generated DataFrames.
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def check(p: Prop, cases: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  test("minhashCoefficients: a odd in [1,2^31), b in [0,2^31), no a*H+b overflow") {
    check(Prop.forAll(Gen.choose(1, 64)) { k =>
      val cs = graft.dedup.TextDedup.minhashCoefficients(k)
      cs.length == k && cs.forall { case (a, b) =>
        a % 2 == 1 && a >= 1 && a < (1L << 31) && b >= 0 && b < (1L << 31) &&
          // H < 2^32 ⇒ a*H+b < 2^63 (the no-BIGINT-overflow contract)
          a * 4294967295L + b > 0
      }
    })
  }

  test("minhashCoefficients is a stable prefix family (k+1 extends k)") {
    check(Prop.forAll(Gen.choose(1, 32)) { k =>
      val small = graft.dedup.TextDedup.minhashCoefficients(k).toSeq
      val big = graft.dedup.TextDedup.minhashCoefficients(k + 1).toSeq
      big.take(k) == small
    })
  }

  test("DCG discounts decrease; ideal DCG strictly increases with truth size") {
    check(Prop.forAll(Gen.choose(1, 100)) { k =>
      val d = graft.rank.RankingEval.discountsScaled(k)
      val ideal = graft.rank.RankingEval.idcgScaled(k)
      d.zip(d.tail).forall { case (x, y) => x >= y && y > 0 } &&
        ideal.zip(ideal.tail).forall { case (x, y) => x < y }
    })
  }

  test("columnUnion: deduplicating, order-preserving, idempotent") {
    val gen = Gen.listOf(Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e")))
    check(Prop.forAll(gen) { groups =>
      val u = graft.models.StarDag.columnUnion(groups)
      u.distinct == u &&
        u.toSet == groups.flatten.toSet &&
        graft.models.StarDag.columnUnion(Seq(u)) == u
    })
  }

  test("srpSigns entries are exactly ±1 and the family is a stable prefix") {
    check(Prop.forAll(Gen.choose(1, 16), Gen.choose(1, 32)) { (bits, dim) =>
      val s = graft.sim.Knn.srpSigns(bits, dim)
      s.forall(_.forall(v => v == 1.0 || v == -1.0)) &&
        graft.sim.Knn.srpSigns(bits, dim + 1).map(_.take(dim).toSeq).toSeq ==
          s.map(_.toSeq).toSeq
    }, cases = 30)
  }

  test("dropExactDuplicates is idempotent and canonical ids survive (dataflow)") {
    val docGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(1L, 1000L), Gen.oneOf("a b", "A  b", "x", "x ", "y z w")))
    check(Prop.forAll(docGen) { rows =>
      val df = rows.toDF("doc_id", "text").dropDuplicates("doc_id")
      val once = graft.dedup.TextDedup.dropExactDuplicates(df, "doc_id", "text")
      // re-materialize before the second pass: a doubly-nested self-semi-join
      // trips an attribute-binding INTERNAL_ERROR in Spark 4.1's analyzer
      val onceLocal = once.select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      val twice = graft.dedup.TextDedup.dropExactDuplicates(
        onceLocal.toDF("doc_id", "text"), "doc_id", "text")
      onceLocal.map(_._1).sorted == twice.select($"doc_id").as[Long].collect().toSeq.sorted
    }, cases = 10)
  }

  test("timeSplit partitions exactly for arbitrary boundaries (dataflow)") {
    val tsGen = Gen.listOfN(20, Gen.choose(0L, 4000L))
    val bGen = Gen.zip(Gen.choose(0L, 2000L), Gen.choose(2000L, 4000L))
    check(Prop.forAll(tsGen, bGen) { case (ts, (b1, b2)) =>
      val df = ts.toDF("t").select(timestamp_seconds($"t").as("ts"))
      val (a, b, c) = graft.operators.Relational.timeSplit(df, "ts",
        timestamp_seconds(lit(b1)), timestamp_seconds(lit(b2)))
      a.count() + b.count() + c.count() == df.count()
    }, cases = 10)
  }

  test("asOf equals per-row brute force on random event streams (dataflow)") {
    // random spines/features over few keys and a tight time range, so ties,
    // matchless keys and duplicate feature times all occur
    val spineGen = Gen.listOfN(15, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 30L)))
    val featGen = Gen.listOfN(15,
      Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 30L), Gen.choose(0, 99)))
    check(Prop.forAll(spineGen, featGen) { case (sp, ft) =>
      val spine = sp.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("id", "k", "t")
      val feats = ft.map { case (k, t, v) => (k, t, v.toDouble) }.toDF("k", "ft", "v")
      val got = graft.operators.AsOfJoin
        .asOf(spine, feats, Seq("k"), "t", "ft", Seq("v"))
        .select($"id", $"asof_v", $"asof_ft").collect()
        .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
      sp.zipWithIndex.forall { case ((k, t), i) =>
        val eligible = ft.filter { case (fk, fts, _) => fk == k && fts <= t }
        val expect =
          if (eligible.isEmpty) (None, None)
          else {
            // operator tie-break: latest time, then greatest value tuple
            val (_, bt, bv) = eligible.maxBy { case (_, fts, v) => (fts, v) }
            (Some(bv.toDouble), Some(bt))
          }
        got(i.toLong) == expect
      }
    }, cases = 20)
  }

  test("intervalJoin equals the naive band join for random bins (dataflow)") {
    val ptGen = Gen.listOfN(12, Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 3L)))
    val ivGen = Gen.listOfN(6,
      Gen.zip(Gen.choose(0L, 50L), Gen.choose(0L, 20L), Gen.choose(0L, 3L)))
    val binGen = Gen.oneOf(1L, 3L, 7L, 100L)
    check(Prop.forAll(ptGen, ivGen, binGen) { case (ps, ivs, bin) =>
      val points = ps.zipWithIndex.map { case ((t, k), i) => (i.toLong, k, t) }
        .toDF("pid", "k", "t")
      val intervals = ivs.zipWithIndex.map { case ((lo, len, k), i) =>
        (1000L + i, k, lo, lo + len) }.toDF("iid", "k", "lo", "hi")
      val got = graft.operators.Relational
        .intervalJoin(points, intervals, "t", "lo", "hi", bin, Seq("k"))
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      val expect = (for {
        ((t, k), i) <- ps.zipWithIndex
        ((lo, len, ik), j) <- ivs.zipWithIndex
        if ik == k && t >= lo && t <= lo + len
      } yield (i.toLong, 1000L + j)).toSet
      got == expect
    }, cases = 20)
  }
}
