package graft.features

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TargetEncoderSpec extends SparkSpecBase {
  import spark.implicits._

  private def df = Seq(
    ("a", 1.0), ("a", 3.0), ("a", 5.0),
    ("b", 10.0),
    ("c", 2.0), ("c", 4.0)).toDF("cat", "y")
  // global prior = 25/6

  test("looEncode excludes the row's own target and smooths toward the prior") {
    val p = 25.0 / 6.0
    val out = TargetEncoder.looEncode(df, "cat", "y", alpha = 2.0)
      .select($"cat", $"y", $"te").as[(String, Double, Double)].collect()
    out.foreach { case (c, y, te) =>
      val (sum, n) = c match {
        case "a" => (9.0, 3); case "b" => (10.0, 1); case "c" => (6.0, 2)
      }
      val expected = ((sum - y) + p * 2.0) / (n - 1 + 2.0)
      assert(math.abs(te - expected) < 1e-12, s"($c, $y): $te vs $expected")
    }
    // singleton: numerator reduces to prior*alpha, denominator to alpha
    val b = out.find(_._1 == "b").get._3
    assert(math.abs(b - p) < 1e-12, "a singleton category encodes to exactly the prior")
  }

  test("fit/transform: smoothed means on seen categories, prior on unseen") {
    val m = TargetEncoder.fit(df, "cat", "y", alpha = 1.0)
    val p = 25.0 / 6.0
    val enc = m.transform(Seq(("a", 0.0), ("zzz", 0.0)).toDF("cat", "y"))
      .select($"cat", $"te").as[(String, Double)].collect().toMap
    assert(math.abs(enc("a") - (9.0 + p) / 4.0) < 1e-12)
    assert(math.abs(enc("zzz") - p) < 1e-12, "unseen category falls back to the prior")
  }

  test("null targets: excluded from sums AND counts; null rows encode to null") {
    val nully = Seq(("a", Some(2.0)), ("a", Option.empty[Double]), ("b", Some(4.0)))
      .toDF("cat", "y")
    val p = 3.0 // prior over non-null targets only: (2+4)/2
    assert(math.abs(TargetEncoder.prior(nully, "y") - p) < 1e-12)
    val out = TargetEncoder.looEncode(nully, "cat", "y", alpha = 1.0)
      .select($"cat", $"y", $"te").as[(String, Option[Double], Option[Double])]
      .collect()
    val aReal = out.find(r => r._1 == "a" && r._2.isDefined).get._3.get
    // the non-null 'a' row is a singleton among non-null targets -> prior
    assert(math.abs(aReal - p) < 1e-12,
      s"null target must not inflate the LOO denominator: $aReal vs $p")
    assert(out.find(r => r._1 == "a" && r._2.isEmpty).get._3.isEmpty,
      "a row with no label has no leave-one-out encoding")
    assertThrows[IllegalArgumentException](
      TargetEncoder.prior(Seq(("a", Option.empty[Double])).toDF("cat", "y"), "y"))
  }

  test("encoded values are invariant under repartitioning (exact decimal sums)") {
    val ev = tbl("events", sfDirMid).select($"event_id", $"event_type", $"value")
    val a = TargetEncoder.looEncode(ev, "event_type", "value", 10.0)
    val b = TargetEncoder.looEncode(ev.repartition(17), "event_type", "value", 10.0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "bit-identical encodings regardless of physical partitioning")
  }
}
