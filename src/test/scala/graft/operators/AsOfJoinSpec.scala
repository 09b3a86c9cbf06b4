package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def spineDf = Seq(
    (1L, "u1", 100L), (2L, "u1", 200L), (3L, "u1", 300L),
    (4L, "u2", 150L), (5L, "u3", 50L)).toDF("id", "k", "t")
  private def featDf = Seq(
    ("u1", 100L, 1.0), ("u1", 250L, 2.5), ("u2", 10L, 7.0),
    ("u2", 151L, 9.0), ("u4", 1L, 4.0)).toDF("k", "ft", "v")

  private def run(tol: Option[Long] = None): Map[Long, (Option[Double], Option[Long])] =
    AsOfJoin.asOf(spineDf, featDf, Seq("k"), "t", "ft", Seq("v"), tol)
      .select($"id", $"asof_v", $"asof_ft")
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap

  test("asOf picks the most recent at-or-before feature, inclusive at equal t") {
    val out = run()
    assert(out(1) == ((Some(1.0), Some(100L))), "feature at exactly spine t is visible")
    assert(out(2) == ((Some(1.0), Some(100L))), "later feature (250) must NOT leak into t=200")
    assert(out(3) == ((Some(2.5), Some(250L))))
    assert(out(4) == ((Some(7.0), Some(10L))), "u2@150: the 151 feature is in the future")
    assert(out(5) == ((None, None)), "key with no eligible feature yields nulls")
  }

  test("tolerance nulls stale matches but keeps fresh ones") {
    val out = run(tol = Some(50L))
    assert(out(1) == ((Some(1.0), Some(100L))), "staleness 0 <= 50")
    assert(out(2) == ((None, None)), "staleness 100 > 50 is nulled")
    assert(out(3) == ((Some(2.5), Some(250L))), "staleness 50 is inclusive")
    assert(out(4) == ((None, None)), "staleness 140 > 50")
  }

  test("matches a brute-force argmax formulation on fixture data") {
    val ev = tbl("events")
    val spine = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"))
    val feat = ev.filter($"event_type".isin("view", "click"))
      .select($"user_id", unix_micros($"ts").as("t_us"), $"value")

    val fast = AsOfJoin.asOf(spine, feat, Seq("user_id"), "ts_us", "t_us", Seq("value"))

    // Brute force: non-equi range join + per-spine-row argmax on feature
    // time. (The formulation AsOfJoin exists to avoid at scale — fine on
    // sf0.001.) max_by ignores null-ordering rows, so spine rows with no
    // eligible feature keep a null struct => null fields, same as asOf.
    val brute = spine.as("s")
      .join(feat.as("f"),
        $"s.user_id" === $"f.user_id" && $"f.t_us" <= $"s.ts_us", "left")
      .groupBy($"s.event_id", $"s.user_id", $"s.ts_us")
      .agg(max_by(struct($"f.value", $"f.t_us"), $"f.t_us").as("m"))
      .select($"event_id", $"user_id", $"ts_us",
        $"m.value".as("asof_value"), $"m.t_us".as("asof_t_us"))

    assert(fast.count() == spine.count(), "exactly one output row per spine row")
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty,
      "window formulation must equal the brute-force argmax")
  }

  test("null feature VALUES carry row-wise: no stitching fields across feature rows") {
    val s = Seq((1L, "u", 3L)).toDF("id", "k", "t")
    // latest feature row (t=2) has a null value; an ignoreNulls-per-column
    // carry would serve v=5.0 from t=1 while timing staleness against t=2
    val f = Seq(("u", 1L, Some(5.0)), ("u", 2L, Option.empty[Double]))
      .toDF("k", "ft", "v")
    val out = AsOfJoin.asOf(s, f, Seq("k"), "t", "ft", Seq("v"))
      .select($"asof_v", $"asof_ft").head()
    assert(out.isNullAt(0) && out.getLong(1) == 2L,
      s"must return the t=2 row wholesale (null value), got $out")
    // and with tolerance: the t=2 match is fresh, so the (null, 2) row stands
    val tol = AsOfJoin.asOf(s, f, Seq("k"), "t", "ft", Seq("v"), Some(1L))
      .select($"asof_v", $"asof_ft").head()
    assert(tol.isNullAt(0) && tol.getLong(1) == 2L)
    // two value columns: never mix fields of different feature rows
    val f2 = Seq(("u", 1L, Some(1.0), Option.empty[Double]),
      ("u", 2L, Option.empty[Double], Some(2.0))).toDF("k", "ft", "x", "y")
    val mixed = AsOfJoin.asOf(s, f2, Seq("k"), "t", "ft", Seq("x", "y"))
      .select($"asof_x", $"asof_y", $"asof_ft").head()
    assert(mixed.isNullAt(0) && mixed.getDouble(1) == 2.0 && mixed.getLong(2) == 2L,
      s"(x, y) must come from ONE feature row, got $mixed")
  }

  test("equal-time feature ties resolve to the greatest value tuple") {
    val s = Seq((1L, "u", 10L)).toDF("id", "k", "t")
    val f = Seq(("u", 10L, 3.0), ("u", 10L, 9.0), ("u", 10L, 5.0)).toDF("k", "ft", "v")
    val out = AsOfJoin.asOf(s, f, Seq("k"), "t", "ft", Seq("v"))
      .select($"asof_v").as[Double].collect()
    assert(out.toSeq == Seq(9.0))
  }

  test("resample: aligned ticks span floor(min/step)·step..max, LOCF per tick") {
    val obs = Seq(("u", 25L, 1.0), ("u", 47L, 2.0), ("v", 10L, 9.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin.resample(obs, Seq("k"), "t", Seq("v"), step = 10L)
      .orderBy($"k", $"tick")
      .select($"k", $"tick", $"asof_v").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(out.toSeq == Seq(
      ("u", 20L, None), // aligned tick before the first observation
      ("u", 30L, Some(1.0)), ("u", 40L, Some(1.0)),
      ("v", 10L, Some(9.0)))) // min == aligned tick == an observation
  }

  test("result is invariant under input repartitioning") {
    def canon(df: DataFrame) = df.orderBy("id").collect().toSeq
    val base = AsOfJoin.asOf(spineDf, featDf, Seq("k"), "t", "ft", Seq("v"))
    val shuffled = AsOfJoin.asOf(spineDf.repartition(7), featDf.repartition(3),
      Seq("k"), "t", "ft", Seq("v"))
    assert(canon(base) == canon(shuffled))
  }

  test("plan crosses exactly one exchange (union + single key window)") {
    val plan = AsOfJoin.asOf(spineDf, featDf, Seq("k"), "t", "ft", Seq("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"asOf must shuffle once on the key, saw $exchanges:\n$plan")
  }
}
