package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpecBase {
  import spark.implicits._

  test("dedupWithLastValue uses the whole-partition frame (Snowflake LAST_VALUE gotcha)") {
    // With Spark's default RANGE..CURRENT ROW frame, last(value) would equal
    // each row's own value; the whole-partition frame must return 30 for all.
    val df = Seq(
      ("u1", 1L, 10.0), ("u1", 2L, 20.0), ("u1", 3L, 30.0),
      ("u2", 1L, 5.0)).toDF("k", "ts", "value")
    val out = Relational.dedupWithLastValue(df, Seq("k"), "ts", Seq("value"))
    val u1 = out.filter($"k" === "u1").select("last_value").as[Double].collect().toSet
    assert(u1 == Set(30.0), "every u1 row must carry the partition-wise last value")
    val u1ts = out.filter($"k" === "u1").select("last_ts").as[Long].collect().toSet
    assert(u1ts == Set(3L))
  }

  test("dedupWithLastValue dedups full tuples but preserves per-key multiplicity") {
    val df = Seq(
      ("u1", 1L, 10.0), ("u1", 1L, 10.0), // exact dup -> 1 row
      ("u1", 2L, 20.0)).toDF("k", "ts", "value")
    val out = Relational.dedupWithLastValue(df, Seq("k"), "ts", Seq("value"))
    assert(out.count() == 2, "tuple dedup, not per-key dedup")
  }

  test("timeSplit partitions the input exactly") {
    val ord = tbl("orders")
    val (tr, va, te) = Relational.timeSplit(ord, "o_orderdate",
      lit("1999-01-01").cast("timestamp"), lit("2000-01-01").cast("timestamp"))
    assert(tr.count() + va.count() + te.count() == ord.count())
    assert(tr.intersect(va).isEmpty && va.intersect(te).isEmpty && tr.intersect(te).isEmpty)
  }

  test("keepFirstPerKey keeps exactly the first row in the given order") {
    val df = Seq(("a", 2, "second"), ("a", 1, "first"), ("b", 9, "only"))
      .toDF("k", "ord", "tag")
    val out = Relational.keepFirstPerKey(df, Seq("k"), Seq(col("ord").asc))
    assert(out.count() == 2)
    assert(out.filter($"k" === "a").select("tag").as[String].head() == "first")
  }

  test("latestBatch keeps only the max-order batch") {
    val df = Seq(("b1", 100L, "x"), ("b1", 101L, "y"), ("b2", 205L, "z"))
      .toDF("batch", "ts", "v")
    val out = Relational.latestBatch(df, "batch", "ts")
    assert(out.select("batch").distinct().as[String].collect().toSeq == Seq("b2"))
  }

  test("frequencyFilter keeps only keys meeting the threshold") {
    val df = Seq("a", "a", "a", "b").toDF("k")
    val out = Relational.frequencyFilter(df, "k", lit(1), 3)
    assert(out.count() == 3 && out.select("k").distinct().as[String].head() == "a")
  }

  test("envelope encode/decode roundtrip preserves rows") {
    val nation = tbl("nation")
    val env = Relational.toEnvelope(nation, "nation", 1L, "b1")
    val back = Relational.fromEnvelope(env, nation.schema)
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("fromEnvelopeVariant equals the from_json decode (Spark 4 VariantType path)") {
    val nation = tbl("nation")
    val env = Relational.toEnvelope(nation, "nation", 1L, "b1")
    val a = Relational.fromEnvelope(env, nation.schema)
    val b = Relational.fromEnvelopeVariant(env, nation.schema)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.schema == b.schema)
  }

  test("rowSample is seed-deterministic and lands near the requested fraction") {
    val li = tbl("lineitem", sfDirMid)
    val a = Relational.rowSample(li, 0.2, seed = 7L)
    val b = Relational.rowSample(li, 0.2, seed = 7L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "same seed, same rows")
    val frac = a.count().toDouble / li.count()
    assert(frac > 0.15 && frac < 0.25, s"fraction $frac out of tolerance")
  }

  test("hashSample is invariant under repartitioning and join-stable") {
    val li = tbl("lineitem", sfDirMid).select("l_orderkey", "l_partkey").distinct()
    val s1 = Relational.hashSample(li, col("l_partkey"), 0.3)
    val s2 = Relational.hashSample(li.repartition(13), col("l_partkey"), 0.3)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty,
      "hash sample must not depend on physical partitioning")
    val sampledKeys = s1.select("l_partkey").distinct()
    val part = tbl("part", sfDirMid)
    val joined = Relational.hashSample(part, col("p_partkey"), 0.3)
      .select(col("p_partkey").as("l_partkey")).distinct()
    assert(sampledKeys.exceptAll(joined).isEmpty,
      "the same key universe survives on both sides of a join")
  }

  test("stratifiedSample applies per-stratum rates; literal and rates-DF forms agree") {
    import spark.implicits._
    val ev = tbl("events", sfDirMid)
    val rates = Map("purchase" -> 1.0, "view" -> 0.2, "click" -> 0.0)
    val out = Relational.stratifiedSample(ev, col("event_type"), col("event_id"),
      rates, defaultRate = 0.05)

    val n = ev.groupBy("event_type").count().as[(String, Long)].collect().toMap
    val k = out.groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(k("purchase") == n("purchase"), "rate 1.0 keeps every row")
    assert(!k.contains("click"), "rate 0.0 keeps none")
    val viewRate = k("view").toDouble / n("view")
    assert(viewRate > 0.1 && viewRate < 0.3, s"~20% of views, got $viewRate")
    val errRate = k("error").toDouble / n("error")
    assert(errRate > 0.01 && errRate < 0.12, s"default ~5% for unlisted strata, got $errRate")

    val ratesDf = rates.toSeq.toDF("event_type", "rate")
    val byDf = Relational.stratifiedSampleBy(ev, "event_type", col("event_id"),
      ratesDf, defaultRate = 0.05)
    assert(out.exceptAll(byDf).isEmpty && byDf.exceptAll(out).isEmpty,
      "literal-CASE and broadcast-rates forms must select identical rows")
  }

  test("saltedJoin equals the plain join for inner and left, including fan-out") {
    import spark.implicits._
    val left = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d")).toDF("k", "lv")
    // k=1 matches TWO right rows (fan-out); k=3 matches none (left-null case)
    val right = Seq((1, 10.0), (1, 11.0), (2, 20.0), (9, 90.0)).toDF("k", "rv")
    for (jt <- Seq("inner", "left")) {
      val salted = Relational.saltedJoin(left, right, Seq("k"), numSalts = 4, joinType = jt)
      val plain = left.join(right, Seq("k"), jt)
        .select(($"k" +: $"lv" +: Seq($"rv")): _*)
      assert(salted.columns.toSeq == plain.columns.toSeq)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        s"salting must not change $jt join results")
    }
  }

  test("saltedJoin spreads a hot key across salts and shuffles on (key, salt)") {
    import spark.implicits._
    // one key carrying every row — the regime the operator exists for
    val hotLeft = (1 to 2000).map(i => (42, i.toLong)).toDF("k", "lv")
    val right = Seq((42, "x"), (7, "y")).toDF("k", "rv")
    val out = Relational.saltedJoin(hotLeft, right, Seq("k"), numSalts = 8)
    assert(out.count() == 2000)
    val plan = withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      Relational.saltedJoin(hotLeft, right, Seq("k"), 8).queryExecution.executedPlan.toString
    }
    assert(plan.contains("__salt"),
      s"join keys must include the salt so the hot key spreads:\n$plan")
    // the deterministic row-hash salt actually uses all 8 buckets here
    val salts = hotLeft.select(
      pmod(xxhash64(col("k"), col("lv")), lit(8L)).cast("int").as("s"))
      .distinct().as[Int].collect().toSet
    assert(salts.size == 8, s"row-hash salt should cover buckets, got $salts")
  }

  test("topKPerGroupSalted equals topKPerGroup on skewed fixture data") {
    val ev = tbl("events", sfDirMid).select(col("event_type"), col("event_id"), col("value"))
    val ord = Seq(col("value").desc, col("event_id").asc)
    val plain = Relational.topKPerGroup(ev, Seq("event_type"), ord, 7)
    val salted = Relational.topKPerGroupSalted(ev, Seq("event_type"), ord, 7, numSalts = 16)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "two-phase salted top-k must equal the single-window form")
    // k larger than most per-(key,salt) sub-partitions: still exact
    val tiny = ev.filter(col("event_id") < 100)
    val small = Relational.topKPerGroupSalted(tiny, Seq("event_type"), ord, 7, 16)
    val smallPlain = Relational.topKPerGroup(tiny, Seq("event_type"), ord, 7)
    assert(small.exceptAll(smallPlain).isEmpty && smallPlain.exceptAll(small).isEmpty)
  }

  test("forwardFill carries the last non-null value per key; leading nulls survive") {
    import spark.implicits._
    val df = Seq(
      ("u1", 1L, Option.empty[Double]), // leading null: stays null
      ("u1", 2L, Some(5.0)),
      ("u1", 3L, Option.empty[Double]), // filled with 5.0
      ("u1", 4L, Some(7.0)),
      ("u1", 5L, Option.empty[Double]), // filled with 7.0
      ("u2", 1L, Option.empty[Double])) // other key: unaffected
      .toDF("k", "t", "v")
    val out = Relational.forwardFill(df, Seq("k"), Seq(col("t").asc), Seq("v"))
      .orderBy($"k", $"t").select($"v").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double])).toSeq
    assert(out == Seq(None, Some(5.0), Some(5.0), Some(7.0), Some(7.0), None))
    // invariant under repartitioning
    val shuffled = Relational.forwardFill(df.repartition(7), Seq("k"),
      Seq(col("t").asc), Seq("v"))
    val base = Relational.forwardFill(df, Seq("k"), Seq(col("t").asc), Seq("v"))
    assert(base.exceptAll(shuffled).isEmpty && shuffled.exceptAll(base).isEmpty)
  }

  test("intervalJoin equals the naive non-equi join, inclusive at both boundaries") {
    import spark.implicits._
    val ev = tbl("events", sfDirMid)
    val points = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("t"))
    // per-user hourly windows anchored on purchases
    val intervals = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("anchor_id"),
        (unix_millis(col("ts")) - 1800000L).as("lo"),
        (unix_millis(col("ts")) + 1800000L).as("hi"))
    val binned = Relational.intervalJoin(points, intervals, "t", "lo", "hi",
      binSize = 600000L, keys = Seq("user_id"))
    val naive = points.as("p").join(intervals.as("i"),
        col("p.user_id") === col("i.user_id") &&
          col("p.t") >= col("i.lo") && col("p.t") <= col("i.hi"))
      .select(col("p.user_id"), col("p.event_id"), col("p.t"),
        col("i.anchor_id"), col("i.lo"), col("i.hi"))
    val b = binned.select("user_id", "event_id", "t", "anchor_id", "lo", "hi")
    assert(b.exceptAll(naive).isEmpty && naive.exceptAll(b).isEmpty,
      "binned interval join must equal the nested-loop form")
    assert(!binned.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
      "the binned form must plan an equi-join")

    // exact boundary points, keyless intervals, interval spanning many bins
    val pts = Seq((1L, 10L), (2L, 20L), (3L, 21L), (4L, 9L)).toDF("pid", "t")
    val ivs = Seq((100L, 10L, 20L)).toDF("iid", "lo", "hi")
    val hits = Relational.intervalJoin(pts, ivs, "t", "lo", "hi", binSize = 3L)
      .select($"pid").as[Long].collect().toSet
    assert(hits == Set(1L, 2L), "inclusive [lo, hi]: boundary points in, outside out")
  }

  test("stratifiedSample keeps a subset of any higher-rate sample on the same key") {
    val ev = tbl("events", sfDirMid)
    val lo = Relational.stratifiedSample(ev, col("event_type"), col("event_id"),
      Map("view" -> 0.1), defaultRate = 0.2)
    val hi = Relational.stratifiedSample(ev, col("event_type"), col("event_id"),
      Map("view" -> 0.5), defaultRate = 0.9)
    assert(lo.exceptAll(hi).isEmpty, "md5-coin monotonicity: lower rates nest inside higher")
  }
}
