package graft.dedup

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class LineDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def lines(rows: (Long, Int, String)*) =
    rows.toSeq.toDF("id", "pos", "line")

  test("a line survives only at its first (doc, pos) occurrence corpus-wide") {
    val in = lines(
      (1L, 0, "header"), (1L, 1, "alpha"), (1L, 2, "header"), // within-doc repeat
      (2L, 0, "header"), (2L, 1, "beta"),                     // cross-doc repeat
      (3L, 0, "gamma"))
    val out = LineDedup.dropDuplicateLines(in, "id", "pos", "line")
      .orderBy($"id").as[(Long, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, "header\nalpha", 2), // second 'header' dropped even within doc 1
      (2L, "beta", 1),
      (3L, "gamma", 1)))
  }

  test("a doc whose every line was seen earlier survives as empty") {
    val in = lines((1L, 0, "x"), (1L, 1, "y"), (5L, 0, "y"), (5L, 1, "x"))
    val out = LineDedup.dropDuplicateLines(in, "id", "pos", "line")
      .orderBy($"id").as[(Long, String, Int)].collect().toSeq
    assert(out == Seq((1L, "x\ny", 2), (5L, "", 0)))
  }

  test("first-occurrence selection is a partial aggregate, never a window sort") {
    val in = lines((1L, 0, "a"), (2L, 0, "a"), (3L, 0, "b"))
    val plan = LineDedup.firstOccurrences(in, "id", "pos", "line")
      .queryExecution.executedPlan.toString
    // the skew-safe shape: a PARTIAL min(struct) before the exchange (the
    // hot line collapses to one row per map partition), never a Window sort
    // over all copies of a line on one executor
    assert(plan.contains("partial_min"), s"expected map-side partial min:\n$plan")
    assert(!plan.contains("Window"), s"window formulation is the skew trap:\n$plan")
  }

  test("out-of-range ids and positions raise instead of silently mis-packing") {
    // a snowflake-style id >= 2^42 would shift past the sign bit and wrap
    // negative, corrupting min-based first-occurrence selection
    val bigId = lines((1L << 42, 0, "a"))
      .select(Packing.pack($"id", $"pos"))
    val e1 = intercept[Exception] { bigId.collect() }
    assert(e1.getMessage.contains("Packing"), e1.getMessage)
    val bigPos = lines((1L, 1 << 21, "a")).select(Packing.pack($"id", $"pos"))
    val e2 = intercept[Exception] { bigPos.collect() }
    assert(e2.getMessage.contains("Packing"), e2.getMessage)
    // the largest legal (id, pos) round-trips exactly
    val maxOk = lines(((1L << 42) - 1, (1 << 21) - 1, "a"))
      .select(Packing.pack($"id", $"pos").as("p"))
      .select(Packing.unpackId($"p"), Packing.unpackPos($"p"))
      .as[(Long, Int)].head()
    assert(maxOk == ((1L << 42) - 1, (1 << 21) - 1))
  }

  test("reassembly order follows position, not shuffle arrival") {
    val in = lines((1L, 2, "c"), (1L, 0, "a"), (1L, 1, "b"))
    val out = LineDedup.dropDuplicateLines(in.repartition(4), "id", "pos", "line")
      .as[(Long, String, Int)].collect().toSeq
    assert(out == Seq((1L, "a\nb\nc", 3)))
  }

  test("normalized-key dedup collapses case/digit variants; survivor keeps original bytes") {
    graft.sql.GraftFunctions.register(spark)
    val in = lines(
      (1L, 0, "Copyright 2019 Corp"), // first occurrence, mixed case
      (1L, 1, "alpha"),
      (2L, 0, "COPYRIGHT  2024 CORP"), // same line after normalization
      (2L, 1, "beta"))
    val out = LineDedup.dropDuplicateLinesBy(in, "id", "pos", "line",
        graft.functions.TextOps.ccnetFingerprint($"line"))
      .orderBy($"id").as[(Long, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, "Copyright 2019 Corp\nalpha", 2), // original bytes survive
      (2L, "beta", 1)),                      // normalized copy dropped
      s"got $out")
    // raw dedup treats the variants as distinct — both docs keep 2 lines
    val raw = LineDedup.dropDuplicateLines(in, "id", "pos", "line")
      .orderBy($"id").as[(Long, String, Int)].collect().toSeq
    assert(raw.map(_._3) == Seq(2, 2))
  }

  test("keyed dedup is deterministic under repartitioning (min_by on a unique order key)") {
    graft.sql.GraftFunctions.register(spark)
    val in = lines(
      (3L, 5, "The Rule 9"), (2L, 0, "the rule 3"), (2L, 7, "THE RULE 1"))
    val key = graft.functions.TextOps.ccnetFingerprint($"line")
    val a = LineDedup.dropDuplicateLinesBy(in.repartition(7), "id", "pos", "line", key)
      .orderBy($"id").as[(Long, String, Int)].collect().toSeq
    val b = LineDedup.dropDuplicateLinesBy(in.coalesce(1), "id", "pos", "line", key)
      .orderBy($"id").as[(Long, String, Int)].collect().toSeq
    assert(a == b)
    assert(a == Seq((2L, "the rule 3", 1), (3L, "", 0)),
      "first occurrence = min (doc, pos): doc 2 pos 0 wins, original bytes kept")
  }

  test("within-doc policy: intra-doc repeats die, cross-doc repeats survive") {
    val in = lines(
      (1L, 0, "header"), (1L, 1, "alpha"), (1L, 2, "header"), // intra repeat
      (2L, 0, "header"), (2L, 1, "beta"),                     // cross-doc copy
      (3L, 0, "beta"), (3L, 1, "beta"))                       // both
    val out = LineDedup.dropDuplicateLinesWithinDoc(in, "id", "pos", "line")
      .orderBy($"id").as[(Long, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, "header\nalpha", 2), // doc 1 keeps ITS first header
      (2L, "header\nbeta", 2),  // doc 2's header untouched by doc 1's
      (3L, "beta", 1)))
  }

  test("within-doc policy never empties a non-empty doc") {
    val in = lines((1L, 0, "x"), (1L, 1, "x"), (2L, 0, "x"))
    val out = LineDedup.dropDuplicateLinesWithinDoc(in, "id", "pos", "line")
      .orderBy($"id").as[(Long, String, Int)].collect().toSeq
    assert(out == Seq((1L, "x", 1), (2L, "x", 1)))
  }
}
