package graft.dedup

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val K = 3

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("id", "text")
      .select($"id", split($"text", " ").as("toks"))

  private def run(in: org.apache.spark.sql.DataFrame, k: Int = K) =
    SpanDedup.removeDuplicateSpans(in, "id", col("toks"), k)
      .orderBy($"id").as[(Long, String, Int)].collect().toSeq

  test("a duplicated k-gram survives only at its first (doc, pos) occurrence") {
    val out = run(docs(
      (1L, "a b c x y"),   // first occurrence of "a b c"
      (2L, "p q a b c r")))// mid-document copy at any alignment
    assert(out == Seq(
      (1L, "a b c x y", 5),
      (2L, "p q r", 3)))   // the copied span's 3 tokens removed
  }

  test("within-doc verbatim repetition is removed after its first occurrence") {
    // "a a a a a": grams at 0,1,2; pos 0 survives, pos 1 and 2 mark
    // tokens 1..4 — only token 0 remains
    val out = run(docs((7L, "a a a a a")))
    assert(out == Seq((7L, "a", 1)))
  }

  test("overlapping marked spans merge without double-removal") {
    // doc 2 repeats a 4-token span of doc 1: its two overlapping 3-gram
    // copies cover tokens 1..4 exactly once each
    val out = run(docs(
      (1L, "w x y z"),
      (2L, "m w x y z n")))
    assert(out == Seq(
      (1L, "w x y z", 4),
      (2L, "m n", 2)))
  }

  test("documents shorter than k are never touched; full-coverage docs go empty") {
    val out = run(docs(
      (1L, "a b c"),
      (2L, "a b c"),    // identical doc: every token covered
      (3L, "a b")))     // < k tokens: no grams, immune
    assert(out == Seq(
      (1L, "a b c", 3),
      (2L, "", 0),
      (3L, "a b", 2)))
  }

  test("result is invariant to input partitioning") {
    val in = docs(
      (1L, "a b c d e"), (2L, "z a b c d w"), (3L, "q r s"),
      (4L, "a b c d e"), (5L, "one two three four"))
    assert(run(in) == run(in.repartition(7)))
  }

  test("bloom-prefiltered marking is result-identical (FPs resolved by the exact join)") {
    val in = docs(
      (1L, "a b c d e"), (2L, "z a b c d w"), (3L, "q r s"),
      (4L, "a b c d e"), (5L, "one two three four"), (6L, "q r s t"))
    val plain = run(in)
    val bloomed = SpanDedup.removeDuplicateSpans(in, "id", col("toks"), K,
        numSalts = 1, bloomExpectedDupGrams = 64L)
      .orderBy($"id").as[(Long, String, Int)].collect().toSeq
    assert(bloomed == plain)
    // and the probe actually sits in the plan (a Filter with the bloom UDF
    // on the stream side, BEFORE the marking exchange)
    val plan = SpanDedup.duplicateSpanStarts(in, "id", col("toks"), K,
        numSalts = 1, bloomExpectedDupGrams = 64L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("UDF"), s"expected the bloom probe filter:\n$plan")
  }

  test("salted + bloom compose (both escape hatches at once, same result)") {
    val in = docs(
      (1L, "a b c d e"), (2L, "z a b c d w"), (4L, "a b c d e"))
    val both = SpanDedup.removeDuplicateSpans(in, "id", col("toks"), K,
        numSalts = 4, bloomExpectedDupGrams = 64L)
      .orderBy($"id").as[(Long, String, Int)].collect().toSeq
    assert(both == run(in))
  }

  test("rebuild never shuffles the token stream (map-side survivor selection)") {
    // round-8 redesign: the old rebuild posexploded every token, anti-joined
    // on (doc, pos) and collect_list'd back — two corpus-sized exchanges of
    // L× more rows than documents. The new plan may exchange on the gram key
    // and the doc id only; any hashpartitioning carrying `pos` (the old
    // anti-join key) or a collect_list(struct(pos, tok)) is a regression.
    val plan = SpanDedup.removeDuplicateSpans(
        docs((1L, "a b c x"), (2L, "y a b c")), "id", col("toks"), K)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list(struct"),
      s"token-stream rebuild crept back:\n$plan")
    assert(!"hashpartitioning\\([^)]*\\bpos\\b".r.findFirstIn(plan).isDefined,
      s"(doc, pos)-keyed exchange crept back:\n$plan")
  }

  test("first-occurrence selection is a partial hash aggregate, never a window sort") {
    val in = docs((1L, "a b c"), (2L, "a b c"))
    val plan = SpanDedup.duplicateSpanStarts(in, "id", col("toks"), K)
      .queryExecution.executedPlan.toString
    // a boilerplate gram in every doc must collapse map-side (partial min
    // over the packed long), not sort all its copies on one executor
    assert(plan.contains("partial_min"), s"expected map-side partial min:\n$plan")
    assert(!plan.contains("Window"), s"window formulation is the skew trap:\n$plan")
    assert(!plan.contains("SortAggregate"), s"packed min must stay hash-based:\n$plan")
  }

  test("marking is an equi shuffle join on gram — never a cartesian") {
    // at corpus scale the firsts table has one row per DISTINCT gram —
    // never broadcastable — so the at-scale plan is an equi shuffle join on
    // gram; pin that shape here (tiny specs would otherwise broadcast) and
    // assert the gram stream crosses the wire exactly twice: once as
    // map-combined aggregate partials, once as raw occurrences for marking
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val in = docs((1L, "a b c d"), (2L, "c d e f"))
      val plan = SpanDedup.duplicateSpanStarts(in, "id", col("toks"), K)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
        s"marking must stay an equi join:\n$plan")
      val gramShuffles = "Exchange hashpartitioning\\(__g".r
        .findAllIn(plan).size
      assert(gramShuffles == 2,
        s"expected exactly 2 gram-keyed exchanges (partials + occurrences), got $gramShuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("the marking join's fused aggregate blocks AQE skew split — salting is the skew path") {
    // Measured fact (round 6): AQE's OptimizeSkewedJoin pattern needs the
    // join children to be bare shuffle reads, and SpanDedup's final
    // aggregate fuses into the join stage (the one-shuffle win), so even
    // an every-doc hot gram is NEVER AQE-split here. Pin that the fused
    // shape is what we ship (one gram-keyed exchange feeding both agg and
    // join) so a regression to a second shuffle is loud, and that the
    // documented escape hatch — numSalts — actually spreads the key.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val boiler = (0 until 8).map(i => lit(s"b$i"))
      val hot = spark.range(2000).select($"id".as("doc_id"),
        array(boiler :+ concat(lit("u_"), $"id"): _*).as("toks"))
      val plain = SpanDedup.duplicateSpanStarts(hot, "doc_id", col("toks"), 8)
      val salted = SpanDedup.duplicateSpanStarts(hot, "doc_id", col("toks"), 8,
        numSalts = 4)
      // identical results
      assert(salted.orderBy($"doc_id", $"pos").collect().toSeq ==
        plain.orderBy($"doc_id", $"pos").collect().toSeq)
      // salted plan joins on (__g, __salt): the hot gram spreads over
      // numSalts reducers instead of one
      val saltedPlan = salted.queryExecution.executedPlan.toString
      assert(saltedPlan.contains("__salt"),
        s"salted marking must key the join on (__g, __salt):\n$saltedPlan")
      // and the default form keeps the one-shuffle fused-aggregate shape
      val plainPlan = plain.queryExecution.executedPlan.toString
      val gramShuffles = "Exchange hashpartitioning\\(__g".r
        .findAllIn(plainPlan).size
      assert(gramShuffles == 2,
        s"default marking must keep the fused one-exchange-per-side shape:\n$plainPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
