package graft.dedup

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class SetSimJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("id", "text").select($"id", split($"text", " ").as("toks"))

  /** Brute-force reference: all pairs, exact rational Jaccard. */
  private def brute(rows: Seq[(Long, String)], tNum: Long, tDen: Long)
      : Set[(Long, Long, Int, Int)] = {
    val sets = rows.map { case (id, s) => id -> s.split(" ").toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size; uni = (sa | sb).size
      if uni > 0 && tDen * inter >= tNum * uni
    } yield (ia, ib, inter, uni)).toSet
  }

  private def run(rows: Seq[(Long, String)], tNum: Long, tDen: Long)
      : Set[(Long, Long, Int, Int)] =
    SetSimJoin.selfJoin(docs(rows: _*), "id", col("toks"), tNum, tDen)
      .select($"id_a", $"id_b", $"n_inter", $"n_union")
      .as[(Long, Long, Int, Int)].collect().toSet

  private val fixture = Seq(
    (1L, "a b c d"),
    (2L, "a b c e"),      // J(1,2)=3/5
    (3L, "a b c d"),      // exact dup of 1
    (4L, "x y z"),        // disjoint from 1-3
    (5L, "x y z w v"),    // J(4,5)=3/5
    (6L, "q"),            // singleton
    (7L, "q"),            // exact dup singleton
    (8L, "a q"),          // J(6,8)=1/2
    (9L, "m n o p r s t u"))

  test("matches brute force exactly across thresholds (prefix filter loses nothing)") {
    for ((n, d) <- Seq((1L, 2L), (3L, 5L), (2L, 3L), (9L, 10L), (1L, 1L)))
      assert(run(fixture, n, d) == brute(fixture, n, d), s"t=$n/$d")
  }

  test("rational threshold is decided by integer cross-multiplication, not float compare") {
    // J(1,2) = 3/5 exactly: must be INCLUDED at t=3/5 and excluded at 61/100
    assert(run(fixture, 3L, 5L).contains((1L, 2L, 3, 5)))
    assert(!run(fixture, 61L, 100L).contains((1L, 2L, 3, 5)))
  }

  test("within-document duplicate tokens use set semantics") {
    val out = run(Seq((1L, "a a b b"), (2L, "a b")), 1L, 1L)
    assert(out == Set((1L, 2L, 2, 2)))
  }

  test("result is invariant to input partitioning") {
    val df = docs(fixture: _*)
    val a = SetSimJoin.selfJoin(df.repartition(7), "id", col("toks"), 1L, 2L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val b = SetSimJoin.selfJoin(df.coalesce(1), "id", col("toks"), 1L, 2L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("candidate generation is an equi join on prefix tokens — never a cartesian") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = SetSimJoin.selfJoin(docs(fixture: _*), "id", col("toks"), 1L, 2L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
        s"must stay an equi join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("positional filter (PPJoin §3.2) prunes candidates the length filter keeps — losslessly") {
    // 20 docs {u_ia, u_ib, sh, the}: canonical order puts the uniques
    // (df=1) first, the shared token sh (df=20) at position 3, the
    // boilerplate at 4. Prefix length = 4 - ceil(4/2) + 1 = 3, so every
    // pair is a PLAIN prefix candidate via sh; positionally the bound is
    // 1 + min(4-3, 4-3) = 2 < α = ceil(1·8/3) = 3, so ALL 190 die before
    // verification. Brute force agrees nothing was lost (J = 2/6 < 1/2).
    val family = (1L to 20L).map(i => (i, s"u${i}a u${i}b sh the"))
    val base = SetSimJoin.prepared(docs(family: _*), "id", col("toks"))
    val plain = SetSimJoin.candidatePairs(base, 1L, 2L, positional = false).count()
    val pos = SetSimJoin.candidatePairs(base, 1L, 2L, positional = true).count()
    assert(plain == 190L, s"every pair must be a plain prefix candidate: $plain")
    assert(pos == 0L, s"positional filter must kill them all: $pos")
    assert(run(family, 1L, 2L) == brute(family, 1L, 2L))

    // mixed corpus (true near-dups + the prunable family): candidates
    // strictly shrink, results stay exactly brute-force
    val mixed = fixture ++ family.map { case (i, s) => (i + 100L, s) }
    val mixedBase = SetSimJoin.prepared(docs(mixed: _*), "id", col("toks"))
    val mp = SetSimJoin.candidatePairs(mixedBase, 1L, 2L, positional = false).count()
    val mq = SetSimJoin.candidatePairs(mixedBase, 1L, 2L, positional = true).count()
    assert(mq < mp, s"positional must reduce candidate volume: $mq !< $mp")
    assert(run(mixed, 1L, 2L) == brute(mixed, 1L, 2L))
  }

  test("a frequent token never enters a short prefix (rare-first order bounds candidates)") {
    // 50 docs all share boilerplate token "the" plus a unique token; with
    // t=1/2 each 2-token doc's prefix has length 2-1+1=2... use 4-token
    // docs: 3 unique + "the" -> prefix = 4 - 2 + 1 = 3 rarest tokens =
    // the uniques, so the hot token generates no candidate pairs at all
    val rows = (1L to 50L).map(i => (i, s"the u${i}a u${i}b u${i}c"))
    val out = run(rows, 1L, 2L)
    assert(out.isEmpty)
    // and brute force agrees there is genuinely nothing to find
    assert(brute(rows, 1L, 2L).isEmpty)
  }
}
