package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpecBase {
  import spark.implicits._

  private val K = 8
  private val W = 4

  // independent reference: same normalization, DIRECT Horner-form
  // polynomial hash (no rolling update — a different code path from the
  // RollingHashF kernel), and leftmost-minimal window selection
  private def hDirect(cps: Array[Int], i: Int): Long =
    (0 until K).foldLeft(0L)((h, j) =>
      (h * graft.sql.RollingHashF.Base + cps(i + j)) % graft.sql.RollingHashF.Mod)

  private def reference(text: String): Set[(Int, Long)] = {
    val t = text.trim.toLowerCase.replaceAll("\\s+", " ")
    val cps = t.codePoints().toArray
    if (cps.length < K) return Set.empty
    val grams = (0 to cps.length - K).map(i => hDirect(cps, i))
    if (grams.length < W) return Set.empty
    (0 to grams.length - W).map { s =>
      (s until s + W).map(p => (grams(p), p)).min
    }.toSet.map((hp: (Long, Int)) => (hp._2, hp._1))
  }

  private def run(rows: (Long, String)*): Map[Long, Set[(Int, Long)]] =
    Winnowing.fingerprints(rows.toSeq.toDF("id", "text"), "id", "text", K, W)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap

  test("selection matches the independent reference on real documents") {
    val docs = tbl("documents").select($"doc_id", $"text")
      .orderBy($"doc_id").limit(20).as[(Long, String)].collect().toSeq
    val got = run(docs: _*)
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) == reference(text),
        s"doc $id diverged from the reference winnow")
    }
  }

  test("any shared substring of length >= k+w-1 shares a fingerprint hash") {
    val shared = "zqxjkvbw mfplty" // 15 chars >= K+W-1 = 11
    val a = s"aaaa bbbb $shared cccc dddd"
    val b = s"eeee $shared ffff gggg hhhh iiii"
    val got = run(1L -> a, 2L -> b)
    val hashes = (m: Set[(Int, Long)]) => m.map(_._2)
    assert(hashes(got(1L)).intersect(hashes(got(2L))).nonEmpty,
      "the winnowing guarantee: a >= k+w-1 match must share a fingerprint")
  }

  test("density: at least one selection per w disjoint windows, at most one per window") {
    val text = (1 to 50).map(i => s"w$i").mkString(" ")
    val t = text.trim.toLowerCase.replaceAll("\\s+", " ")
    val nWindows = (t.length - K + 1) - W + 1
    val n = run(1L -> text)(1L).size
    assert(n <= nWindows && n >= nWindows / W,
      s"$n fingerprints vs $nWindows windows breaks winnowing density bounds")
  }

  test("documents shorter than k + w - 1 produce no fingerprints") {
    assert(run(1L -> "tiny", 2L -> "under11ch").isEmpty)
  }

  test("all windows are per-document: no global window, no corpus sort") {
    val plan = Winnowing.fingerprints(
        Seq((1L, "some sufficiently long text here")).toDF("id", "text"),
        "id", "text", K, W)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(id"),
      s"windows must partition by the document id:\n$plan")
  }
}
