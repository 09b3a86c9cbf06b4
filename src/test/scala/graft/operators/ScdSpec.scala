package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpecBase {
  import spark.implicits._

  test("upsert: updates replace, new keys insert, untouched rows carry over") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "attr", "v")
    val updates = Seq((2L, "B", 21.0), (9L, "z", 90.0)).toDF("k", "attr", "v")
    val out = Scd.upsert(target, updates, Seq("k"))
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "a", 10.0), (2L, "B", 21.0), (3L, "c", 30.0), (9L, "z", 90.0)))
  }

  private def dimOf(rows: Seq[(Long, String, Long, Option[Long])]): DataFrame =
    rows.toDF("k", "attr", "valid_from", "valid_to")

  private def apply1(dim: DataFrame, changes: Seq[(Long, String, Long)]): Set[(Long, String, Long, Option[Long])] =
    Scd.scd2Apply(dim, changes.toDF("k", "attr", "ts"), Seq("k"), Seq("attr"), "ts")
      .as[(Long, String, Long, Option[Long])].collect().toSet

  test("scd2Apply versions changed keys, ignores no-op re-asserts, inserts unknown keys") {
    val dim = dimOf(Seq(
      (1L, "old", 0L, None), (2L, "same", 0L, None),
      (3L, "hist", 0L, Some(5L)), (3L, "cur", 5L, None)))
    val out = apply1(dim, Seq(
      (1L, "new", 10L), // real change -> close + open
      (2L, "same", 10L), // no-op -> nothing versioned
      (7L, "fresh", 10L))) // unknown key -> insert open
    assert(out == Set(
      (1L, "old", 0L, Some(10L)), (1L, "new", 10L, None),
      (2L, "same", 0L, None),
      (3L, "hist", 0L, Some(5L)), (3L, "cur", 5L, None),
      (7L, "fresh", 10L, None)))
  }

  test("scd2Apply is idempotent: re-applying the same batch changes nothing") {
    val dim = dimOf(Seq((1L, "a", 0L, None), (2L, "b", 0L, None)))
    val batch = Seq((1L, "a2", 10L), (3L, "c", 10L))
    val once = apply1(dim, batch)
    val twice = apply1(dimOf(once.toSeq.map(t => (t._1, t._2, t._3, t._4))), batch)
    assert(once == twice, "second apply of an identical batch must be a no-op")
  }

  test("scd2Apply: the latest change per key in a batch wins") {
    val dim = dimOf(Seq((1L, "a", 0L, None)))
    val out = apply1(dim, Seq((1L, "mid", 5L), (1L, "late", 9L), (1L, "early", 2L)))
    assert(out == Set((1L, "a", 0L, Some(9L)), (1L, "late", 9L, None)))
  }

  test("scd2 intervals feed asOf point-in-time lookups") {
    // versioned dim after two changes; as-of queries read the value valid at t
    val dim = dimOf(Seq((1L, "v0", 0L, Some(10L)), (1L, "v1", 10L, Some(20L)),
      (1L, "v2", 20L, None)))
    val spine = Seq((100L, 1L, 5L), (101L, 1L, 10L), (102L, 1L, 25L))
      .toDF("qid", "k", "t")
    val out = AsOfJoin.asOf(spine,
        dim.select($"k", $"valid_from", $"attr"), Seq("k"),
        "t", "valid_from", Seq("attr"))
      .select($"qid", $"asof_attr").as[(Long, String)].collect().toMap
    assert(out == Map(100L -> "v0", 101L -> "v1", 102L -> "v2"))
  }
}
