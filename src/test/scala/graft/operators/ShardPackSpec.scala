package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ShardPackSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = tbl("documents").select(col("doc_id"), col("n_chars"))

  test("cumsum is bit-identical to the single-partition window form") {
    val ref = docs.withColumn("cum",
      sum(col("n_chars").cast("long")).over(
        Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("doc_id").select("doc_id", "cum").as[(Long, Long)].collect().toSeq
    for (buckets <- Seq(1, 7, 256)) {
      val got = ShardPack.cumsum(docs, "doc_id", col("n_chars"), "cum", buckets)
        .orderBy("doc_id").select("doc_id", "cum").as[(Long, Long)].collect().toSeq
      assert(got == ref, s"buckets=$buckets diverged from the reference window")
    }
  }

  test("cumsum is invariant to input partitioning") {
    val ref = ShardPack.cumsum(docs, "doc_id", col("n_chars"), "cum")
      .orderBy("doc_id").select("cum").as[Long].collect().toSeq
    val got = ShardPack.cumsum(docs.repartition(13), "doc_id", col("n_chars"), "cum")
      .orderBy("doc_id").select("cum").as[Long].collect().toSeq
    assert(got == ref)
  }

  test("the per-bucket window is partitioned; only the offset window is global") {
    val plan = ShardPack.cumsum(docs, "doc_id", col("n_chars"), "cum")
      .queryExecution.optimizedPlan.toString
    // the row-level window must carry the bucket partition spec
    assert(plan.contains("windowspecdefinition(__g"),
      s"expected the heavy window partitioned by __g:\n$plan")
  }

  test("assignShards packs to budget: no shard exceeds budget + one row") {
    val budget = 5000L
    val shards = ShardPack.assignShards(docs, "doc_id", col("n_chars"), budget)
      .groupBy("shard_id")
      .agg(sum(col("n_chars").cast("long")).as("w"), max(col("n_chars")).as("mx"))
      .collect()
    assert(shards.nonEmpty)
    shards.foreach { r =>
      assert(r.getLong(1) < budget + r.getLong(2),
        s"shard ${r.getInt(0)} weight ${r.getLong(1)} exceeds budget+maxRow")
    }
    // shard ids are contiguous from 0
    val ids = shards.map(_.getInt(0)).sorted
    assert(ids.head == 0 && ids.last == ids.length - 1)
  }

  test("rows are never split and order is respected across shard boundaries") {
    val assigned = ShardPack.assignShards(docs, "doc_id", col("n_chars"), 5000L)
      .orderBy("doc_id").select("shard_id").as[Int].collect().toSeq
    // shard ids are non-decreasing in key order
    assert(assigned.zip(assigned.tail).forall { case (a, b) => a <= b })
  }

  test("empty input yields an empty result, not a crash") {
    val empty = docs.filter(lit(false))
    assert(ShardPack.cumsum(empty, "doc_id", col("n_chars"), "cum").count() == 0)
  }

  test("manifest: counts/weights/xor re-derive identically from the shards") {
    val shards = ShardPack.assignShards(docs, "doc_id", col("n_chars"), 5000L)
    val m1 = ShardPack.manifest(shards, "shard_id", "doc_id", col("n_chars"))
    val m2 = ShardPack.manifest(shards.repartition(7), "shard_id", "doc_id", col("n_chars"))
    assert(m1.exceptAll(m2).isEmpty && m2.exceptAll(m1).isEmpty,
      "manifest must be partitioning-invariant")
    assert(m1.agg(sum($"n_rows")).head.getLong(0) === docs.count())
  }

  test("manifest catches a dropped and a duplicated row") {
    val shards = ShardPack.assignShards(docs, "doc_id", col("n_chars"), 5000L)
    val good = ShardPack.manifest(shards, "shard_id", "doc_id", col("n_chars"))
    val dropped = ShardPack.manifest(
      shards.filter($"doc_id" =!= 7L), "shard_id", "doc_id", col("n_chars"))
    val duped = ShardPack.manifest(
      shards.unionAll(shards.filter($"doc_id" === 7L)),
      "shard_id", "doc_id", col("n_chars"))
    assert(good.exceptAll(dropped).count() > 0, "a dropped row must change the manifest")
    assert(good.exceptAll(duped).count() > 0, "a duplicated row must change the manifest")
  }

  test("releaseDiff labels added/removed/changed/unchanged correctly") {
    def m(rows: Seq[(Int, Long, Long, Long)]) =
      rows.toDF("shard_id", "n_rows", "sum_weight", "content_xor")
    val a = m(Seq((0, 10L, 500L, 111L), (1, 10L, 480L, 222L), (2, 4L, 200L, 333L)))
    val b = m(Seq((0, 10L, 500L, 111L), (1, 9L, 480L, 999L), (3, 2L, 90L, 444L)))
    val st = ShardPack.releaseDiff(a, b).collect()
      .map(r => r.getInt(0) -> r.getString(7)).toMap
    assert(st === Map(0 -> "unchanged", 1 -> "changed", 2 -> "removed", 3 -> "added"))
  }

  test("releaseDiff: identical releases are all unchanged; xor-only drift is changed") {
    val shards = ShardPack.assignShards(docs, "doc_id", col("n_chars"), 5000L)
    val man = ShardPack.manifest(shards, "shard_id", "doc_id", col("n_chars"))
    val same = ShardPack.releaseDiff(man, man)
    assert(same.filter($"status" =!= "unchanged").count() === 0)
    // same counts/weights, different members → xor flags it
    val swapped = ShardPack.manifest(
      shards.withColumn("doc_id",
        when($"doc_id" === 1L, lit(100001L)).otherwise($"doc_id")),
      "shard_id", "doc_id", col("n_chars"))
    assert(ShardPack.releaseDiff(man, swapped)
      .filter($"status" === "changed").count() >= 1)
  }
}
