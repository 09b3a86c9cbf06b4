package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class CorpusShuffleSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = tbl("documents").select(col("doc_id"), col("n_chars"))

  test("cumsum with tie-break matches the single-window form under heavy ties") {
    // an all-ties order key: the prefix sum is defined ONLY by the tie-break
    val tied = docs.withColumn("k", col("doc_id") % 3)
    val ref = tied.withColumn("cum",
      sum(col("n_chars").cast("long")).over(
        Window.orderBy(col("k"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("doc_id").select("doc_id", "cum").as[(Long, Long)].collect().toSeq
    for (buckets <- Seq(1, 7, 256)) {
      val got = ShardPack.cumsum(tied, "k", col("n_chars"), "cum", buckets,
          tieBreak = Seq(col("doc_id")))
        .orderBy("doc_id").select("doc_id", "cum").as[(Long, Long)].collect().toSeq
      assert(got == ref, s"buckets=$buckets diverged under ties")
    }
  }

  test("the shuffle permutation is deterministic, seed-sensitive, and id-complete") {
    val a = CorpusShuffle.shuffledShards(docs, "doc_id", col("n_chars"), "s1", 5000L)
      .select("doc_id", "shuffle_key", "shard_id").as[(Long, Long, Int)]
      .collect().toSeq.sortBy(_._1)
    val b = CorpusShuffle.shuffledShards(docs.repartition(11), "doc_id",
        col("n_chars"), "s1", 5000L)
      .select("doc_id", "shuffle_key", "shard_id").as[(Long, Long, Int)]
      .collect().toSeq.sortBy(_._1)
    assert(a == b, "same seed must reproduce identical shards across partitionings")
    val c = CorpusShuffle.shuffledShards(docs, "doc_id", col("n_chars"), "s2", 5000L)
      .select("doc_id", "shuffle_key").as[(Long, Long)].collect().toMap
    val aKeys = a.map(t => t._1 -> t._2).toMap
    assert(c != aKeys, "a different seed must yield a different permutation")
    assert(a.map(_._1) == docs.select("doc_id").as[Long].collect().toSeq.sorted,
      "every document appears exactly once")
  }

  test("the shuffle actually breaks id order") {
    val keys = CorpusShuffle.shuffledShards(docs, "doc_id", col("n_chars"), "s1", 5000L)
      .orderBy("doc_id").select("shuffle_key").as[Long].collect().toSeq
    assert(keys != keys.sorted, "hashed order must not follow id order")
  }

  test("shards pack to budget in shuffled order with no single-partition window") {
    val budget = 5000L
    val out = CorpusShuffle.shuffledShards(docs, "doc_id", col("n_chars"), "s1", budget)
    val shards = out.groupBy("shard_id")
      .agg(sum(col("n_chars").cast("long")).as("w"), max(col("n_chars")).as("mx"))
      .collect()
    shards.foreach { r =>
      assert(r.getLong(1) < budget + r.getLong(2),
        s"shard ${r.getInt(0)} weight ${r.getLong(1)} exceeds budget+maxRow")
    }
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(__g"),
      s"the heavy window must stay bucket-partitioned:\n$plan")
  }
}
