package graft.features

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class HashBucketSpec extends SparkSpecBase {
  import spark.implicits._

  test("buckets land in [0, D), spread over most buckets, and are value-determined") {
    val parts = tbl("part", sfDirMid)
    // p_partkey: 2000 distinct values into 64 buckets — all should be hit
    val b = HashBucket.bucketize(parts.select($"p_partkey", $"p_type"),
      Seq("p_partkey" -> 64, "p_type" -> 64))
    val stats = b.agg(min($"p_partkey_bucket"), max($"p_partkey_bucket"),
      countDistinct($"p_partkey_bucket")).head()
    assert(stats.getInt(0) >= 0 && stats.getInt(1) < 64)
    assert(stats.getLong(2) == 64, s"2000 keys should hit all 64 buckets, got ${stats.getLong(2)}")
    // same value => same bucket, regardless of which row carries it
    val perValue = b.groupBy($"p_type").agg(countDistinct($"p_type_bucket").as("n"))
    assert(perValue.filter($"n" > 1).isEmpty)
  }

  test("null values pass through as null buckets") {
    val df = Seq(Some("x"), None).toDF("c")
    val out = HashBucket.bucketize(df, Seq("c" -> 8)).select($"c_bucket").collect()
    assert(out.count(_.isNullAt(0)) == 1 && out.count(!_.isNullAt(0)) == 1)
  }
}
