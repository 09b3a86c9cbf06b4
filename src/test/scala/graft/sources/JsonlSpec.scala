package graft.sources

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonlSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_jsonl_spec").toString

  test("documents round-trip losslessly, including escapes and unicode") {
    val docs = Seq(
      (1L, "plain text"),
      (2L, "quotes \" and \\ backslashes \t tabs\nnewlines"),
      (3L, "unicode: żółć 中文 🙂"),
      (4L, "")).toDF("doc_id", "text")
    val dir = tmp()
    Jsonl.write(docs, s"$dir/d", shards = 2)
    val back = Jsonl.read(spark, s"$dir/d", docs.schema)
      .drop("_corrupt_record")
      .orderBy($"doc_id").as[(Long, String)].collect().toSeq
    assert(back == Seq((1L, "plain text"),
      (2L, "quotes \" and \\ backslashes \t tabs\nnewlines"),
      (3L, "unicode: żółć 中文 🙂"), (4L, "")))
  }

  test("malformed lines quarantine into _corrupt_record instead of failing") {
    val dir = tmp()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "good"}""",
        """{"doc_id": 2, "text": "trunca""",  // malformed
        """{"doc_id": 3, "text": "also good"}"""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val rows = Jsonl.read(spark, dir, schema)
      .select($"doc_id", $"text", $"_corrupt_record".isNotNull.as("bad"))
      .orderBy($"doc_id".asc_nulls_last)
      .as[(Option[Long], Option[String], Boolean)].collect().toSeq
    assert(rows.count(!_._3) == 2, s"two clean rows expected: $rows")
    assert(rows.count(_._3) == 1, s"one quarantined row expected: $rows")
  }

  test("read never infers: the scan schema is exactly the declared one") {
    val dir = tmp()
    Jsonl.write(Seq((1L, "t")).toDF("doc_id", "text"), s"$dir/d")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val got = Jsonl.read(spark, s"$dir/d", schema)
    assert(got.schema.fieldNames.toSeq ==
      Seq("doc_id", "text", "_corrupt_record"))
  }
}
