package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-length training-example packing: lay the corpus's token stream
  * end-to-end in a deterministic document order and cut it into examples
  * of EXACTLY `exampleLen` tokens, splitting documents across example
  * boundaries — the GPT-style pre-training data layout ("concatenate and
  * chunk"), complementary to [[ShardPack]] (which never splits a row and
  * packs to an approximate budget). Output is the span table a writer
  * needs: which slice of which document lands where in which example.
  * Extension scope — no reference counterpart.
  *
  * All arithmetic is exact integer division over [[ShardPack.cumsum]]'s
  * two-level distributed prefix sum, so the layout is bit-reproducible by
  * any engine's window cumsum — and there is still no single-partition
  * global window anywhere. A document of n tokens overlaps exactly
  * ⌈(off + n)/S⌉ − ⌊off/S⌋ examples, so the explode is sized by the
  * answer, not the corpus.
  */
object ExamplePack {

  /** Span rows (idCol, example_id, off_in_doc, off_in_example, len):
    * `exampleLen`-token examples over documents laid out in (`orderCol`,
    * `tieBreak`*) order, weighted by `weight` tokens each. Zero-weight
    * documents produce no spans. Every example except the stream's last
    * is exactly full. */
  def packExamples(df: DataFrame, idCol: String, weight: Column,
      exampleLen: Long, orderCol: String, tieBreak: Seq[Column] = Nil,
      buckets: Int = 256): DataFrame = {
    require(exampleLen > 0, s"exampleLen must be positive: $exampleLen")
    val S = lit(exampleLen)
    ShardPack.cumsum(df, orderCol, weight, "__cum", buckets, tieBreak)
      .withColumn("__n", weight.cast("long"))
      .filter(col("__n") > 0)
      .withColumn("__excl", col("__cum") - col("__n"))
      .withColumn("example_id",
        explode(sequence(expr(s"__excl DIV ${exampleLen}L"),
          expr(s"(__cum - 1) DIV ${exampleLen}L"))))
      .withColumn("__exStart", col("example_id") * S)
      .withColumn("off_in_doc",
        greatest(col("__exStart") - col("__excl"), lit(0L)))
      .withColumn("off_in_example",
        greatest(col("__excl") - col("__exStart"), lit(0L)))
      .withColumn("len",
        least(col("__exStart") + S, col("__cum"))
          - greatest(col("__exStart"), col("__excl")))
      .select(col(idCol), col("example_id").cast("int").as("example_id"),
        col("off_in_doc").cast("int").as("off_in_doc"),
        col("off_in_example").cast("int").as("off_in_example"),
        col("len").cast("int").as("len"))
  }
}
