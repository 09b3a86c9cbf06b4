package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.MetadataBuilder

/** Semantic column tags carried in StructField.metadata (reference:
  * ops.AddMetadata(tags=[...]) / schema.select_by_tag(Tags.USER),
  * workflow_builder.py:18-68, my_merlin_flow.py:307-310; SURVEY §1.1/F6).
  * Tags drive model wiring (which columns feed the user tower vs the item
  * tower) without positional contracts.
  */
object TagMetadata {

  val TagsKey = "graft.tags"

  /** Attach tags to a column (merged with any existing tags). */
  def addTags(df: DataFrame, column: String, tags: Seq[String]): DataFrame = {
    val existing = tagsOf(df, column)
    val md = new MetadataBuilder()
      .withMetadata(df.schema(column).metadata)
      .putStringArray(TagsKey, (existing ++ tags).distinct.toArray)
      .build()
    df.withColumn(column, col(column).as(column, md))
  }

  def tagsOf(df: DataFrame, column: String): Seq[String] = {
    val md = df.schema(column).metadata
    if (md.contains(TagsKey)) md.getStringArray(TagsKey).toSeq else Seq.empty
  }

  /** Columns carrying `tag` (select_by_tag). */
  def columnsByTag(df: DataFrame, tag: String): Seq[String] =
    df.schema.fields.collect {
      case f if f.metadata.contains(TagsKey) &&
        f.metadata.getStringArray(TagsKey).contains(tag) => f.name
    }.toSeq

  def selectByTag(df: DataFrame, tag: String): DataFrame = {
    val cols = columnsByTag(df, tag)
    require(cols.nonEmpty, s"no column tagged '$tag'")
    df.select(cols.map(col): _*)
  }

  /** F12 ToTarget: move a column to the conventional `label` slot. */
  def toTarget(df: DataFrame, column: String): DataFrame =
    df.withColumnRenamed(column, "label")
}
