package graft.features

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{DoubleParam, ParamMap, StringArrayParam}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.StructType

/** FillMissing as a pipeline stage (reference: NVTabular ops.FillMissing(0),
  * workflow_builder.py:27,65; SURVEY §2.8 F2): null → constant on numeric
  * columns, in place. Stateless Transformer (no fit), composable with
  * CategorifyEstimator / Bucketizer / ZScoreEstimator in one Pipeline.
  */
class FillMissing(override val uid: String) extends Transformer {
  def this() = this(Identifiable.randomUID("fillmissing"))

  final val inputCols = new StringArrayParam(this, "inputCols", "columns to fill")
  final val fillValue = new DoubleParam(this, "fillValue", "replacement for nulls")
  setDefault(fillValue -> 0.0)

  def setInputCols(cols: Array[String]): this.type = set(inputCols, cols)
  def setFillValue(v: Double): this.type = set(fillValue, v)

  override def transform(dataset: Dataset[_]): DataFrame =
    dataset.toDF().na.fill($(fillValue), $(inputCols))

  override def transformSchema(schema: StructType): StructType = schema

  override def copy(extra: ParamMap): FillMissing = defaultCopy(extra)
}
