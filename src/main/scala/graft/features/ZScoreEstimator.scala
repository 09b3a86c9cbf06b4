package graft.features

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{Param, ParamMap, Params}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-score standardization as an Estimator/Model on a plain double column
  * (reference: NVTabular ops.Normalize, workflow_builder.py:66; SURVEY §2.8
  * F5) — fit learns (mean, stddev) in one aggregate, transform applies
  * (x − μ)/σ. Kept scalar-column-native (no VectorAssembler detour) so the
  * transform stays inside whole-stage codegen.
  */
trait ZScoreParams extends Params {
  final val inputCol = new Param[String](this, "inputCol", "column to standardize")
  final val outputCol = new Param[String](this, "outputCol", "output column")
  def getInputCol: String = $(inputCol)
}

class ZScoreEstimator(override val uid: String)
    extends Estimator[ZScoreModel] with ZScoreParams {
  def this() = this(Identifiable.randomUID("zscore"))
  def setInputCol(c: String): this.type = set(inputCol, c)
  def setOutputCol(c: String): this.type = set(outputCol, c)

  override def fit(dataset: Dataset[_]): ZScoreModel = {
    val row = dataset.toDF()
      .agg(avg(col($(inputCol))), stddev_samp(col($(inputCol)))).head()
    copyValues(new ZScoreModel(uid, row.getDouble(0), row.getDouble(1)).setParent(this))
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField($(outputCol), DoubleType))

  override def copy(extra: ParamMap): ZScoreEstimator = defaultCopy(extra)
}

class ZScoreModel(override val uid: String, val mean: Double, val std: Double)
    extends Model[ZScoreModel] with ZScoreParams {

  override def transform(dataset: Dataset[_]): DataFrame =
    dataset.toDF().withColumn($(outputCol),
      (col($(inputCol)) - lit(mean)) / lit(std))

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField($(outputCol), DoubleType))

  override def copy(extra: ParamMap): ZScoreModel =
    copyValues(new ZScoreModel(uid, mean, std).setParent(parent), extra)
}
