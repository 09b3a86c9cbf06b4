package graft.features

import graft.SparkSpecBase
import org.apache.spark.ml.feature.Bucketizer
import org.apache.spark.sql.functions._

/** Verifies that the expression-form bucketizer used by q12 (left-closed
  * [s_i, s_{i+1}) buckets) agrees with spark.ml's Bucketizer on every
  * boundary value — the semantics NVTabular's ops.Bucketize declares
  * (reference: workflow_builder.py:26-27).
  */
class BucketizeSpec extends SparkSpecBase {
  import spark.implicits._

  test("expression bucketizer matches ml.Bucketizer on boundaries and interiors") {
    val splits = (0 to 9).map(_ * 1000.0)
    val values = Seq(-500.0, 0.0, 1.0, 999.999, 1000.0, 4999.0, 5000.0,
      8999.99, 9000.0, 12345.0)
    val df = values.toDF("x")

    val exprBucket = splits.zipWithIndex.reverse.foldLeft(lit(10)) {
      case (acc, (b, i)) => when(col("x") < lit(b), lit(i)).otherwise(acc)
    }
    val ours = df.select(col("x"), exprBucket.as("bucket"))

    val ml = new Bucketizer()
      .setInputCol("x").setOutputCol("mlb")
      .setSplits((Double.NegativeInfinity +: splits :+ Double.PositiveInfinity).toArray)
      .transform(df)
      .select(col("x"), col("mlb").cast("int").as("bucket"))

    assert(ours.exceptAll(ml).isEmpty && ml.exceptAll(ours).isEmpty)
  }
}
