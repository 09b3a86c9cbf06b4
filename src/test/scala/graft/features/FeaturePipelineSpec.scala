package graft.features

import graft.SparkSpecBase
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.Bucketizer
import org.apache.spark.sql.functions._

class FeaturePipelineSpec extends SparkSpecBase {
  import spark.implicits._

  test("CategorifyEstimator: multi-column fit, OOV/null -> 0, persisted dictionaries") {
    val train = Seq(("x", "m"), ("x", "m"), ("y", "m"), ("y", "n")).toDF("a", "b")
    val tmp = java.nio.file.Files.createTempDirectory("catest").toString
    val model = new CategorifyEstimator()
      .setInputCols(Array("a", "b")).setDictDir(tmp)
      .fit(train)
    val out = model.transform(Seq(("x", "zzz"), (null, "m")).toDF("a", "b"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 0L), (0L, 1L)), "x is most frequent -> 1; OOV/null -> 0")
    val persisted = Categorify.loadDictionary(spark, tmp, "a")
    assert(persisted.orderBy("id").as[(String, Long)].collect().toSeq ==
      Seq(("x", 1L), ("y", 2L)))
  }

  test("Pipeline assembly: Categorify + Bucketizer + ZScore compose and fit on union") {
    val train = Seq(("m", 10.0), ("n", 20.0)).toDF("seg", "bal")
    val test = Seq(("m", 40.0)).toDF("seg", "bal")
    val pipeline = new Pipeline().setStages(Array(
      new CategorifyEstimator().setInputCols(Array("seg")),
      new Bucketizer().setInputCol("bal").setOutputCol("bal_bucket")
        .setSplits(Array(Double.NegativeInfinity, 15.0, 35.0, Double.PositiveInfinity)),
      new ZScoreEstimator().setInputCol("bal").setOutputCol("bal_z")))
    val (model, Seq(trOut, teOut)) = FeaturePipeline.fitOnUnion(pipeline, Seq(train, test))
    assert(trOut.columns.toSet == Set("seg", "bal", "seg_id", "bal_bucket", "bal_z"))
    // fit-on-union: mean/std computed over all three values 10, 20, 40
    val mean = (10.0 + 20.0 + 40.0) / 3
    val z = teOut.select("bal_z").as[Double].head()
    val zs = model.stages.collectFirst { case m: ZScoreModel => m }.get
    assert(math.abs(zs.mean - mean) < 1e-12)
    assert(math.abs(z - (40.0 - mean) / zs.std) < 1e-12)
    assert(teOut.select("bal_bucket").as[Double].head() == 2.0)
  }

  test("tag metadata survives selection and drives select_by_tag (F6)") {
    val df = Seq((1L, 2L, 0.5)).toDF("user_id", "item_id", "price")
    val tagged = TagMetadata.addTags(
      TagMetadata.addTags(
        TagMetadata.addTags(df, "user_id", Seq("user", "user_id")),
        "item_id", Seq("item", "item_id")),
      "price", Seq("item"))
    assert(TagMetadata.columnsByTag(tagged, "item") == Seq("item_id", "price"))
    assert(TagMetadata.selectByTag(tagged, "user").columns.toSeq == Seq("user_id"))
    // tags survive a projection
    val projected = tagged.select(col("user_id"), col("price"))
    assert(TagMetadata.tagsOf(projected, "user_id") == Seq("user", "user_id"))
    // F12 ToTarget
    assert(TagMetadata.toTarget(tagged, "item_id").columns.contains("label"))
  }
}
