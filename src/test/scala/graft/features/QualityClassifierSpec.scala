package graft.features

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val feats =
    QualityClassifier.featurize(tbl("documents"), "doc_id", "text")

  // a linearly separable target over one feature: LR must nail it
  private lazy val labeled = feats.withColumn("label", (col("n_words") >= 50).cast("int"))

  test("featurize emits the declared base features plus optional lm column") {
    assert(feats.columns.toSet == (QualityClassifier.BaseFeatures.toSet + "doc_id"))
    val lm = graft.functions.NgramLm.fit(
      tbl("documents"), graft.functions.TextOps.tokens($"text"), cache = false)
    val withLm = QualityClassifier.featurize(tbl("documents"), "doc_id", "text", Some(lm))
    assert(withLm.columns.contains("ll_mean"))
    assert(withLm.count() == feats.count())
  }

  test("training is deterministic: two fits give identical weights") {
    val m1 = QualityClassifier.train(labeled, "label")
    val m2 = QualityClassifier.train(labeled, "label")
    assert(m1.weights.toSeq == m2.weights.toSeq && m1.intercept == m2.intercept)
  }

  test("the learned model separates a linearly separable target") {
    val m = QualityClassifier.train(labeled, "label", regParam = 0.01)
    val scored = QualityClassifier.score(labeled, m)
    val wrong = scored.filter(col("keep") =!= (col("label") === 1)).count()
    val total = scored.count()
    assert(total > 0)
    assert(wrong <= total / 20, s"$wrong / $total misclassified on separable data")
  }

  test("column-expression serving matches spark.ml's own probabilities") {
    val m = QualityClassifier.train(labeled, "label", regParam = 0.01)
    // re-derive ml probabilities by hand from the SAME weights: p = sigmoid(z)
    val ours = QualityClassifier.score(labeled, m)
      .select($"doc_id", $"z", $"p").as[(Long, Double, Double)].collect()
    ours.foreach { case (_, z, p) =>
      val expect = 1.0 / (1.0 + math.exp(-z))
      assert(math.abs(p - expect) < 1e-15, s"sigmoid mismatch at z=$z")
    }
  }

  test("persisted model round-trips and serves identically from reload") {
    val m = QualityClassifier.train(labeled, "label", regParam = 0.01)
    val path = java.nio.file.Files.createTempDirectory("graft_qc").toString + "/model"
    QualityClassifier.save(spark, m, path)
    val loaded = QualityClassifier.load(spark, path)
    assert(loaded.featureNames == m.featureNames)
    assert(loaded.weights.toSeq == m.weights.toSeq && loaded.intercept == m.intercept)
    val a = QualityClassifier.score(feats, m).select($"doc_id", $"z").collect().toSeq
    val b = QualityClassifier.score(feats, loaded).select($"doc_id", $"z").collect().toSeq
    assert(a == b)
  }

  // round-6 advisory regression pin: docs with <2 tokens must SURVIVE
  // featurize(lm=Some) with the neutral ll_mean = 0.0 — NgramLm.scoreDocs
  // left-joins every doc back after the bigram explode (NgramLm.scala:106)
  // and Repetition.topNgramStats does the same for the gram argmax, so no
  // inner join in the chain can drop a bigram-less doc.
  test("featurize(lm=Some) keeps docs with <2 tokens at neutral ll_mean 0.0") {
    val docs = Seq(
      (1L, "single"), // 1 token: no bigrams
      (2L, ""), // trim→"" splits to one empty token: no bigrams
      (3L, "the quick brown fox jumps the lazy dog the end"))
      .toDF("doc_id", "text")
    val lm = graft.functions.NgramLm.fit(
      docs, graft.functions.TextOps.tokens($"text"), cache = false)
    val feats = QualityClassifier.featurize(docs, "doc_id", "text", Some(lm))
    assert(feats.count() == 3, "bigram-less docs must not be dropped")
    val ll = feats.select($"doc_id", $"ll_mean").as[(Long, Double)]
      .collect().toMap
    assert(ll(1L) == 0.0 && ll(2L) == 0.0,
      s"bigram-less docs must score the neutral 0.0, got $ll")
    assert(ll(3L) != 0.0, "a real doc must carry a real LM mean")
  }

  test("serving is a pure projection: no shuffle, no UDF, no ml runtime") {
    val m = QualityClassifier.Model(Seq("n_words", "n_sym"), Array(0.1, -0.5), -1.0)
    val plain = Seq((1L, 60, 0), (2L, 10, 9)).toDF("doc_id", "n_words", "n_sym")
    val plan = QualityClassifier.score(plain, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"),
      s"margin scoring must stay a codegen projection:\n$plan")
  }
}
