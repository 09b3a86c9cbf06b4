package graft.sql

import graft.SparkSpecBase
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class DotF32Spec extends SparkSpecBase {
  import spark.implicits._

  private def vecs = {
    val rnd = new scala.util.Random(42)
    (0 until 100).map { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("DotF32 is bit-identical to the HOF fold (same sequential order)") {
    val out = vecs.select(
      GraftFunctions.dotF32($"a", $"b").as("fast"),
      VectorOps.dot($"a", $"b").as("hof"))
    assert(out.filter($"fast" =!= $"hof").count() == 0,
      "codegen kernel must equal the HOF fold bit-for-bit")
  }

  test("DotF32 survives both codegen and interpreted evaluation") {
    val expected = vecs.select(GraftFunctions.dotF32($"a", $"b").as("d"))
      .agg(sum("d")).as[Double].head()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false") {
      val interpreted = vecs.select(GraftFunctions.dotF32($"a", $"b").as("d"))
        .agg(sum("d")).as[Double].head()
      assert(interpreted == expected)
    }
  }

  private def withSQLConf(kv: (String, String)*)(f: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("null inputs propagate, mismatched lengths truncate to the shorter") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f, 5f))),
      (None, Some(Array(1f)))).toDF("a", "b")
    val out = df.select(GraftFunctions.dotF32($"a", $"b").as("d"))
      .as[Option[Double]].collect()
    assert(out(0).contains(11.0) && out(1).isEmpty)
  }

  test("l2Normalize produces unit vectors") {
    val out = tbl("embeddings")
      .select(VectorOps.norm2(VectorOps.l2Normalize($"embedding")).as("n"))
      .agg(min("n"), max("n")).as[(Double, Double)].head()
    assert(math.abs(out._1 - 1.0) < 1e-6 && math.abs(out._2 - 1.0) < 1e-6)
  }

  test("L2NormalizeF32 is bit-identical to the HOF l2Normalize") {
    val out = tbl("embeddings").select(
      VectorOps.l2Normalize($"embedding").as("hof"),
      GraftFunctions.l2NormalizeF32($"embedding").as("fast"))
    assert(out.filter($"hof" =!= $"fast").count() == 0,
      "codegen normalize must equal the HOF form element-for-element")
  }
}
