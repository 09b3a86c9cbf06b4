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

  test("L2NormalizeF32 keeps null elements null; norm from non-null elements") {
    // 3-4-null: norm must be 5 (null contributes 0, same convention as
    // DotF32), and the null slot must stay null — not silently read as 0
    val df = Seq((1L, Seq[java.lang.Float](3.0f, 4.0f, null)),
      (2L, Seq[java.lang.Float](6.0f, 8.0f, 0.0f))).toDF("id", "v")
      .select($"id", $"v".cast("array<float>").as("v"))
    def check(rows: Array[org.apache.spark.sql.Row]): Unit = {
      val r1 = rows(0).getSeq[java.lang.Float](1)
      assert(r1(0) == 0.6f && r1(1) == 0.8f && r1(2) == null)
      val r2 = rows(1).getSeq[java.lang.Float](1)
      assert(r2(0) == 0.6f && r2(1) == 0.8f && r2(2) == 0.0f)
    }
    val q = df.select($"id", GraftFunctions.l2NormalizeF32($"v")).orderBy($"id")
    check(q.collect())
    // same contract on the interpreted path
    withSQLConf("spark.sql.codegen.factoryMode" -> "NO_CODEGEN",
        "spark.sql.codegen.wholeStage" -> "false") {
      check(q.collect())
    }
  }
}
