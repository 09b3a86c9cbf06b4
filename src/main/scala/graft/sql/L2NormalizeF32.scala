package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Codegen'd L2-normalization of an ArrayType(FloatType) column (reference
  * analog: the unit-norm step before CLIP dot-product ranking,
  * app_utils.py:24).
  *
  * Semantics match the HOF form `transform(a, x -> float(double(x) / n))`
  * with `n = sqrt(sequential-double-fold dot(a, a))` — the same evaluation
  * order DuckDB's `list_transform`/`list_sum` uses, so results are
  * bit-identical to the external oracle.
  *
  * Why an Expression and not the HOF form: higher-order functions are
  * CodegenFallback, and any expression the lambda captures (the norm) is
  * re-evaluated per element — O(dim²) per row. Worse, an HOF projection
  * placed in the same select as an `explode` lands ABOVE the Generate node
  * and runs once per generated row (measured 8× in SRP-LSH bucketing). A
  * plain UnaryExpression is placement-insensitive and one O(dim) loop.
  */
case class L2NormalizeF32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  /** Embeddings are dense in practice, but parquet array columns are
    * declared element-nullable by default — mirror the child's
    * containsNull instead of lying about it. */
  private def childContainsNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = childContainsNull)

  override def prettyName: String = "graft_l2normalize_f32"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0
    var i = 0
    // null elements contribute 0 to the norm (same convention as DotF32)
    // and stay null in the output — matching the HOF form
    // transform(a, x -> float(double(x) / n)), where a null x maps to null.
    while (i < n) {
      if (!a.isNullAt(i)) { val v = a.getFloat(i).toDouble; s += v * v }
      i += 1
    }
    val norm = math.sqrt(s)
    // dense fast path even when the schema ALLOWS nulls (parquet arrays are
    // declared element-nullable by default but embeddings are dense): box
    // only when a null is actually present
    var hasNull = false
    if (childContainsNull) {
      i = 0
      while (i < n && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
    }
    if (!hasNull) {
      val out = new Array[Float](n)
      i = 0
      while (i < n) { out(i) = (a.getFloat(i).toDouble / norm).toFloat; i += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) = if (a.isNullAt(i)) null else (a.getFloat(i).toDouble / norm).toFloat
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      if (!childContainsNull)
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double v = (double) $a.getFloat($i);
           |  $s += v * v;
           |}
           |double $norm = java.lang.Math.sqrt($s);
           |float[] $out = new float[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = (float) ((double) $a.getFloat($i) / $norm);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      else {
        val hasNull = ctx.freshName("hasNull")
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |boolean $hasNull = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { $hasNull = true; }
           |  else {
           |    double v = (double) $a.getFloat($i);
           |    $s += v * v;
           |  }
           |}
           |double $norm = java.lang.Math.sqrt($s);
           |if (!$hasNull) {
           |  float[] $out = new float[$n];
           |  for (int $i = 0; $i < $n; $i++) {
           |    $out[$i] = (float) ((double) $a.getFloat($i) / $norm);
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |} else {
           |  Object[] $out = new Object[$n];
           |  for (int $i = 0; $i < $n; $i++) {
           |    $out[$i] = $a.isNullAt($i) ? null
           |      : (Object) (Float) (float) ((double) $a.getFloat($i) / $norm);
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
