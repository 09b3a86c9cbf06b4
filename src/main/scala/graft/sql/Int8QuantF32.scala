package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen kernels for int8 symmetric scalar quantization (ScalarQuant's
  * hot path). The HOF form — `array_max(transform(x, abs))` then a second
  * `transform` with a `when` guard — is three interpreted CodegenFallback
  * array walks per row (the q109/minhash lesson again); these two
  * UnaryExpressions are each one primitive loop inside whole-stage
  * codegen, bit-identical to the HOF semantics for all FINITE inputs
  * (and to DuckDB's list_max/list_transform evaluation, which is what
  * the q149 oracle replays).
  *
  * Null convention (mirrors the HOF forms): null ELEMENTS are skipped by
  * the max and map to null codes; an empty or all-null array has maxabs
  * NULL (array_max semantics) and codes = [] / all-null.
  *
  * NaN carve-out (the one place kernel ≢ HOF, by design): Java's `v > m`
  * is false for NaN, so these kernels SKIP NaN elements — a vector of
  * NaNs and zeros gets maxabs from its finite values — whereas Spark's
  * array_max (and DuckDB's list_max) order NaN greater than everything,
  * making the HOF maxabs NaN and the codes null/garbage. Skipping is the
  * deliberate choice: a NaN-poisoned maxabs silently zeroes the whole
  * vector's codes downstream, while skipping degrades only the NaN lanes
  * (which encode as 0 — Java's NaN→int cast).
  * Embedding pipelines are expected to gate non-finite values upstream
  * (VectorQueries' finiteness filters); Int8QuantSpec pins the skip
  * behavior so the divergence is contractual, not accidental.
  */

/** max(|x_i|) of an array<float> as double; NULL for empty/all-null. */
case class MaxAbsF32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_maxabs_f32"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var m = -1.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = math.abs(a.getFloat(i).toDouble)
        if (v > m) m = v
      }
      i += 1
    }
    if (m < 0.0) null else m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      s"""
         |int $n = $a.numElements();
         |double $m = -1.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double v = java.lang.Math.abs((double) $a.getFloat($i));
         |    if (v > $m) { $m = v; }
         |  }
         |}
         |if ($m < 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $m; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Quantization codes floor(x·127/maxabs + 0.5) as array<int>, computing
  * maxabs internally in the same pass structure (two primitive loops, one
  * expression node — the scale column should come from [[MaxAbsF32]] on
  * the same child; CSE cannot merge them, but both are O(dim) primitive
  * loops, ~free next to the HOF interpreter they replace). All-zero
  * vectors encode as all-zero codes. */
case class Int8CodesF32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  private def childContainsNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = childContainsNull)
  override def prettyName: String = "graft_int8_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = math.abs(a.getFloat(i).toDouble)
        if (v > m) m = v
      }
      i += 1
    }
    var hasNull = false
    if (childContainsNull) {
      i = 0
      while (i < n && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
    }
    if (!hasNull) {
      val out = new Array[Int](n)
      i = 0
      while (i < n) {
        out(i) =
          if (m == 0.0) 0
          else math.floor(a.getFloat(i).toDouble * 127.0 / m + 0.5).toInt
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (a.isNullAt(i)) null
          else if (m == 0.0) Int.box(0)
          else Int.box(math.floor(a.getFloat(i).toDouble * 127.0 / m + 0.5).toInt)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      if (!childContainsNull)
        s"""
           |int $n = $a.numElements();
           |double $m = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double v = java.lang.Math.abs((double) $a.getFloat($i));
           |  if (v > $m) { $m = v; }
           |}
           |int[] $out = new int[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = ($m == 0.0) ? 0
           |    : (int) java.lang.Math.floor((double) $a.getFloat($i) * 127.0 / $m + 0.5);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      else {
        val hasNull = ctx.freshName("hasNull")
        s"""
           |int $n = $a.numElements();
           |double $m = 0.0;
           |boolean $hasNull = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { $hasNull = true; }
           |  else {
           |    double v = java.lang.Math.abs((double) $a.getFloat($i));
           |    if (v > $m) { $m = v; }
           |  }
           |}
           |if (!$hasNull) {
           |  int[] $out = new int[$n];
           |  for (int $i = 0; $i < $n; $i++) {
           |    $out[$i] = ($m == 0.0) ? 0
           |      : (int) java.lang.Math.floor((double) $a.getFloat($i) * 127.0 / $m + 0.5);
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |} else {
           |  Object[] $out = new Object[$n];
           |  for (int $i = 0; $i < $n; $i++) {
           |    $out[$i] = $a.isNullAt($i) ? null
           |      : ($m == 0.0) ? (Object) (Integer) 0
           |      : (Object) (Integer) (int) java.lang.Math.floor(
           |          (double) $a.getFloat($i) * 127.0 / $m + 0.5);
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
