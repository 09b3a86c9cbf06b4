package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** |a ∩ b| of two SORTED-DISTINCT string arrays by a single two-pointer
  * merge walk — the verification kernel of the exact set-similarity join
  * (round-16, guide §4: q175's wall after the round-15 prefix work was
  * `size(array_intersect(__sa, __sb))` per CANDIDATE pair, and
  * ArrayIntersect builds a hash set over one side and hash-probes every
  * element of the other — per-element hashing + boxing of UTF8Strings on
  * the hottest row-local step). Here both sides are pre-sorted ONCE per
  * document (array_sort at prepare time, amortized over every candidate
  * the document appears in), and the count is a linear merge of byte
  * comparisons inside whole-stage codegen: no hash, no set allocation,
  * no boxing.
  *
  * PRECONDITION (the caller's contract, not checked per row): both arrays
  * are sorted ascending in UTF8String binary order (Spark's
  * `array_sort` order for strings, nulls last) and duplicate-free —
  * exactly what `array_sort(array_distinct(...))` produces. Under that
  * precondition the count equals `size(array_intersect(a, b))`
  * element-for-element, including the null-element edge (array_distinct
  * keeps one null; array_sort places it last; null matches only null) —
  * pinned against ArrayIntersect itself over randomized inputs in
  * SortedInterCountFSpec and end-to-end by the q175 oracle. Unsorted
  * input would undercount — never pass arrays that skipped the shared
  * sort.
  *
  * Null input array on either side → null (BinaryExpression default).
  */
case class SortedInterCountF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<string>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_sorted_inter_count"

  /** Shared by eval and generated code (reference-object pattern —
    * CharNgramsF precedent). Null elements sort last (array_sort's
    * order), so they are handled by the tail scan: a null matches only
    * a null, contributing at most 1 (both sides distinct). */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val an = a.isNullAt(i)
      val bn = b.isNullAt(j)
      if (an && bn) { n += 1; i += 1; j += 1 }
      else if (an) j += 1      // null sorts after every string: advance b
      else if (bn) i += 1
      else {
        val c = a.getUTF8String(i).binaryCompare(b.getUTF8String(j))
        if (c < 0) i += 1
        else if (c > 0) j += 1
        else { n += 1; i += 1; j += 1 }
      }
    }
    n
  }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    compute(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("sortedInter", this,
      classOf[SortedInterCountF].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
