package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/** Fused brute-force top-k retrieval against a held item catalog: for one
  * user/query vector, score EVERY catalog item with the DotF32 dot product
  * (identical float-product/double-sum arithmetic — bit-equal scores),
  * skip ids present in the row's `seen` array, and return the k best
  * (score desc, item_id asc) as array<struct<item_id,score>> best-first
  * (reference analog: the serving-side user·item ranking,
  * my_merlin_flow.py:536-556 / pred_inspector.py:103-108).
  *
  * This collapses the serving plan `users crossJoin broadcast(items) →
  * DotF32 → anti-join(seen) → k-bounded aggregate` — which materializes
  * users × catalog candidate ROWS (38M at sf0.1's 1.9k users × 20k items)
  * through codegen, probes each against the seen broadcast, and heaps them
  * back down — into one expression eval per USER: the candidates never
  * exist as rows, the anti-join becomes a sorted-array membership test on
  * the row's own bounded history, and the only exchange in the whole plan
  * is the small seen-set aggregation. Same (score desc, id asc) order and
  * Double.compare total order as sql.TopKAggF, so output is row-identical
  * to the unfused plan (spec-pinned in TwoTowerSpec).
  *
  * The catalog rides as ONE flattened float[] reference object (data, not
  * code — the IvfProbeF32 pattern): generated code is a fixed call, plan
  * size is O(1) in catalog size, and whole-stage codegen never falls
  * back. The matrix is serialized once per stage into the task binary —
  * the same bytes the unfused plan ships as its item-vector broadcast.
  * Catalogs past the caller's float budget (TwoTower.recommend guards at
  * ~64M floats ≈ 256 MB) belong to the ANN stack (IVF/PQ), not this
  * kernel.
  *
  * Inputs: left = query vector array<float>; right = seen ids array<long>
  * (callers coalesce a missing history to the empty array — a NULL seen
  * set nulls the whole row out under BinaryExpression semantics, which
  * recommend's posexplode then drops).
  */
case class TopKDotF32(left: Expression, right: Expression,
    itemIds: Array[Long], items: Array[Array[Float]], k: Int)
    extends BinaryExpression {

  require(itemIds.length == items.length,
    s"ids (${itemIds.length}) and vectors (${items.length}) must align")
  require(itemIds.nonEmpty, "TopKDotF32 requires a non-empty catalog")
  require(k >= 1, s"k must be >= 1, got $k")

  private val n = itemIds.length
  private val dim = items(0).length
  private val kept = math.min(k, n)

  /** Catalog flattened row-major, visited in id-ascending order (equal
    * scores then admit the smaller id first; the insertion comparator
    * enforces the same order regardless). Rebuilt per-JVM after
    * serialization. */
  @transient private lazy val (sortedIds: Array[Long], flat: Array[Float]) = {
    val order = itemIds.indices.sortBy(itemIds(_)).toArray
    val ids = new Array[Long](n)
    val f = new Array[Float](n * dim)
    var i = 0
    while (i < n) {
      val src = order(i)
      ids(i) = itemIds(src)
      System.arraycopy(items(src), 0, f, i * dim, math.min(items(src).length, dim))
      i += 1
    }
    (ids, f)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<long>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_topk_dot_f32"

  // O(catalog) toString would undo the plan-size win in explain output.
  override def toString: String =
    s"$prettyName($left, $right, n=$n, dim=$dim, k=$k)"

  // Content-based equality: Array fields compare by reference in case-class
  // equals, which would defeat Catalyst CSE across the posexplode's
  // generator references to the same kernel.
  override def equals(o: Any): Boolean = o match {
    case that: TopKDotF32 =>
      left == that.left && right == that.right && k == that.k &&
        java.util.Arrays.equals(itemIds, that.itemIds) &&
        items.length == that.items.length &&
        items.indices.forall(i => java.util.Arrays.equals(items(i), that.items(i)))
    case _ => false
  }

  override def hashCode: Int = {
    var h = (left.hashCode * 31 + right.hashCode) * 31 + k
    h = h * 31 + java.util.Arrays.hashCode(itemIds)
    var i = 0
    while (i < items.length) { h = h * 31 + java.util.Arrays.hashCode(items(i)); i += 1 }
    h
  }

  /** Shared by eval and generated code (via reference object). */
  def topk(v: ArrayData, seen: ArrayData): ArrayData = {
    val vn = math.min(v.numElements(), dim)
    val va = new Array[Float](vn)
    var j = 0
    while (j < vn) { va(j) = v.getFloat(j); j += 1 }
    // the row's own history, sorted once for binary-search membership
    val s = seen.toLongArray()
    java.util.Arrays.sort(s)
    val topSc = new Array[Double](kept)
    val topId = new Array[Long](kept)
    var filled = 0
    var c = 0
    while (c < n) {
      val id = sortedIds(c)
      if (java.util.Arrays.binarySearch(s, id) < 0) {
        var acc = 0.0
        var i = 0
        val base = c * dim
        while (i < vn) { acc += va(i).toDouble * flat(base + i).toDouble; i += 1 }
        // admit iff (acc, id) ranks strictly above the worst kept entry
        // under (score desc, id asc); Double.compare = Spark total order
        if (filled < kept || {
          val cmp = java.lang.Double.compare(acc, topSc(filled - 1))
          cmp > 0 || (cmp == 0 && id < topId(filled - 1))
        }) {
          var p = math.min(filled, kept - 1)
          while (p > 0 && {
            val cmp = java.lang.Double.compare(acc, topSc(p - 1))
            cmp > 0 || (cmp == 0 && id < topId(p - 1))
          }) { topSc(p) = topSc(p - 1); topId(p) = topId(p - 1); p -= 1 }
          topSc(p) = acc; topId(p) = id
          if (filled < kept) filled += 1
        }
      }
      c += 1
    }
    val out = new Array[Any](filled)
    var r = 0
    while (r < filled) {
      out(r) = new GenericInternalRow(Array[Any](topId(r), topSc(r)))
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    topk(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("topkDot", this, classOf[TopKDotF32].getName)
    nullSafeCodeGen(ctx, ev, (v, s) => s"${ev.value} = $self.topk($v, $s);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TopKDotF32 {

  /** Registry-style builder: ids, vectors, and k must be foldable (typedLit
    * arrays and a lit int). */
  def fromExprs(vec: Expression, seen: Expression, idsExpr: Expression,
      itemsExpr: Expression, kExpr: Expression): TopKDotF32 = {
    require(idsExpr.foldable && itemsExpr.foldable && kExpr.foldable,
      "graft_topk_dot_f32 catalog and k must be literals")
    val ids = idsExpr.eval().asInstanceOf[ArrayData].toLongArray()
    val rows = itemsExpr.eval().asInstanceOf[ArrayData]
    val m = (0 until rows.numElements()).map(i => rows.getArray(i).toFloatArray()).toArray
    TopKDotF32(vec, seen, ids, m, kExpr.eval().asInstanceOf[Int])
  }
}
