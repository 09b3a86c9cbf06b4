package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd DEFLATE-compressed length of a string/binary column — the
  * compression-ratio quality signal (MassiveText/Gopher-class pipelines
  * flag machine-generated gibberish and boilerplate by how well text
  * compresses: natural prose lands ~2.5-4× over its UTF-8 bytes, random
  * character soup ~1×, template spam 10×+). Ratio = deflate_len / byte
  * length; derive it as a plain division so BOTH exact integers stay
  * visible to downstream gates.
  *
  * The eighth raw-SQL expression (`graft_deflate_len`). Work is dominated
  * by the deflate itself, but expression-form (vs a Scala UDF) keeps the
  * surrounding projection inside whole-stage codegen, skips the
  * UDF-boundary serialization, and makes the null contract explicit. One
  * Deflater per thread (ThreadLocal, reset per value — allocation-free on
  * the hot path, and a Deflater is a native-memory object a per-row `new`
  * would churn). Level is FIXED at 6: the signal is a relative ratio, and
  * a fixed level keeps values reproducible across runs/partitionings on
  * the same JVM family. No DuckDB oracle (no deflate there) — the q139
  * row is the driver's rows-only check, semantics pinned in
  * DeflateLenFSpec.
  */
case class DeflateLenF(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or binary, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_deflate_len"

  private def isString: Boolean = child.dataType == StringType

  override protected def nullSafeEval(input: Any): Any = {
    val bytes =
      if (isString) input.asInstanceOf[UTF8String].getBytes
      else input.asInstanceOf[Array[Byte]]
    DeflateLenF.compressedLen(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytesExpr = if (isString) s"$c.getBytes()" else c
      s"${ev.value} = graft.sql.DeflateLenF.compressedLen($bytesExpr);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLenF {

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true) // raw deflate: no zlib header noise
  }

  /** Compressed byte length at level 6; empty input costs 2 (the final
    * empty stored block — deflate's floor, kept as-is: the ratio column
    * divides by byte length, so callers guard len 0 themselves). Called
    * from generated code — must stay a static-shaped, exception-free
    * method. */
  def compressedLen(bytes: Array[Byte]): Int = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
