package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen expression — the
  * pre-tokenization cleanup step every corpus pipeline runs before
  * hashing or deduping text (CCNet normalizes before LM scoring; Dolma
  * before dedup: "café" composed and "café" decomposed must hash
  * identically or every dedup tier silently misses the pair). Spark has
  * no built-in for this, and a Scala UDF would break whole-stage codegen
  * on the hottest path in the pipeline — so it's a Catalyst
  * BinaryExpression in the RollingHashF discipline: the form is a
  * plan-constant literal, evaluation is one static call, and doGenCode
  * keeps the projection inside the codegen stage.
  *
  * Forms: NFC (canonical compose — the corpus default, and the one
  * DuckDB's nfc_normalize replays for the q117 oracle), NFD, NFKC, NFKD
  * (compatibility forms fold ligatures/width — use before tokenizing,
  * NOT before display). java.text.Normalizer implements UAX #15, the
  * same spec as every other engine's implementation, so the output is
  * byte-identical across engines.
  */
object UnicodeNormF {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** The kernel; also the target of the generated code. The fast path:
    * Normalizer.isNormalized is O(n) with no allocation, and real corpus
    * text is overwhelmingly already-NFC ASCII — skip the rewrite. */
  def compute(text: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, f)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }
}

case class UnicodeNormF(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val form: String =
    right.eval().asInstanceOf[UTF8String].toString.toUpperCase

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.foldable, right.dataType) match {
      case (StringType, true, StringType) =>
        right.eval() match {
          case f: UTF8String if UnicodeNormF.Forms(f.toString.toUpperCase) =>
            TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName form must be one of ${UnicodeNormF.Forms.mkString("/")}, got $other")
        }
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string literal form), got " +
          s"(${left.dataType.simpleString}, ${right.sql})")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_unicode_norm"

  override protected def nullSafeEval(t: Any, f: Any): Any =
    UnicodeNormF.compute(t.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // form is plan-constant (literal-only, enforced above) and matches
    // [A-Z]+, so inlining it as a Java string literal is safe
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"""${ev.value} = graft.sql.UnicodeNormF.compute($t, "$form");""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
