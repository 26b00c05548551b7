package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (java.text.Normalizer) as a native expression —
  * the canonicalization step every dedup/fingerprint pipeline needs before
  * hashing: visually-identical strings with different codepoint sequences
  * ("é" composed vs "e"+U+0301) must hash identically. No UDF: the call
  * inlines into whole-stage codegen like the regexp expressions do, so it
  * distributes with zero per-row boxing beyond the unavoidable
  * UTF8String→String bridge the JDK API requires.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form $form")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = s"${form.toLowerCase}_normalize"
}

object NormalizeExpr {
  /** NFC-normalize a string column (compose combining sequences). */
  def nfc(c: Column): Column =
    ColumnBridge.column(UnicodeNormalizeExpr(ColumnBridge.expression(c), "NFC"))

  /** NFKC-normalize (compatibility fold: ligatures, width variants, …). */
  def nfkc(c: Column): Column =
    ColumnBridge.column(UnicodeNormalizeExpr(ColumnBridge.expression(c), "NFKC"))
}
