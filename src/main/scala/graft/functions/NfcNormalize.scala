package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical composition as a codegen'd Catalyst expression.
  *
  * Text normalization is the first pass of every web-scale corpus build
  * (CCNet/C4-style pipelines normalize before dedup so that `é` and
  * `e`+U+0301 hash identically), and Spark has no built-in for it. A
  * Scala UDF would box every row and break whole-stage codegen, so this
  * follows the build-rule preference (b): a native `Expression` whose
  * generated code is a single static call into [[NfcNormalize.nfc]]
  * (`java.text.Normalizer`, the JDK's ICU-derived Unicode implementation;
  * DuckDB's `nfc_normalize` — the oracle side — is utf8proc, and the two
  * agree on NFC by construction of the Unicode stability policy).
  *
  * Already-normalized input (the overwhelmingly common case) is detected
  * with the quick-check (`Normalizer.isNormalized`) and returned without
  * allocating, so the expression is near-free on ASCII corpora.
  */
object NfcNormalize {

  /** Static helper the generated code calls. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** `nfcNormalize(c)` as a Column over a string column. */
  def apply(c: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(c)))
}

case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq conforms
  override def inputTypes = Seq(StringType)

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
