package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-point double formatting that byte-matches C/Python/DuckDB `%f`.
  *
  * Java's `format_string("%.6f", x)` rounds the SHORTEST decimal
  * representation half-up, but C-family printf (Python, DuckDB — the
  * oracle side of the canonical-CSV hash compare) rounds the EXACT binary
  * value half-even. The two disagree on every "apparent tie" — e.g.
  * 0.0087525 is really 0.00875249999…, so printf says 0.008752 while
  * Java's Formatter says 0.008753 (measured ~5% of random 7-decimal
  * inputs) — and on true binary ties like 0.0078125. Rounding the exact
  * value via `new BigDecimal(v)` (the exact constructor, NOT `valueOf`,
  * which re-introduces the shortest-repr) reproduces printf on both
  * families, verified against CPython on 200k random values. Eval and
  * codegen call the one static helper, keeping the writer UDF-free and
  * inside whole-stage codegen.
  */
object HalfEvenFormat {
  /** Static helper the generated code calls. NaN/±Infinity keep Java's
    * `%f` spelling; BigDecimal drops the sign of negative values that
    * round to zero (and of -0.0), where printf keeps it — restored
    * explicitly.
    */
  def format(v: Double, digits: Int): UTF8String =
    UTF8String.fromString {
      if (v.isNaN) "NaN"
      else if (v.isInfinite) { if (v > 0) "Infinity" else "-Infinity" }
      else {
        val s = new java.math.BigDecimal(v)
          .setScale(digits, java.math.RoundingMode.HALF_EVEN)
          .toPlainString
        val negativeZero = (v < 0 || (v == 0.0 && 1.0 / v < 0)) && !s.startsWith("-")
        if (negativeZero) "-" + s else s
      }
    }

  /** `halfEvenFormat(c, digits)` as a Column over a double column. */
  def apply(c: Column, digits: Int): Column =
    GraftSqlBridge.column(FormatHalfEven(GraftSqlBridge.expression(c), digits))
}

case class FormatHalfEven(child: Expression, digits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[DoubleType.type] conforms
  override def inputTypes = Seq(DoubleType)

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    HalfEvenFormat.format(v.asInstanceOf[Double], digits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HalfEvenFormat.format($c, $digits)")

  override protected def withNewChildInternal(newChild: Expression): FormatHalfEven =
    copy(child = newChild)
}
