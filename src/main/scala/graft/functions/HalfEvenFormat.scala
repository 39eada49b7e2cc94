package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-point double formatting with banker's rounding.
  *
  * `format_string("%.6f", x)` (Java `Formatter`) rounds ties HALF_UP, but
  * DuckDB/Python — the oracle side of the canonical-CSV hash compare —
  * round the shortest decimal representation half-even, so an
  * exactly-representable tie like 0.0078125 formats as `0.007813` on one
  * engine and `0.007812` on the other: a latent cross-engine byte break on
  * perfectly clean data. This routes the same shortest-repr through
  * `BigDecimal.setScale(d, HALF_EVEN)` on both paths (eval and codegen call
  * the one static helper), keeping the writer UDF-free and inside
  * whole-stage codegen.
  */
object HalfEvenFormat {
  /** Static helper the generated code calls. NaN/±Infinity keep Java's
    * `%f` spelling; everything else is `BigDecimal.valueOf` (shortest
    * decimal repr, so 0.1 formats as 0.100000 not 0.100000000000000005…)
    * rescaled HALF_EVEN and printed plain (no exponent).
    */
  def format(v: Double, digits: Int): UTF8String =
    UTF8String.fromString(
      if (v.isNaN) "NaN"
      else if (v.isInfinite) { if (v > 0) "Infinity" else "-Infinity" }
      else java.math.BigDecimal.valueOf(v)
        .setScale(digits, java.math.RoundingMode.HALF_EVEN)
        .toPlainString)

  /** `halfEvenFormat(c, digits)` as a Column over a double column. */
  def apply(c: Column, digits: Int): Column =
    GraftSqlBridge.column(FormatHalfEven(GraftSqlBridge.expression(c), digits))
}

case class FormatHalfEven(child: Expression, digits: Int) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    HalfEvenFormat.format(v.asInstanceOf[Double], digits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HalfEvenFormat.format($c, $digits)")

  override protected def withNewChildInternal(newChild: Expression): FormatHalfEven =
    copy(child = newChild)
}
