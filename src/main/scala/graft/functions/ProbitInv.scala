package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd inverse standard-normal CDF (probit), Wichura's AS241
  * PPND16 rational approximation (Applied Statistics 37(3), 1988 —
  * public algorithm), accurate to ~1e-16 relative error over (0, 1).
  *
  * Replaces the per-cell Scala UDF the MICE posterior draw used: a UDF
  * breaks whole-stage codegen and boxes every value; this expression
  * emits a static call into the generated code so the imputation sweep
  * stays one fused codegen stage (build-rule preference (b): native
  * `Expression` before UDF). Out-of-domain inputs (p ≤ 0 or ≥ 1) return
  * ±Infinity like commons-math's `inverseCumulativeProbability`.
  */
object ProbitInv {

  // AS241 PPND16 coefficients: central region |p-0.5| ≤ 0.425
  private val A = Array(3.3871328727963666080, 1.3314166789178437745e2,
    1.9715909503065514427e3, 1.3731693765509461125e4, 4.5921953931549871457e4,
    6.7265770927008700853e4, 3.3430575583588128105e4, 2.5090809287301226727e3)
  private val B = Array(1.0, 4.2313330701600911252e1, 6.8718700749205790830e2,
    5.3941960214247511077e3, 2.1213794301586595867e4, 3.9307895800092710610e4,
    2.8729085735721942674e4, 5.2264952788528545610e3)
  // intermediate region r = sqrt(-ln(min(p,1-p))) ≤ 5
  private val C = Array(1.42343711074968357734, 4.63033784615654529590,
    5.76949722146069140550, 3.64784832476320460504, 1.27045825245236838258,
    2.41780725177450611770e-1, 2.27238449892691845833e-2, 7.74545014278341407640e-4)
  private val D = Array(1.0, 2.05319162663775882187, 1.67638483018380384940,
    6.89767334985100004550e-1, 1.48103976427480074590e-1, 1.51986665636164571966e-2,
    5.47593808499534494600e-4, 1.05075007164441684324e-9)
  // tail region r > 5
  private val E = Array(6.65790464350110377720, 5.46378491116411436990,
    1.78482653991729133580, 2.96560571828504891230e-1, 2.65321895265761230930e-2,
    1.24266094738807843860e-3, 2.71155556874348757815e-5, 2.01033439929228813265e-7)
  private val F = Array(1.0, 5.99832206555887937690e-1, 1.36929880922735805310e-1,
    1.48753612908506148525e-2, 7.86869131145613259100e-4, 1.84631831751005468180e-5,
    1.42151175831644588870e-7, 2.04426310338993978564e-15)

  private def poly(c: Array[Double], x: Double): Double = {
    var s = c(7)
    var i = 6
    while (i >= 0) { s = s * x + c(i); i -= 1 }
    s
  }

  /** Inverse Φ; called from generated code — must stay a static method. */
  def ppnd16(p: Double): Double = {
    if (p.isNaN) return Double.NaN
    if (p <= 0.0) return Double.NegativeInfinity
    if (p >= 1.0) return Double.PositiveInfinity
    val q = p - 0.5
    if (math.abs(q) <= 0.425) {
      val r = 0.180625 - q * q
      q * poly(A, r) / poly(B, r)
    } else {
      var r = if (q < 0.0) p else 1.0 - p
      r = math.sqrt(-math.log(r))
      val v =
        if (r <= 5.0) { val s = r - 1.6; poly(C, s) / poly(D, s) }
        else { val s = r - 5.0; poly(E, s) / poly(F, s) }
      if (q < 0.0) -v else v
    }
  }
}

case class ProbitInv(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    ProbitInv.ppnd16(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ProbitInv.ppnd16($c)")

  override protected def withNewChildInternal(newChild: Expression): ProbitInv =
    copy(child = newChild)
}

object ProbitFunctions {
  /** `probit_inv(p)` as a Column over a double column in (0, 1). */
  def probitInv(p: Column): Column =
    GraftSqlBridge.column(ProbitInv(GraftSqlBridge.expression(p)))
}
