package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's custom Catalyst expressions —
  * the `SparkSessionExtensions` entry point the build rules reserve for
  * semantics the built-in operators can't express. Library users get the
  * Column API via [[GraftFunctions]]; THIS class makes the same
  * expressions first-class SQL functions, so `spark.sql("SELECT
  * dot_product(a, b)")` plans the identical codegen'd expression with no
  * UDF boxing:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Registered functions: `dot_product(array<double>, array<double>)`
  * ([[DotProduct]]) and `nfc_normalize(string)` ([[NfcNormalize]]) —
  * both pure, deterministic, and codegen'd, so they stay inside
  * whole-stage codegen exactly like built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(
        classOf[DotProduct].getCanonicalName,
        null,
        "dot_product",
        "dot_product(a, b) - dot product of two array<double> vectors",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"dot_product expects 2 arguments, got ${children.size}")
        DotProduct(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[NfcNormalize].getCanonicalName,
        null,
        "nfc_normalize",
        "nfc_normalize(s) - Unicode NFC canonical composition",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"nfc_normalize expects 1 argument, got ${children.size}")
        NfcNormalize(children.head)
      }))
  }
}
