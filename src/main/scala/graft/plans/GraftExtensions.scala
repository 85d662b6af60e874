package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: installs the engine's native
  * expressions into every session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions` — the supported way
  * to ship catalog-level extensions to a cluster (vs the per-session
  * `FloatVecCosine.register` convenience used in tests).
  *
  * This is the injection point where custom rules/strategies would also
  * go; the engine deliberately needs none for reference parity
  * (SURVEY.md §4) — Catalyst's built-in optimizations cover every plan.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_vec_cosine"),
      new ExpressionInfo(classOf[FloatVecCosine].getName, "float_vec_cosine"),
      (exprs: Seq[Expression]) => FloatVecCosine(exprs(0), exprs(1))))
  }
}
