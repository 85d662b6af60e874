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
  import GraftExtensions._
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_vec_cosine"),
      new ExpressionInfo(classOf[FloatVecCosine].getName, "float_vec_cosine"),
      cosineBuilder))
    ext.injectFunction((
      FunctionIdentifier("float_vec_lsh_bucket"),
      new ExpressionInfo(classOf[FloatVecLshBucket].getName, "float_vec_lsh_bucket"),
      lshBucketBuilder))
  }
}

object GraftExtensions {
  val cosineBuilder: Seq[Expression] => Expression =
    exprs => FloatVecCosine(exprs(0), exprs(1))

  /** SQL form: float_vec_lsh_bucket(vec, bits[, dims]) — bits/dims must be
    * foldable integer literals (they shape the generated code). */
  val lshBucketBuilder: Seq[Expression] => Expression = { exprs =>
    def intLit(e: Expression): Int = e.eval(null).asInstanceOf[Number].intValue()
    FloatVecLshBucket(exprs(0), intLit(exprs(1)),
      if (exprs.length > 2) intLit(exprs(2)) else 64)
  }
}
