package org.apache.spark.sql.graftx

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native expressions with the
  * SQL function registry, so `spark.sql("... cosine_sim(a, b) ...")` works
  * exactly like a built-in (installed via
  * `spark.sql.extensions=org.apache.spark.sql.graftx.GraftExtensions` —
  * see graft.Tables.mkSession).
  *
  * This is the full custom-operator surface of SURVEY.md §5: no custom
  * Rule/Strategy is needed at this scope — one codegen expression plus
  * registry injection covers the hot path. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarityExpr(exprs.head, exprs(1))))
  }
}
