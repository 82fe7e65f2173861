package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CosineSimilarity

/** Session-extensions entry point: makes the engine's custom Catalyst
  * pieces available to ANY session — including pure-SQL clients that never
  * touch the Scala API — via
  *
  * {{{
  *   spark.sql.extensions = graft.GraftExtensions
  * }}}
  *
  * Injected at analysis setup (not per-query), so `cosine_sim` resolves in
  * SQL text, views, and thriftserver sessions alike. Programmatic sessions
  * can keep using [[graft.functions.CosineSimilarity.register]]; both paths
  * install the identical expression builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
  }
}
