package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotI64

/** Library entry point for `spark.sql.extensions`: installs the engine's
  * native Catalyst functions and optimizer rules into every session built
  * from the configuration, the standard way a Spark library ships
  * session-scoped extensions:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Query packs still call [[graft.functions.VectorFunctions.register]] as
  * an idempotent fallback so they also work on a vanilla session without
  * the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_i64"),
      new ExpressionInfo(classOf[DotI64].getName, "dot_i64"),
      (exprs: Seq[Expression]) => DotI64(exprs.head, exprs(1))))
    ext.injectOptimizerRule(_ => graft.plans.TopKViaSortLimit)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinViaBuckets)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    ext.injectOptimizerRule(_ => graft.plans.JoinRewrite)
  }
}
