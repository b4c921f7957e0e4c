package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark internals (the standard
  * extension-library pattern): Column <-> Catalyst Expression conversion
  * for registering native expressions from the graft package.
  */
object SqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Free the block-manager storage behind a `localCheckpoint`ed Dataset.
    * `Dataset.unpersist` only consults the CacheManager, which knows
    * nothing about checkpoint RDDs — without this, every localCheckpoint
    * lives until the ContextCleaner's weak-reference GC happens to run
    * (unbounded block-manager growth over a long crawl's wave loop).
    * No-op for non-checkpointed plans.
    */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
