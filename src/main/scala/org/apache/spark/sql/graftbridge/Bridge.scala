package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ClassicConversions, ExpressionUtils}

/** Spark 4 moved Column onto ColumnNode and made the
  * Column↔catalyst-Expression bridges private[sql]; a library defining
  * native Catalyst expressions still needs both directions. This object
  * lives under org.apache.spark.sql solely to re-export them — the
  * sanctioned pattern for Catalyst-extending libraries.
  */
object Bridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column =
    ClassicConversions.ColumnConstructorExt(Column).apply(e)

  /** EAGER ColumnNode→Expression conversion. The lazy wrapper from
    * [[toExpression]] stays a `ColumnNodeExpression` that only the
    * DataFrame analysis path unwraps; expressions returned from a
    * FunctionRegistry builder (SQL path) bypass that rule and must be
    * converted up front or codegen receives the unresolved wrapper.
    */
  def toEagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Drop the block-manager storage behind a `localCheckpoint`-ed
    * frame. `Dataset.unpersist` only touches the SQL CacheManager;
    * checkpoint blocks are RDD-level and otherwise linger until the
    * ContextCleaner notices the dropped reference AFTER a JVM GC —
    * which a long-lived session may not run for hours, so iterative
    * operators that checkpoint per round (ConnectedComponents) slowly
    * fill the block manager with superseded rounds. Callers must only
    * pass frames no longer reachable from any live plan: the lineage
    * is truncated, so a post-unpersist recompute is impossible.
    *
    * Deliberately narrow: only a frame whose plan ROOT is the
    * checkpoint relation is unpersisted (a no-op otherwise). A
    * deep-collect over the whole plan would also free OTHER
    * checkpointed frames joined in downstream — freeing a
    * still-live frame whose lineage is gone fails the next read.
    */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
