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
  /** Re-root a `localCheckpoint`-ed frame on a LogicalRDD whose
    * sizeInBytes is `sizeInBytes` instead of the one the checkpoint's
    * stats rewrite computed from the plan UNDER it.
    *
    * Why this exists: `Dataset.localCheckpoint` attaches the
    * truncated plan's estimated Statistics to the replacement
    * LogicalRDD, and the size-only estimator MULTIPLIES child sizes
    * at every join. An iterative operator that checkpoints each round
    * therefore squares its sizeInBytes per iteration — the BigInt's
    * BIT LENGTH doubles every round, and past ~25 rounds each stats
    * visit burns minutes of single-threaded Toom-Cook multiplication
    * on numbers of hundreds of megabits (measured: a 45-minute
    * q_mutual_knn window stuck in BigInteger.multiply under
    * SizeInBytesOnlyStatsPlanVisitor — the driver, not the cluster,
    * was the bottleneck). The frame's TRUE size is known to the
    * caller (e.g. |V| label rows), so the fix is to pin honest stats
    * at the truncation point: downstream broadcast decisions keep a
    * sane size and the per-round estimate stays O(1) bits.
    *
    * The checkpoint's RDD, partitioning, and ordering carry over —
    * only the stats (and constraints, dropped: they were rewritten
    * from the dead plan's attributes anyway) change.
    */
  def checkpointWithStats(df: org.apache.spark.sql.DataFrame,
      sizeInBytes: BigInt): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    ds.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val fresh = new org.apache.spark.sql.execution.LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(
          ds.sparkSession,
          Some(org.apache.spark.sql.catalyst.plans.logical.Statistics(
            sizeInBytes.max(BigInt(1)))),
          None)
        org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession, fresh)
      case _ => df
    }
  }

  def unpersistLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
