package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Input-parallelism hints for expression-heavy narrow map stages.
  *
  * A small parquet file is a single split, so a pipeline like
  * md5-shingle → minhash runs on ONE core no matter how many the
  * session has (observed: the whole sf0.1 documents table is one 1.5 MB
  * row group). At production scale the input arrives in thousands of
  * splits and this is a no-op — the widen is conditional on the actual
  * partition count, so it costs nothing where it isn't needed.
  */
object Parallelism {

  /** True when the plan already contains a width-setting (shuffling)
    * operator — its output is `spark.sql.shuffle.partitions` wide, so
    * widening is pointless. Checked on the LOGICAL plan because probing
    * `df.rdd.getNumPartitions` under AQE materializes every upstream
    * query stage (an eager full execution of the plan's shuffle DAG)
    * just to read a partition count.
    *
    * A Join counts as width-setting only when NEITHER side fits under
    * `autoBroadcastJoinThreshold` by logical size stats — a join the
    * planner will broadcast never shuffles, so treating it as wide
    * would silently turn widen() into a no-op for the expression-heavy
    * broadcast-join callers this helper exists for. The size probe is
    * `plan.stats.sizeInBytes` (pure plan arithmetic, no execution).
    *
    * Known imprecision, accepted deliberately: AQE may coalesce a
    * small post-shuffle output to few partitions, which skips the
    * widen. That is the right trade: the frames matching that shape
    * here are post-aggregation rep/vector frames whose row counts are
    * small exactly when AQE coalesces them (and huge — hence already
    * wide — at production scale), while an rdd-partition probe pays a
    * full eager execution on EVERY call. Callers that do need to force
    * width onto a shuffled-but-coalesced plan can `repartition`
    * explicitly.
    */
  private def postShuffle(plan: LogicalPlan, bcThreshold: Long): Boolean =
    plan.exists {
      case j: Join =>
        bcThreshold < 0 ||
          !Seq(j.left, j.right)
            .exists(_.stats.sizeInBytes <= BigInt(bcThreshold))
      case _: Aggregate | _: Window | _: Sort |
           _: Distinct | _: Deduplicate | _: RepartitionOperation |
           _: SetOperation => true
      case _ => false
    }

  /** Hash-repartition by `cols` at the session's configured shuffle
    * width — the iteration-substrate layout: an edge/posting frame
    * persisted with this partitioning is consumed IN PLACE by every
    * round's equi-join on `cols` (zero per-round exchanges on the big
    * side), while the width stays pinned to
    * `spark.sql.shuffle.partitions` (the scale knob). The explicit
    * partition count matters twice: a bare `repartition(cols…)` is
    * REPARTITION_BY_COL, which AQE freely coalesces to ~advisory-size
    * partitions — measured at sf0.1: the 10 MB co-purchase edge cache
    * collapsed to 2 partitions and serialized every LPA round's probe
    * stage — whereas an explicit count is honored, keeping the cached
    * frame as wide as the shuffle the rounds would otherwise pay.
    */
  def hashBy(df: DataFrame,
      cols: org.apache.spark.sql.Column*): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartition(n, cols: _*)
  }

  /** Round-robin repartition up to the session's default parallelism,
    * only when the plan currently has fewer partitions. The shuffle
    * moves only the raw input (small by precondition); the expensive
    * downstream expressions then run on every core. Plans that already
    * shuffle are returned untouched — without even compiling the
    * physical plan (see [[postShuffle]]).
    */
  def widen(df: DataFrame, target: Int = 0): DataFrame = {
    val t =
      if (target > 0) target
      else df.sparkSession.sparkContext.defaultParallelism
    val bc = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (postShuffle(df.queryExecution.analyzed, bc)) df
    else if (df.rdd.getNumPartitions < t) df.repartition(t) else df
  }
}
