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
    * Known imprecision, accepted deliberately: a logical Join that the
    * planner turns into a broadcast join never shuffles, and AQE may
    * coalesce a small post-shuffle output to few partitions — both
    * cases now skip the widen. That is the right trade: the frames
    * matching those shapes here are post-aggregation rep/vector frames
    * whose row counts are small exactly when AQE coalesces them (and
    * huge — hence already wide — at production scale), while the old
    * probe paid a full eager execution on EVERY call. Callers that do
    * need to force width onto a shuffled-but-coalesced plan can
    * `repartition` explicitly.
    */
  private def postShuffle(plan: LogicalPlan): Boolean = plan.exists {
    case _: Aggregate | _: Join | _: Window | _: Sort |
         _: Distinct | _: Deduplicate | _: RepartitionOperation |
         _: SetOperation => true
    case _ => false
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
    if (postShuffle(df.queryExecution.analyzed)) df
    else if (df.rdd.getNumPartitions < t) df.repartition(t) else df
  }
}
