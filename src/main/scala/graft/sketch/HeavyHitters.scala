package graft.sketch

import graft.functions.HeavyHittersAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters over an open item domain, in two bounded
  * passes — the sketch-for-candidates / exact-recount composition:
  *
  *  1. one [[graft.functions.MisraGries]] aggregate caps every map
  *     partition's shuffle contribution at k counters (vs the exact
  *     `groupBy(item)`'s partition×|domain| partial rows — the
  *     difference between O(parts·k) and a vocabulary-sized shuffle
  *     when items are urls / user ids / n-grams over 100 TB);
  *  2. the ≤ k candidates broadcast back as an `isin` filter and only
  *     THEY are counted exactly (one tiny hash aggregate).
  *
  * Exactness: Misra-Gries guarantees every item with true frequency
  * > N/(k+1) survives any merge order, so with minFrac ≥ 1/(k+1) the
  * recount-then-threshold result equals the full exact group-by —
  * which is precisely what the `q_heavy_hitters` oracle replays (a
  * plain GROUP BY ... HAVING; no sketch arithmetic in the gate).
  *
  * Choose minFrac an exact binary fraction (1/128, 1/64 …) so the
  * threshold `N·minFrac` is the same IEEE double in every engine.
  */
object HeavyHitters {

  /** ≤ k candidate items (superset of all with freq > N/(k+1)) plus
    * the exact total row count, in ONE corpus pass.
    */
  def candidates(df: DataFrame, itemCol: String, k: Int): (Array[Long], Long) = {
    val row = df.agg(
      HeavyHittersAgg.misra_gries(col(itemCol).cast("long"), k).as("cands"),
      count(col(itemCol)).as("n")).head()
    val items = row.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(0)).toArray
    (items, row.getLong(1))
  }

  /** Candidate counters WITH their lower-bound weights — the
    * persistable form for incremental tracking (write the ≤ k rows,
    * merge tomorrow's batch in). Weights are merge-order-dependent
    * pruning hints, never counts (same caveat as the aggregate).
    */
  def candidateWeights(df: DataFrame, itemCol: String,
      k: Int): Seq[(Long, Long)] =
    df.agg(HeavyHittersAgg.misra_gries(col(itemCol).cast("long"), k)
        .as("cands")).head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))

  /** Merge two candidate-counter sets under the Misra-Gries rule
    * (add, then subtract the (k+1)-th largest and drop ≤ 0) — the
    * DRIVER-side twin of the aggregate's own merge, for folding a new
    * batch's candidates into yesterday's persisted state. The
    * mergeable-summaries guarantee composes: after any sequence of
    * such merges, every item with total frequency > N_total/(k+1)
    * across ALL batches is still present (HeavyHittersSpec pins it).
    * Both inputs are ≤ k entries, so this is bounded model state.
    */
  def mergeCandidateSets(a: Seq[(Long, Long)], b: Seq[(Long, Long)],
      k: Int): Seq[(Long, Long)] = {
    val m = scala.collection.mutable.Map.empty[Long, Long]
    (a ++ b).foreach { case (item, w) => m(item) = m.getOrElse(item, 0L) + w }
    val trimmed = if (m.size > k) {
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.toSeq.map { case (i, w) => (i, w - cut) }.filter(_._2 > 0)
    } else m.toSeq
    trimmed.sortBy { case (i, w) => (-w, i) }
  }

  /** All items with exact frequency ≥ N·minFrac, with their exact
    * counts. Requires minFrac STRICTLY above 1/(k+1) — the sketch
    * guarantee covers items with frequency > N/(k+1), so at equality
    * a qualifying item can be decremented away (k=1 over [a,b,a,b]
    * ends with an empty sketch while both items sit exactly at N/2).
    */
  def exactHeavyHitters(df: DataFrame, itemCol: String, k: Int,
      minFrac: Double): DataFrame = {
    require(minFrac > 1.0 / (k + 1),
      s"minFrac=$minFrac not strictly above the k=$k sketch " +
        s"guarantee bound 1/${k + 1}")
    // the candidate pass sketches over cast('long'); a non-integral
    // item column would alias distinct raw values under the cast and
    // break the superset guarantee the recount relies on — and the
    // isin(Long) probe below could then drop qualifying raw items.
    // Misuse fails loudly instead of returning a silently-partial set.
    df.schema(itemCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => ()
      case other => throw new IllegalArgumentException(
        s"exactHeavyHitters needs an integral item column; '$itemCol' " +
          s"is $other — hash or dictionary-encode it first")
    }
    val (items, n) = candidates(df, itemCol, k)
    val threshold = n * minFrac
    df.filter(col(itemCol).isin(items.map(Long.box): _*))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= threshold)
  }
}
