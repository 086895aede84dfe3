package graft.streaming

import graft.sim.KMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StringType

/** The IVF ops LOOP — closing the gap between observing index health
  * and acting on it. [[EventStreams.ivfAssignStream]] monitors cell
  * occupancy of arriving embeddings; this operator adds the decision
  * and the repair: when a batch's occupancy under the CURRENT coarse
  * quantizer concentrates past a threshold (the distribution-drift
  * signature — new content lands in one or two cells, probe cost and
  * recall both degrade), retrain the coarse quantizer on a BOUNDED
  * hash-sample of the drifted batch and assign through the refreshed
  * centroids, exactly the `q_ivf_append` machinery (training paid per
  * epoch, assignment a narrow literal-centroid argmin).
  *
  * Scale shape per micro-batch: one ≤ k-row occupancy aggregate
  * (collected — bounded model state), optionally one bounded-sample
  * k-means fit (sample ≤ `sampleCap` rows via the deterministic
  * hash-ordered draw, Lloyd on the sample only), one narrow
  * assignment map over the batch. The evolving model is driver-held
  * state (k centroids), the same footprint every quantizer trainer in
  * this engine keeps.
  */
object IvfMaintenance {

  /** Driver-side maintenance state: the live coarse quantizer plus a
    * retrain counter (ops observability).
    */
  final case class MaintState(model: KMeans.Model, retrains: Long)

  /** Largest cell share of a batch under `model` — 0 for an empty
    * batch (an empty batch is never "drifted").
    */
  def maxCellShare(batch: DataFrame, vecCol: String,
      model: KMeans.Model): Double = {
    val counts = batch
      .select(KMeans.clusterOf(col(vecCol), model).as("cluster"))
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val n = counts.sum
    if (n == 0L) 0.0 else counts.max.toDouble / n
  }

  /** One maintenance step: measure occupancy, retrain if the largest
    * cell share exceeds `maxShare`, assign the batch through the
    * (possibly refreshed) model. Returns (assignments, new state,
    * retrained?). Deterministic end to end: the drift metric is a
    * count aggregate, the retrain sample is the hash-ordered draw.
    */
  def maintainBatch(batch: DataFrame, idCol: String, vecCol: String,
      st: MaintState, k: Int, iters: Int, sampleCap: Int,
      maxShare: Double): (DataFrame, MaintState, Boolean) = {
    require(maxShare > 0 && maxShare <= 1.0, "maxShare must lie in (0, 1]")
    require(sampleCap >= k, s"sampleCap=$sampleCap must cover k=$k centroids")
    val share = maxCellShare(batch, vecCol, st.model)
    val drifted = share > maxShare
    val model2 =
      if (!drifted) st.model
      else KMeans.fit(
        batch.orderBy(
          graft.text.TextAnalysis.hash60(col(idCol).cast(StringType)).asc,
          col(idCol).asc).limit(sampleCap),
        idCol, vecCol, k, iters)
    val asg = KMeans.assignDist(batch, idCol, vecCol, model2)
    (asg, MaintState(model2,
      st.retrains + (if (drifted) 1L else 0L)), drifted)
  }

  /** Streaming driver: run [[maintainBatch]] per micro-batch via
    * foreachBatch, holding the model as driver state (k centroids —
    * restart re-seeds from `initial`; persist the returned state's
    * centroids externally if the index must survive restarts). `sink`
    * receives (assignments, batchId, state after, retrained?) — write
    * them wherever the index lives.
    */
  def startIvfMaintenance(vectors: DataFrame, idCol: String, vecCol: String,
      initial: KMeans.Model, k: Int, iters: Int, sampleCap: Int,
      maxShare: Double)(
      sink: (DataFrame, Long, MaintState, Boolean) => Unit)
      : (StreamingQuery, () => MaintState) = {
    @volatile var state = MaintState(initial, 0L)
    val q = vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (asg, st2, retrained) = maintainBatch(
          batch, idCol, vecCol, state, k, iters, sampleCap, maxShare)
        state = st2
        sink(asg, batchId, st2, retrained)
      }
      .start()
    (q, () => state)
  }
}
