package graft.streaming

import graft.SparkSpec
import graft.sim.KMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class MVec(vec_id: Long, v: Array[Double])

class IvfMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  // the 16 well-separated corners of a 4-d cube; the index epoch
  // trains on vectors spread across all of them (more corners than
  // centroids, so no single init draw can starve the spread)
  private def corner(c: Int, jit: Double): Array[Double] =
    Array.tabulate(4)(d => (if (((c >> d) & 1) == 1) 10.0 else -10.0) + jit)

  private def epochCorpus: Seq[MVec] =
    (1 to 200).map(i => MVec(i.toLong, corner(i % 16, (i % 7) * 0.05)))

  // the drifted batch: every vector lands in ONE far-away region the
  // trained centroids never saw
  private def driftedBatch(fromId: Long): Seq[MVec] =
    (0 until 200).map(i => MVec(fromId + i,
      Array.tabulate(4)(d => 100.0 + d + (i % 20) * 0.5)))

  test("a drifted batch trips the threshold, retrains, and flattens occupancy") {
    val initial = KMeans.fit(epochCorpus.toDF("vec_id", "v"),
      "vec_id", "v", k = 8, iters = 3)
    // sanity: the in-distribution corpus is spread under the model
    val inDist = IvfMaintenance.maxCellShare(
      epochCorpus.toDF("vec_id", "v"), "v", initial)
    assert(inDist < 0.5, s"fixture should spread over cells: $inDist")
    // the drifted batch concentrates (everything in 1 cell)
    val drifted = driftedBatch(1000).toDF("vec_id", "v")
    assert(IvfMaintenance.maxCellShare(drifted, "v", initial) > 0.9)

    val (asg, st, retrained) = IvfMaintenance.maintainBatch(
      drifted, "vec_id", "v", IvfMaintenance.MaintState(initial, 0L),
      k = 8, iters = 3, sampleCap = 64, maxShare = 0.5)
    assert(retrained && st.retrains === 1L)
    // post-retrain, the SAME batch spreads across the refreshed cells
    val postShare = IvfMaintenance.maxCellShare(drifted, "v", st.model)
    assert(postShare < 0.5,
      s"occupancy should flatten after retrain: $postShare")
    assert(asg.count() === 200)
  }

  test("an in-distribution batch does NOT retrain; model is untouched") {
    val initial = KMeans.fit(epochCorpus.toDF("vec_id", "v"),
      "vec_id", "v", k = 8, iters = 3)
    val batch = epochCorpus.take(100).toDF("vec_id", "v")
    val (_, st, retrained) = IvfMaintenance.maintainBatch(
      batch, "vec_id", "v", IvfMaintenance.MaintState(initial, 0L),
      k = 8, iters = 3, sampleCap = 64, maxShare = 0.5)
    assert(!retrained && st.retrains === 0L)
    assert(st.model eq initial, "no-drift path must keep the exact model")
  }

  test("streaming loop: drift in batch 2 triggers exactly one retrain " +
    "and post-retrain occupancy flattens") {
    implicit val sqlCtx = spark.sqlContext
    val initial = KMeans.fit(epochCorpus.toDF("vec_id", "v"),
      "vec_id", "v", k = 8, iters = 3)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Boolean, Double)]()
    val mem = MemoryStream[MVec]
    val (q, state) = IvfMaintenance.startIvfMaintenance(
      mem.toDF(), "vec_id", "v", initial,
      k = 8, iters = 3, sampleCap = 64, maxShare = 0.5) {
      (asg: DataFrame, batchId: Long, st: IvfMaintenance.MaintState,
          retrained: Boolean) =>
        // occupancy of THIS batch's assignments under the live model
        val counts = asg.groupBy("cluster").count()
          .collect().map(_.getLong(1))
        val share =
          if (counts.isEmpty) 0.0 else counts.max.toDouble / counts.sum
        seen.add((batchId, retrained, share))
    }
    try {
      mem.addData(epochCorpus.take(100): _*); q.processAllAvailable()
      mem.addData(driftedBatch(5000): _*); q.processAllAvailable()
      mem.addData(driftedBatch(9000): _*); q.processAllAvailable()
    } finally q.stop()
    val log = seen.toArray(Array.empty[(Long, Boolean, Double)])
      .sortBy(_._1)
    assert(log.length === 3)
    assert(!log(0)._2, "in-distribution batch must not retrain")
    assert(log(1)._2, "drifted batch must retrain")
    assert(!log(2)._2,
      "a second batch from the drifted distribution is in-distribution " +
        "for the refreshed model — no retrain churn")
    assert(log(1)._3 < 0.5 && log(2)._3 < 0.5,
      s"post-retrain occupancy must flatten: $log")
    assert(state().retrains === 1L)
  }
}
