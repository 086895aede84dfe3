package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal marginal relevance (MMR, Carbonell & Goldstein, SIGIR 1998)
  * — diverse top-k selection: greedily pick the candidate maximizing
  * `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`, so each pick trades
  * relevance to the query against redundancy with what is already
  * selected. The curation use: assembling a diverse exemplar set
  * (few-shot pools, eval seeds, dedup-aware retrieval) where plain
  * top-k returns k near-copies of the same neighborhood.
  *
  * Two-stage shape, the only one that scales:
  *  - Stage 1 (distributed): exact cosine relevance over the corpus,
  *    ONE narrow fold pass + TakeOrdered top-`poolSize` — no shuffle,
  *    no pairwise work at corpus size.
  *  - Stage 2 (driver, bounded): the O(pool²) greedy over the
  *    collected pool — poolSize·dim doubles of bounded state, the same
  *    class as k-means centroids, NOT a data collect (pool size is a
  *    constant knob, independent of N).
  *
  * Greedy arithmetic (left-fold dots, cosine zero-guard, tie-break to
  * the lower id) matches the engines' shared kernels, so the full
  * selection — pool boundary, every pick, every score — replays
  * bit-for-bit in a DuckDB recursive CTE (`q_mmr`).
  */
object Mmr {

  private def dotf(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }

  /** Diverse top-k: (sel_rank, idCol, score), sel_rank 1-based in pick
    * order. `poolSize` bounds stage-2 state; `lambda` ∈ [0, 1] weights
    * relevance (1 = plain top-k, 0 = pure diversity after the first
    * pick).
    */
  def selectDiverse(corpus: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, poolSize: Int,
      lambda: Double): DataFrame = {
    require(k >= 1 && poolSize >= k, "need poolSize >= k >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val spark = corpus.sparkSession
    val qn = math.sqrt(dotf(query, query))
    // stage 1: narrow relevance pass + bounded TakeOrdered collect
    val pool = graft.ops.Parallelism.widen(corpus)
      .select(col(idCol).as("vec_id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("x"))
      .withColumn("nrm", Ann.norm(col("x")))
      .withColumn("rel",
        Ann.cosinePre(Ann.dot(col("x"), typedLit(query)), col("nrm"), lit(qn)))
      .orderBy(col("rel").desc, col("vec_id").asc)
      .limit(poolSize)
      .select(col("vec_id"), col("x"), col("nrm"), col("rel"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2),
        r.getDouble(3)))
    // stage 2: greedy over the bounded pool, engine-identical arithmetic
    val byId = pool.map(p => p._1 -> p).toMap
    def sim(a: Long, b: Long): Double = {
      val (_, xa, na, _) = byId(a); val (_, xb, nb, _) = byId(b)
      val d = na * nb
      if (d > 0) dotf(xa, xb) / d else 0.0
    }
    val one = 1 - lambda
    var selected = Vector.empty[(Long, Double)] // (id, score) in pick order
    while (selected.size < math.min(k, pool.length)) {
      val chosen = pool.iterator
        .filterNot(p => selected.exists(_._1 == p._1))
        .map { case (id, _, _, rel) =>
          val red =
            if (selected.isEmpty) 0.0
            else selected.map(s => sim(id, s._1)).max
          (id, lambda * rel - one * red)
        }
        .reduceLeft { (a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a
        }
      selected :+= chosen
    }
    val rows = selected.zipWithIndex.map { case ((id, sc), i) =>
      (i + 1L, id, sc)
    }
    import spark.implicits._
    rows.toDF("sel_rank", "vec_id", "score")
      .select(col("sel_rank"), col("vec_id").as(idCol),
        round(col("score"), 6).as("score"))
  }
}
