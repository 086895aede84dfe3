package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NN-Descent k-NN graph laws: top-k shape, per-node quality
  * monotonicity across rounds (the keep-current-edges rule makes each
  * round's pool a superset of the last graph), measured recall
  * improvement over the LSH seed, and partitioning invariance.
  */
class KnnGraphSpec extends SparkSpec {
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def exactGraph: DataFrame =
    Ann.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 3)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))

  test("top-k shape: at most k rows per node, ranks dense from 1") {
    val g = KnnGraph.build(emb, "vec_id", "embedding", k = 3, rounds = 1)
    val bad = g.groupBy("src")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .filter(col("n") > 3 || col("mx") =!= col("n") || col("mn") =!= 1)
    assert(bad.count() === 0)
  }

  test("refinement improves recall over the LSH seed, monotonically") {
    val exact = exactGraph.cache()
    val r = (0 to 2).map { rounds =>
      KnnGraph.recall(
        KnnGraph.build(emb, "vec_id", "embedding", k = 3, rounds = rounds),
        exact)
    }
    // pool keeps current edges, so recall can never drop
    assert(r(1) >= r(0) && r(2) >= r(1),
      s"recall must be monotone across rounds: $r")
    // and descent genuinely repairs the seed's misses on this corpus
    assert(r(2) > r(0), s"two rounds should beat the seed: $r")
    exact.unpersist()
  }

  test("per-node rank-1 similarity never degrades across rounds") {
    def best(rounds: Int) =
      KnnGraph.build(emb, "vec_id", "embedding", k = 3, rounds = rounds)
        .filter(col("rank") === 1)
        .select(col("src"), col("sim"))
    val degraded = best(0).as("a")
      .join(best(2).as("b"), col("a.src") === col("b.src"))
      .filter(col("b.sim") < col("a.sim"))
    assert(degraded.count() === 0)
  }

  test("partitioning invariance: same graph at 3 and 7 input partitions") {
    def run(p: Int) =
      KnnGraph.build(emb.repartition(p), "vec_id", "embedding",
        k = 3, rounds = 2)
        .orderBy("src", "rank")
        .collect()
        .map(_.toSeq)
        .toSeq
    assert(run(3) === run(7))
  }
}
