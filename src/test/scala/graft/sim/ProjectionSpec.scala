package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProjectionSpec extends SparkSpec {

  test("projects to the requested width, deterministically") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def run() = emb.select(col("vec_id"),
      Ann.project(col("embedding"), outDim = 16).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val a = run()
    assert(a.values.forall(_.length == 16))
    assert(a == run())
  }

  test("projection preserves norms at the JL expectation") {
    // with planes uniform in [-1, 1], E[component²] = 1/3, so
    // E[‖y‖²] = ‖x‖²/3 under the 1/√outDim scaling; the corpus MEAN
    // ratio must sit near 1/3 (deterministic planes → fixed assertion)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val r = emb.select(
      (Ann.dot(Ann.project(col("embedding"), 16),
        Ann.project(col("embedding"), 16)) /
        Ann.dot(col("embedding").cast("array<double>"),
          col("embedding").cast("array<double>"))).as("ratio"))
      .agg(avg(col("ratio"))).head().getDouble(0)
    assert(r > 0.25 && r < 0.42, s"mean norm ratio $r outside JL band")
  }
}
