package graft.functions

import graft.SparkSpec
import graft.sim.KMeans
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The nearest-centroid kernel's contract: bit-identical to the
  * composed `array_min`-over-literal-candidates form it replaced (four
  * scale factors of strict hash gates sit on that arithmetic), and
  * codegen-safe at the k·dim sizes where the composed form blew
  * Janino's 64 KB method limit and dropped its stage out of
  * whole-stage codegen.
  */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  /** The EXACT pre-r14 composed formulation, kept here as the
    * reference semantics the kernel must reproduce.
    */
  private def composedBestOf(x: org.apache.spark.sql.Column,
      xx: org.apache.spark.sql.Column,
      m: KMeans.Model): org.apache.spark.sql.Column = {
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      TextHashes.dot_fold(a, b)
    def selfDot(v: Seq[Double]): Double =
      v.foldLeft(0.0)((acc, c) => acc + c * c)
    val cands = m.centroids.map { case (cl, cv) =>
      struct(
        (xx - lit(2.0) * dot(x, typedLit(cv)) + lit(selfDot(cv)))
          .as("dist2"),
        lit(cl).as("cluster"))
    }
    array_min(array(cands: _*))
  }

  test("kernel ≡ composed array_min form, bit-for-bit, on real embeddings") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val m = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val base = emb.select(col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("x"))
      .withColumn("xx", TextHashes.dot_fold(col("x"), col("x")))
    val kernel = KMeans.assignDist(emb, "vec_id", "embedding", m)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val composed = base
      .withColumn("best", composedBestOf(col("x"), col("xx"), m))
      .select(col("vec_id"), col("best.cluster").as("cluster"),
        round(greatest(col("best.dist2"), lit(0.0)), 6).as("dist2"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(kernel.nonEmpty && kernel == composed)
  }

  test("exact dist ties break to the lower cluster id, independent of model order") {
    // two centroids at the same point, listed HIGHER id first: the
    // composed array_min falls through to the cluster field; the
    // kernel must do the same rather than keep the first seen
    val m = KMeans.Model(Seq(7 -> Seq(1.0, 1.0), 2 -> Seq(1.0, 1.0)))
    val df = Seq((0L, Seq(0.5, 0.5)), (1L, Seq(3.0, -1.0)))
      .toDF("vec_id", "embedding")
    val out = KMeans.assignWith(df, "vec_id", "embedding", m)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out == Map(0L -> 2, 1L -> 2))
  }

  test("kernel argmin uses Double.compare after the == short-circuit (NaN greatest)") {
    // a NaN distance must lose to any finite distance (Spark's struct
    // ordering treats NaN as the greatest double): centroid 0 produces
    // NaN via a NaN component; centroid 1 is finite
    val cents = Array(Double.NaN, 0.0, /* c1 */ 1.0, 1.0)
    val ccs = Array(Double.NaN, 2.0)
    val ids = Array(0, 1)
    val vec = new GenericArrayData(Array[Any](1.0, 2.0))
    val row = NearestCentroidKernel.best(vec, 5.0, cents, ccs, ids, 2)
    assert(row.getInt(1) == 1)
    // and two NaNs tie → lower id (Double.compare(NaN, NaN) == 0 via
    // the == short-circuit being FALSE then compare returning 0)
    val cents2 = Array(Double.NaN, 0.0, Double.NaN, 0.0)
    val ccs2 = Array(Double.NaN, Double.NaN)
    val ids2 = Array(5, 3)
    val row2 = NearestCentroidKernel.best(vec, 5.0, cents2, ccs2, ids2, 2)
    assert(row2.getInt(1) == 3)
  }

  test("null element / length mismatch / null input degrade to null") {
    val m = KMeans.Model(Seq(0 -> Seq(1.0, 1.0)))
    val cents = Array(1.0, 1.0); val ccs = Array(2.0); val ids = Array(0)
    assert(NearestCentroidKernel.best(
      new GenericArrayData(Array[Any](1.0, null)), 1.0, cents, ccs, ids, 2) == null)
    assert(NearestCentroidKernel.best(
      new GenericArrayData(Array[Any](1.0)), 1.0, cents, ccs, ids, 2) == null)
    val df = Seq((0L, Seq(0.5, 0.5))).toDF("vec_id", "embedding")
      .withColumn("embedding", when(lit(false), col("embedding")))
    val out = KMeans.assignWith(df, "vec_id", "embedding", m).collect()
    assert(out.length == 1 && out.head.isNullAt(2))
  }

  test("training-shaped stage stays under the 64 KB codegen method limit at k=64, dim=64") {
    // the r13 fallback shape: assign → posexplode → partial agg, with a
    // model big enough that the composed form exceeded Janino's limit.
    // codegenStringSeq COMPILES each WholeStageCodegen subtree and
    // reports max method bytecode — every subtree must compile and stay
    // under the 64 KB hard limit (and under Spark's 65535 fallback
    // threshold, i.e. no stage would run interpreted).
    import org.apache.spark.sql.execution.debug._
    val k = 64; val dim = 64
    val m = KMeans.Model((0 until k).map(c =>
      c -> (0 until dim).map(d => (c * dim + d) / 1000.0)))
    val vecs = (0L until 8L).map(i =>
      (i, (0 until dim).map(d => (i + d) / 100.0))).toDF("vec_id", "embedding")
    // AQE wraps the plan in AdaptiveSparkPlanExec, whose
    // WholeStageCodegen subtrees only materialize at execution — turn
    // it off for the static inspection
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val stats = try {
      val plan = KMeans.assignWith(vecs, "vec_id", "embedding", m)
        .select(col("cluster"), posexplode(col("x")).as(Seq("dim", "comp")))
        .groupBy(col("cluster"), col("dim"))
        .agg(sum(round(col("comp") * KMeans.Scale).cast(LongType)).as("sq"))
        .queryExecution.executedPlan
      codegenStringSeq(plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(stats.nonEmpty, "expected at least one WholeStageCodegen subtree")
    stats.foreach { case (_, _, bc) =>
      assert(bc.maxMethodCodeSize > 0,
        "subtree failed to compile (codegen fallback would kick in)")
      assert(bc.maxMethodCodeSize < 65535,
        s"generated method ${bc.maxMethodCodeSize} bytes — over the " +
          "whole-stage-codegen fallback threshold")
    }
  }
}
