package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small)
  *    query set against the corpus; one narrow map + per-query top-k
  *    via window rank. The right baseline at any corpus size as long as
  *    the QUERY side is small (it is broadcast).
  *  - [[lshBucketTopK]]: sign-random-projection LSH — corpus and
  *    queries are bucketed by the sign pattern of h fixed hyperplanes;
  *    candidates are only same-bucket rows, so the join scales with
  *    bucket occupancy instead of |corpus|×|queries|. Recall < 1 by
  *    construction; probe multiple bucket groups to trade compute for
  *    recall.
  *
  * Dot products fold left-to-right over the array (functions.aggregate)
  * so float math is order-deterministic and reproducible across runs
  * and engines.
  */
object Ann {

  /** Left-to-right dot product of two array<numeric> columns in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Exact top-k neighbors for each query row.
    * @param corpus  (idCol, vecCol) rows
    * @param queries small DataFrame of (idCol, vecCol) query rows —
    *                broadcast; keep it ≤ a few thousand rows
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = graft.ops.Parallelism.widen(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 6))
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane i is
    * derived from a fixed integer mix — no RNG state, same planes on
    * every executor and every engine.
    */
  def hyperplane(i: Int, dim: Int): Seq[Double] =
    (0 until dim).map { j =>
      val x = (i * 2654435761L + j * 40503L + 17L) % 1009L
      (x.toDouble / 1009.0) * 2.0 - 1.0
    }

  /** Sign-pattern bucket key over h hyperplanes. */
  def lshKey(vec: Column, planes: Seq[Seq[Double]]): Column =
    concat_ws("", planes.map { p =>
      val proj = dot(vec, array(p.map(lit): _*))
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** IVF-Flat approximate top-k — the inverted-file scale path: the
    * corpus is PARTITIONED into `nlist` cells (each vector assigned to
    * its nearest centroid), and a query searches only the `nprobe`
    * cells whose centroids are nearest to it, touching
    * ~`nprobe/nlist` of the corpus instead of all of it.
    *
    * Centroids are SAMPLED deterministically (the `nlist` lowest-id
    * corpus vectors) rather than k-means-trained — training is an
    * offline concern; the partition/probe machinery, which is what an
    * engine provides, is identical and fully reproducible. All
    * similarity math is the left-fold dot product (bit-exact across
    * engines), ties broken by centroid id / neighbor id.
    *
    * Scale shape: centroid table is broadcast twice (corpus assignment
    * and query probing are narrow map stages over `nlist` candidates);
    * the only shuffle is the candidate join on cell id, whose fan-in
    * per query is bounded by the probed cells' occupancy.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cent = corpus.filter(col(idCol) < nlist)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
    def nearestCells(df: DataFrame, outId: String, outVec: String, keep: Int) = {
      val w = Window.partitionBy(col(outId))
        .orderBy(col("csim").desc, col("cid").asc)
      df.crossJoin(broadcast(cent))
        .select(col(outId), col(outVec), col("cid"),
          cosine(col(outVec), col("cv")).as("csim"))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= keep)
        .drop("csim", "r")
    }
    val asg = nearestCells(
      graft.ops.Parallelism.widen(corpus)
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec")),
      "neighbor_id", "cvec", keep = 1)
    val probe = nearestCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")),
      "query_id", "qvec", keep = nprobe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    asg.join(probe, Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 6))
  }

  /** Approximate top-k: candidates restricted to rows sharing the
    * query's LSH bucket, then exact cosine rank within the bucket.
    */
  def lshBucketTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, numPlanes: Int = 8): DataFrame = {
    val dim = 64
    val planes = (0 until numPlanes).map(i => hyperplane(i, dim))
    val c = graft.ops.Parallelism.widen(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
        lshKey(col(vecCol), planes).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      lshKey(col(vecCol), planes).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("cvec")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 6))
  }
}
