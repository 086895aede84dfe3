package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Symmetric int8 scalar quantization (SQ8) of embedding vectors — the
  * mid-tier of the vector-storage hierarchy: 4× smaller than float32
  * with near-exact distances, vs PQ's 32× smaller with coarser
  * distances. At 100 TB the practical layout keeps SQ8 codes hot for
  * re-ranking and PQ codes for the candidate sweep ([[ProductQuantizer]]);
  * this module provides the SQ8 leg.
  *
  * Per-vector symmetric scheme (the FAISS `SQ8` shape): one scale
  * `max(|x_i|)/127` per vector, components quantized to
  * `round(x_i/scale) ∈ [-127, 127]`. Encode and search are each ONE
  * narrow whole-stage-codegen projection — no shuffle, no join, no
  * model state at all (the "codebook" is the per-row scale), so the
  * operator is embarrassingly scan-parallel at any corpus size.
  *
  * Cross-engine determinism: rounding is `floor(v/scale + 0.5)` —
  * explicit half-up, identical in Spark and DuckDB (whose `round`
  * built-ins disagree on ties) — and all distance arithmetic is the
  * same left-fold dot used by [[KMeans]]/[[ProductQuantizer]], so the
  * oracle replays encode AND search bit-for-bit.
  */
object ScalarQuantizer {

  private def dot(a: Column, b: Column): Column =
    graft.functions.TextHashes.dot_fold(a, b)

  /** Half-up integer rounding, stable across engines. */
  private def qround(c: Column): Column =
    floor(c + lit(0.5)).cast(IntegerType)

  /** (id, scale, qv) staging shared by encode and search: the casted
    * vector, its per-vector scale (all-zero vectors get scale 1 so the
    * division is total), and the int8 component array.
    */
  private def staged(vectors: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val x = col(vecCol).cast(ArrayType(DoubleType))
    graft.ops.Parallelism.widen(vectors)
      .select(col(idCol), x.as("__x"))
      .withColumn("__ma", array_max(transform(col("__x"), v => abs(v))))
      .withColumn("__scale",
        when(col("__ma") === 0.0, lit(1.0)).otherwise(col("__ma") / 127.0))
      .withColumn("__q", transform(col("__x"), v => qround(v / col("__scale"))))
  }

  /** Encode every vector: (idCol, scale, code, err) where `code` is
    * the comma-joined int8 components (a string — survives every
    * downstream tabulator, like [[ProductQuantizer.encode]]'s code)
    * and `err` the squared-L2 reconstruction error of the dequantized
    * vector, rounded to 6 dp. One narrow projection.
    */
  def encode(vectors: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val dq = transform(col("__q"), c => c.cast(DoubleType) * col("__scale"))
    val diff = zip_with(col("__x"), dq, (a, b) => a - b)
    staged(vectors, idCol, vecCol)
      .select(col(idCol), col("__scale").as("scale"),
        array_join(transform(col("__q"), c => c.cast(StringType)), ",").as("code"),
        round(greatest(dot(diff, diff), lit(0.0)), 6).as("err"))
  }

  /** Top-n nearest vectors to `query` by squared-L2 against the
    * DEQUANTIZED corpus (the SQ8 re-rank primitive): encode is fused
    * into the same narrow projection, distance is one left-fold over
    * the reconstructed components, then TakeOrdered. Ties break to the
    * lower id. Output: (idCol, dist).
    */
  def topK(vectors: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], n: Int): DataFrame = {
    val dq = transform(col("__q"), c => c.cast(DoubleType) * col("__scale"))
    val diff = zip_with(dq, typedLit(query), (a, b) => a - b)
    staged(vectors, idCol, vecCol)
      .select(col(idCol), dot(diff, diff).as("__dist"))
      .orderBy(col("__dist").asc, col(idCol).asc)
      .limit(n)
      .select(col(idCol),
        round(greatest(col("__dist"), lit(0.0)), 6).as("dist"))
  }
}
