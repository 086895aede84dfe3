package graft.sim

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PERSISTED IVF-PQ index — the write-once / query-many serving layer
  * that [[ProductQuantizer.ivfAdcTopK]]'s train-per-query path grows
  * into at scale. The index IS a table:
  *
  * {{{
  *   <path>/model/   bounded model state (coarse centroids, PQ
  *                   codebooks, layout + corpus fingerprint) — a few
  *                   hundred rows regardless of N
  *   <path>/codes/cell=<c>/  one parquet partition per coarse cell:
  *                   (vec_id, c0..c{m-1} PQ codes) — the corpus
  *                   compressed to m small ints per row
  * }}}
  *
  * The probe never touches raw vectors and never trains: it loads the
  * bounded model, picks the query's `nprobe` nearest cells
  * DRIVER-side, and reads ONLY those `cell=` directories — the
  * `cell.isin(probed)` filter is genuine partition pruning visible in
  * the scan node (spec-pinned via the scanned file list), so at
  * 100 TB a 3-of-1024-cell probe plans 0.3% of the corpus before any
  * per-row work. Ranking is the same literal ADC table lookup as the
  * in-query path — same summation order, same tie-break — so a
  * persisted probe returns BIT-FOR-BIT the rows `ivfAdcTopK` computes
  * from scratch (spec-pinned).
  *
  * Staleness is handled, not assumed away: the model rows carry a
  * layout version, the build hyperparameters, and a cheap corpus
  * fingerprint (count + sum of id hashes — order/partitioning
  * independent); [[ensure]] rebuilds when any of them disagree, so a
  * regenerated corpus or a code-layout change can never serve stale
  * neighbors silently.
  */
object AnnIndex {

  /** Bump when the on-disk layout changes shape — a version mismatch
    * forces a rebuild instead of misreading old files.
    */
  val LayoutVersion = 1

  final case class Params(dims: Int, coarseK: Int, coarseIters: Int,
      m: Int, k: Int, pqIters: Int, nprobeDefault: Int)

  final case class Models(coarse: KMeans.Model, pq: ProductQuantizer.Model,
      params: Params)

  /** Canonical index location for a testdata dir — one index per
    * (scale factor, layout version), under the system tmp dir so
    * repeated Verify/Bench invocations reuse the build.
    */
  def defaultPath(sfDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_ann_index_v$LayoutVersion/" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Order/partitioning-independent corpus fingerprint: row count and
    * an exact integer sum of per-id hashes. One cheap aggregate —
    * the price of never serving an index built from a different
    * corpus.
    */
  def fingerprint(vectors: DataFrame, idCol: String): (Long, Long) = {
    val r = vectors.select(
      count(lit(1)).as("n"),
      sum(graft.text.TextAnalysis.hash60(col(idCol).cast(StringType)))
        .as("h")).collect().head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private val modelSchema = StructType(Seq(
    StructField("kind", StringType),    // meta | coarse | pq
    StructField("sub", IntegerType),    // pq subspace (-1 otherwise)
    StructField("cluster", IntegerType),
    StructField("vec", ArrayType(DoubleType)),
    // corpus fingerprint, meta row only — LONG columns, never stuffed
    // into the double array: the id-hash sum is ~2^69 and would lose
    // low bits through a double, silently defeating the stale check
    StructField("fp_n", LongType),
    StructField("fp_h", LongType)))

  /** Encode the corpus for persistence: (vec_id, c0..c{m-1}, cell).
    * ONE narrow pass — cell assignment and every subspace argmin are
    * literal-centroid expressions over slices of the vector.
    */
  def encodeCells(vectors: DataFrame, idCol: String, vecCol: String,
      coarse: KMeans.Model, pq: ProductQuantizer.Model): DataFrame = {
    val asg = KMeans.assignWith(vectors, idCol, vecCol, coarse)
    val staged = asg.select((col("vec_id") +: col("cluster").as("cell") +:
      pq.codebooks.indices.map(j =>
        slice(col("x"), j * pq.width + 1, pq.width).as(s"__s$j"))): _*)
    staged.select((col("vec_id") +: col("cell") +:
      pq.codebooks.indices.map { j =>
        val s = col(s"__s$j")
        KMeans.bestOf(s, graft.functions.TextHashes.dot_fold(s, s),
          pq.codebooks(j)).getField("cluster").as(s"c$j")
      }): _*)
      .select((col("vec_id") +:
        pq.codebooks.indices.map(j => col(s"c$j"))) :+ col("cell"): _*)
  }

  /** Train (on `train`) and persist the full index for `vectors` at
    * `path`. Returns the trained models. The codes table is written
    * partitioned by cell via the idempotent dynamic-overwrite sink.
    */
  def build(vectors: DataFrame, idCol: String, vecCol: String,
      train: DataFrame, params: Params, path: String): Models = {
    val spark = vectors.sparkSession
    val coarse = KMeans.fit(train, idCol, vecCol,
      params.coarseK, params.coarseIters)
    val pq = ProductQuantizer.fit(train, idCol, vecCol,
      params.dims, params.m, params.k, params.pqIters)
    graft.sources.ParquetSink.overwritePartitions(
      encodeCells(vectors, idCol, vecCol, coarse, pq),
      s"$path/codes", Seq("cell"))
    val (fpN, fpH) = fingerprint(vectors, idCol)
    val meta = Row("meta", -1, -1, Seq[Double](LayoutVersion,
      params.dims, params.coarseK, params.coarseIters,
      params.m, params.k, params.pqIters, params.nprobeDefault),
      fpN, fpH)
    val coarseRows = coarse.centroids.map { case (cl, v) =>
      Row("coarse", -1, cl, v, 0L, 0L)
    }
    val pqRows = pq.codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.centroids.map { case (cl, v) => Row("pq", j, cl, v, 0L, 0L) }
    }
    spark.createDataFrame(
      java.util.Arrays.asList((meta +: coarseRows) ++ pqRows: _*),
      modelSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/model")
    Models(coarse, pq, params)
  }

  /** The persisted model, or None when absent / layout-version
    * mismatch / malformed. The fingerprint stored at build time rides
    * along for [[ensure]]'s staleness check.
    */
  def loadModels(spark: SparkSession, path: String):
      Option[(Models, (Long, Long))] =
    try {
      val rows = spark.read.schema(modelSchema).parquet(s"$path/model")
        .collect()
      val metaRow = rows.find(_.getString(0) == "meta")
        .getOrElse(return None)
      val meta = metaRow.getSeq[Double](3)
      if (meta.length != 8 || meta.head.toInt != LayoutVersion) return None
      val params = Params(meta(1).toInt, meta(2).toInt, meta(3).toInt,
        meta(4).toInt, meta(5).toInt, meta(6).toInt, meta(7).toInt)
      val coarse = KMeans.Model(rows.filter(_.getString(0) == "coarse")
        .map(r => (r.getInt(2), r.getSeq[Double](3)))
        .sortBy(_._1).toIndexedSeq)
      val books = rows.filter(_.getString(0) == "pq")
        .groupBy(_.getInt(1)).toSeq.sortBy(_._1)
        .map { case (_, rs) =>
          KMeans.Model(rs.map(r => (r.getInt(2), r.getSeq[Double](3)))
            .sortBy(_._1).toIndexedSeq)
        }
      if (coarse.centroids.size != params.coarseK ||
        books.size != params.m) return None
      Some((Models(coarse,
        ProductQuantizer.Model(params.dims / params.m, books), params),
        (metaRow.getLong(4), metaRow.getLong(5))))
    } catch {
      // NonFatal, NOT Throwable: the early `return None` guards above
      // unwind via ControlThrowable, which a Throwable catch would
      // swallow into the same None — correct by accident; this keeps
      // the control flow explicit instead
      case scala.util.control.NonFatal(_) => None
    }

  /** Load-or-build: reuse the persisted index iff the layout version,
    * hyperparameters AND corpus fingerprint all match; rebuild
    * otherwise. Returns (models, builtNow).
    */
  def ensure(vectors: DataFrame, idCol: String, vecCol: String,
      train: DataFrame, params: Params, path: String): (Models, Boolean) = {
    val spark = vectors.sparkSession
    loadModels(spark, path) match {
      case Some((m, storedFp)) if m.params == params &&
          storedFp == fingerprint(vectors, idCol) => (m, false)
      case _ =>
        (build(vectors, idCol, vecCol, train, params, path), true)
    }
  }

  /** Serve a top-n query from the PERSISTED index: driver-side cell
    * pick against the bounded coarse model, a partition-pruned scan of
    * the probed `cell=` directories, literal ADC table lookups, and a
    * TakeOrdered — no training, no raw vectors, no join, no shuffle
    * before the final top-n. Output (vec_id, code, adist) is
    * bit-identical to [[ProductQuantizer.ivfAdcTopK]] on the same
    * models: same per-subspace tables, same left-to-right summation,
    * same (unrounded adist, id) tie-break, same clamp-then-round.
    */
  def probe(spark: SparkSession, path: String, models: Models,
      query: Seq[Double], nprobe: Int, n: Int): DataFrame = {
    val pq = models.pq
    require(query.length == pq.m * pq.width,
      "query dims must match the model")
    val probed = ProductQuantizer.probeCells(models.coarse, query, nprobe)
    val tables: Seq[Seq[Double]] = pq.codebooks.zipWithIndex.map {
      case (cb, j) =>
        val q = query.slice(j * pq.width, (j + 1) * pq.width)
        val qq = q.foldLeft(0.0)((acc, x) => acc + x * x)
        val byId = cb.centroids.toMap
        cb.centroids.indices.map { c =>
          val cv = byId(c)
          qq - 2.0 * q.zip(cv).foldLeft(0.0) {
            case (acc, (a, b)) => acc + a * b
          } + cv.foldLeft(0.0)((a, x) => a + x * x)
        }
    }
    val codes = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(probed: _*))
    val adist = pq.codebooks.indices
      .map(j => element_at(typedLit(tables(j)), col(s"c$j") + 1))
      .reduceLeft(_ + _)
    codes.select(col("vec_id"),
      concat_ws("-", pq.codebooks.indices.map(j => col(s"c$j")): _*)
        .as("code"),
      adist.as("__adist"))
      .orderBy(col("__adist").asc, col("vec_id").asc)
      .limit(n)
      .select(col("vec_id"), col("code"),
        round(greatest(col("__adist"), lit(0.0)), 6).as("adist"))
  }
}
