package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (PQ) — the vector-compression layer of
  * IVF-PQ-style ANN indexes: split each d-dim embedding into `m`
  * equal-width subvectors and quantize each subspace independently to
  * one of `k` learned centroids, so a vector stores as m small codes
  * (m·log2 k bits) instead of d floats. At 100 TB of embeddings the
  * raw vectors don't fit anywhere hot; the PQ codes do, and
  * asymmetric distance (query vs per-subspace codebooks) ranks
  * candidates without touching the raw vectors.
  *
  * Built on [[KMeans]]'s deterministic Lloyd machinery, so codebooks
  * and codes are reproducible across runs, partitionings, and engines
  * (the DuckDB oracle replays training bit-for-bit): per-subspace
  * init is the same hash-ordered draw, updates are exact quantized
  * integer sums, assignment ties break to the lower centroid id.
  *
  * Scale shape: training runs m independent bounded-state fits
  * (driver holds m·k·(d/m) doubles — the classic codebook, independent
  * of N); encoding is ONE narrow projection — every subspace argmin is
  * an array_min over k literal-centroid structs on a slice of the
  * vector, no join, no shuffle, whole-stage-codegen friendly.
  */
object ProductQuantizer {

  /** Trained per-subspace codebooks; `width` = dims / m. */
  final case class Model(width: Int, codebooks: Seq[KMeans.Model]) {
    def m: Int = codebooks.size
  }

  /** Train m codebooks of k centroids each over `dims`-dim vectors.
    * `dims` must split into m equal subspaces.
    *
    * The m subspace trainings run FUSED: every Lloyd round is ONE
    * corpus pass computing all m argmin assignments per row (narrow
    * literal-centroid expressions) and one partial-aggregated shuffle
    * of (subspace, cluster, dim) exact integer sums — instead of m
    * independent [[KMeans.fitFrom]] loops each scanning the cached
    * corpus per round. Total passes: iters + 1 (init draw), down from
    * m·iters + 1; the per-round arithmetic (assignment formula,
    * tie-break, round(x·Scale) integer update) is IDENTICAL to the
    * per-subspace fits, so the trained model is bit-equal and the
    * unrolled oracle replay is unaffected.
    */
  /** `warmStart`: continue Lloyd from an existing model's codebooks
    * instead of the hash-ordered init draw — the OPQ alternation needs
    * this (a fresh per-round init would re-randomize the local minimum
    * and break the monotone rotation/codebook descent,
    * [[Opq.fit]]'s contract).
    */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, k: Int, iters: Int,
      warmStart: Option[Model] = None): Model = {
    require(m >= 1 && dims % m == 0, "dims must split into m equal subspaces")
    val w = dims / m
    val x = vectors.select(col(idCol),
      col(vecCol).cast(ArrayType(DoubleType)).as("__pq_x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE init draw of full vectors, sliced per subspace: the
      // hash-ordered sample depends only on ids, so m separate
      // per-subspace draws would sort the corpus m times to select
      // the same rows
      var books: IndexedSeq[KMeans.Model] = warmStart match {
        case Some(prev) =>
          require(prev.m == m && prev.width == w,
            s"warm start shape (m=${prev.m}, w=${prev.width}) must match " +
              s"(m=$m, w=$w)")
          prev.codebooks.toIndexedSeq
        case None =>
          val h = graft.text.TextAnalysis.hash60(col(idCol).cast(StringType))
          val init = x.orderBy(h.asc, col(idCol).asc).limit(k)
            .select(col("__pq_x")).collect()
            .zipWithIndex
            .map { case (r, i) => (i, r.getSeq[Double](0)) }
            .toSeq
          require(init.nonEmpty, "PQ training needs a non-empty vector input")
          (0 until m).map { j =>
            KMeans.Model(init.map { case (cl, v) =>
              (cl, v.slice(j * w, j * w + w))
            }.toIndexedSeq)
          }.toIndexedSeq
      }
      val slices = (0 until m).map(j => slice(col("__pq_x"), j * w + 1, w))
      for (_ <- 0 until iters) {
        // one fused job: (subspace, cluster, dim) → exact integer sums
        val entries = flatten(array((0 until m).map { j =>
          val s = slices(j)
          val cl = KMeans.bestOf(s, dot(s, s), books(j)).getField("cluster")
          transform(sequence(lit(0), lit(w - 1)), d =>
            struct(lit(j).as("sub"), cl.as("cluster"), d.as("dim"),
              round(element_at(s, d + 1) * KMeans.Scale)
                .cast(LongType).as("q")))
        }: _*))
        val sums = x.select(explode(entries).as("e"))
          .groupBy(col("e.sub"), col("e.cluster"), col("e.dim"))
          .agg(sum(col("e.q")).as("sq"), count(lit(1)).as("cnt"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
        books = books.zipWithIndex.map { case (book, j) =>
          KMeans.Model(book.centroids.map { case (cl, old) =>
            sums.get((j, cl)) match {
              case Some(rows) =>
                val byDim = rows
                  .map(r => r.getInt(2) -> (r.getLong(3), r.getLong(4))).toMap
                (cl, old.indices.map { d =>
                  val (sq, cnt) = byDim(d)
                  sq.toDouble / cnt / KMeans.Scale
                })
              case None => (cl, old) // empty cluster: keep previous centroid
            }
          })
        }
      }
      Model(w, books)
    } finally x.unpersist()
  }

  private def dot(a: Column, b: Column): Column =
    graft.functions.TextHashes.dot_fold(a, b)

  /** Encode every vector: (idCol, code, err) where `code` is the m
    * centroid ids joined as "c0-c1-…" (a string, not an array — array
    * cells don't survive every downstream tabulator) and `err` the
    * summed per-subspace quantization error (clamped ≥ 0 before the
    * 6-dp round; near-centroid cancellation can go epsilon-negative).
    * One narrow projection over the corpus; the model rides as
    * literals.
    */
  def encode(vectors: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    val staged = graft.ops.Parallelism.widen(vectors)
      .select(col(idCol),
        col(vecCol).cast(ArrayType(DoubleType)).as("__pq_x"))
      .select((col(idCol) +: model.codebooks.indices.map(j =>
        slice(col("__pq_x"), j * model.width + 1, model.width)
          .as(s"__s$j"))): _*)
    val bested = staged.select((col(idCol) +:
      model.codebooks.indices.map { j =>
        val s = col(s"__s$j")
        KMeans.bestOf(s, dot(s, s), model.codebooks(j)).as(s"__b$j")
      }): _*)
    val errSum = model.codebooks.indices
      .map(j => greatest(col(s"__b$j.dist2"), lit(0.0)))
      .reduceLeft(_ + _)
    bested.select(col(idCol),
      concat_ws("-", model.codebooks.indices.map(j =>
        col(s"__b$j.cluster")): _*).as("code"),
      round(errSum, 6).as("err"))
  }

  /** Train-then-encode convenience with the single-pass output shape
    * the correctness gate checks.
    */
  def fitEncode(vectors: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int, k: Int, iters: Int): DataFrame =
    encode(vectors, idCol, vecCol,
      fit(vectors, idCol, vecCol, dims, m, k, iters))

  /** Left-fold dot matching the engines' list_reduce order — the
    * driver-side twin of [[graft.functions.TextHashes.dot_fold]], used
    * so the ADC distance tables computed here agree bit-for-bit with
    * an engine recomputing them.
    */
  private def dotFold(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }

  /** Asymmetric-distance top-n search (the query side of IVF-PQ): rank
    * the corpus by the PQ approximation of squared-L2 to `query` —
    * each subspace's distance from the query slice to every centroid
    * is precomputed driver-side (an m×k table, the classic ADC lookup
    * table), and a corpus row's score is the sum of its m table
    * entries. ONE narrow projection (slices → literal-codebook argmin
    * → literal-table lookup) followed by a TakeOrdered top-n — no
    * join, no shuffle, no touching raw vector arithmetic per row
    * beyond the m argmins. Ties break to the lower id. Output:
    * (idCol, code, adist) for the n nearest.
    */
  def adcTopK(vectors: DataFrame, idCol: String, vecCol: String,
      model: Model, query: Seq[Double], n: Int): DataFrame = {
    require(query.length == model.m * model.width,
      "query dims must match the model")
    val tables: Seq[Seq[Double]] = model.codebooks.zipWithIndex.map {
      case (cb, j) =>
        val q = query.slice(j * model.width, (j + 1) * model.width)
        val qq = q.foldLeft(0.0)((acc, x) => acc + x * x)
        val byId = cb.centroids.toMap
        cb.centroids.indices.map { c =>
          val cv = byId(c)
          qq - 2.0 * dotFold(q, cv) + cv.foldLeft(0.0)((a, x) => a + x * x)
        }
    }
    val staged = graft.ops.Parallelism.widen(vectors)
      .select(col(idCol),
        col(vecCol).cast(ArrayType(DoubleType)).as("__pq_x"))
      .select((col(idCol) +: model.codebooks.indices.map(j =>
        slice(col("__pq_x"), j * model.width + 1, model.width)
          .as(s"__s$j"))): _*)
    val bested = staged.select((col(idCol) +:
      model.codebooks.indices.map { j =>
        val s = col(s"__s$j")
        KMeans.bestOf(s, dot(s, s), model.codebooks(j)).as(s"__b$j")
      }): _*)
    val adist = model.codebooks.indices
      .map(j => element_at(typedLit(tables(j)), col(s"__b$j.cluster") + 1))
      .reduceLeft(_ + _)
    bested.select(col(idCol),
      concat_ws("-", model.codebooks.indices.map(j =>
        col(s"__b$j.cluster")): _*).as("code"),
      adist.as("__adist"))
      .orderBy(col("__adist").asc, col(idCol).asc)
      .limit(n)
      .select(col(idCol), col("code"),
        round(greatest(col("__adist"), lit(0.0)), 6).as("adist"))
  }

  private def selfDot(v: Seq[Double]): Double =
    v.foldLeft(0.0)((acc, x) => acc + x * x)

  /** IVF-ADC search — the composed IVF-PQ query path: assign the
    * corpus to `coarse` k-means cells (narrow literal argmin), keep
    * only the query's `nprobe` nearest cells, ADC-rank the survivors.
    * The cell pick happens driver-side against the bounded coarse
    * codebook; at production scale, with the corpus laid out
    * partitioned by cell, the `isin` filter is partition pruning that
    * skips (1 − nprobe/nlist) of the data before any per-row work.
    *
    * Simplification vs textbook IVF-PQ, deliberate: `model` quantizes
    * RAW vectors, not per-cell residuals, so one global codebook
    * serves every cell and encode stays a single narrow pass. The
    * residual variant costs a per-cell codebook train (k_coarse
    * bounded fits) and subtracting the cell centroid before encode —
    * same plan shapes, more model state.
    */
  def ivfAdcTopK(vectors: DataFrame, idCol: String, vecCol: String,
      coarse: KMeans.Model, model: Model, query: Seq[Double],
      nprobe: Int, n: Int): DataFrame = {
    require(nprobe >= 1, "need at least one probed cell")
    val probed = probeCells(coarse, query, nprobe)
    val cells = KMeans.assignWith(vectors, idCol, vecCol, coarse)
      .filter(col("cluster").isin(probed: _*))
      .select(col("vec_id").as(idCol), col("x").as(vecCol))
    adcTopK(cells, idCol, vecCol, model, query, n)
  }

  /** The query's `nprobe` nearest coarse cells, driver-side against the
    * bounded codebook — distance formula and tie-break match the
    * engines' assignment kernel exactly.
    */
  private[sim] def probeCells(coarse: KMeans.Model, query: Seq[Double],
      nprobe: Int): Seq[Int] = {
    val qq = selfDot(query)
    coarse.centroids
      .map { case (cl, cv) =>
        (qq - 2.0 * dotFold(query, cv) + selfDot(cv), cl)
      }
      .sortBy { case (dist, cl) => (dist, cl) }
      .take(nprobe).map(_._2)
  }

  /** Residual frame: (idCol, vecCol, __cell) where vecCol holds
    * x − centroid(cell(x)). One narrow stage — the assignment argmin
    * and the zip_with subtraction are both literal-centroid
    * expressions, no join. The subtraction is bit-exact across engines
    * (float operands promote to double exactly), so residual-trained
    * codebooks replay in the oracle like raw-vector ones.
    */
  def residuals(vectors: DataFrame, idCol: String, vecCol: String,
      coarse: KMeans.Model): DataFrame = {
    val cents = typedLit(coarse.centroids.sortBy(_._1).map(_._2))
    KMeans.assignWith(vectors, idCol, vecCol, coarse)
      .select(col("vec_id").as(idCol),
        zip_with(col("x"), element_at(cents, col("cluster") + 1),
          (a, b) => a - b).as(vecCol),
        col("cluster").as("__cell"))
  }

  /** Train the PQ codebooks on coarse-cell RESIDUALS r = x − q1(x) —
    * textbook IVF-ADC (Jégou, Douze, Schmid, "Product Quantization for
    * Nearest Neighbor Search", PAMI 2011): residuals concentrate the
    * energy the codes must span from the corpus-wide spread down to
    * within-cell offsets, so the same m·log2(k) bits buy finer
    * resolution than quantizing raw vectors.
    *
    * ONE codebook shared by every cell, as in the paper — the per-cell
    * ("local codebook") variant multiplies driver model state by nlist,
    * which is ≈√N at production scale (untenable: 100 TB of embeddings
    * → nlist ~10⁵ → 10⁵·m·k·width doubles), for a marginal recall gain.
    * The cell identity still enters the distance: the ADC tables are
    * built per probed cell from the QUERY's cell residual.
    */
  def fitResidual(vectors: DataFrame, idCol: String, vecCol: String,
      coarse: KMeans.Model, dims: Int, m: Int, k: Int, iters: Int): Model =
    fit(residuals(vectors, idCol, vecCol, coarse).select(col(idCol), col(vecCol)),
      idCol, vecCol, dims, m, k, iters)

  /** Residual IVF-ADC search: probe the query's `nprobe` nearest
    * coarse cells, encode each surviving row's RESIDUAL with the
    * shared residual codebook, and rank by per-cell ADC tables built
    * from the query's own cell residual (q − c_cell) — so both sides
    * of the asymmetric distance live in the same residual space.
    * Driver state: nprobe·m·k lookup doubles (vs m·k for the raw
    * variant); the corpus side stays ONE narrow pass — cell filter
    * (partition pruning at scale), zip_with subtract, m literal-
    * codebook argmins, a two-level literal map lookup — then
    * TakeOrdered. Output: (idCol, code, adist), same shape as
    * [[ivfAdcTopK]].
    */
  def ivfAdcResidualTopK(vectors: DataFrame, idCol: String, vecCol: String,
      coarse: KMeans.Model, model: Model, query: Seq[Double],
      nprobe: Int, n: Int): DataFrame = {
    require(nprobe >= 1, "need at least one probed cell")
    require(query.length == model.m * model.width,
      "query dims must match the model")
    val probed = probeCells(coarse, query, nprobe)
    val byCell = coarse.centroids.toMap
    // per-probed-cell ADC tables over the QUERY's cell residual
    val tables: Map[Int, Seq[Seq[Double]]] = probed.map { cell =>
      val qr = query.zip(byCell(cell)).map { case (a, b) => a - b }
      cell -> model.codebooks.zipWithIndex.map { case (cb, j) =>
        val qs = qr.slice(j * model.width, (j + 1) * model.width)
        val qq = dotFold(qs, qs)
        val byId = cb.centroids.toMap
        cb.centroids.indices.map { c =>
          val cv = byId(c)
          qq - 2.0 * dotFold(qs, cv) + dotFold(cv, cv)
        }
      }
    }.toMap
    val res = residuals(vectors, idCol, vecCol, coarse)
      .filter(col("__cell").isin(probed: _*))
    val staged = res.select((col(idCol) +: col("__cell") +:
      model.codebooks.indices.map(j =>
        slice(col(vecCol), j * model.width + 1, model.width)
          .as(s"__s$j"))): _*)
    val bested = staged.select((col(idCol) +: col("__cell") +:
      model.codebooks.indices.map { j =>
        val s = col(s"__s$j")
        KMeans.bestOf(s, dot(s, s), model.codebooks(j)).as(s"__b$j")
      }): _*)
    val adist = model.codebooks.indices.map { j =>
      val tbl = typedLit(tables.map { case (cell, t) => cell -> t(j) })
      element_at(element_at(tbl, col("__cell")), col(s"__b$j.cluster") + 1)
    }.reduceLeft(_ + _)
    bested.select(col(idCol),
      concat_ws("-", model.codebooks.indices.map(j =>
        col(s"__b$j.cluster")): _*).as("code"),
      adist.as("__adist"))
      .orderBy(col("__adist").asc, col(idCol).asc)
      .limit(n)
      .select(col(idCol), col("code"),
        round(greatest(col("__adist"), lit(0.0)), 6).as("adist"))
  }
}
