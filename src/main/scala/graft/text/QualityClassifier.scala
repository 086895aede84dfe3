package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** In-engine LEARNED quality classifier — the fastText-style linear
  * gate a production curation stack trains on labeled good/bad
  * corpora and applies as a narrow scoring pass. Two roles here:
  *
  *  - distillation: trained against the heuristic composite gate
  *    ([[TextAnalysis.qualityScore]] ≥ threshold), the learned scorer
  *    replaces ~5 tokenizer passes with one feature projection + dot
  *    product — the standard cheapen-the-gate move before a 100 TB
  *    sweep;
  *  - supervision: trained against any boolean label column (planted
  *    good/bad corpora in the spec), it is the generic linear
  *    text-classifier primitive.
  *
  * Training is batch gradient descent with a FIXED iteration count,
  * and every step follows the KMeans replay discipline so the whole
  * trajectory is bit-reproducible across runs, partitionings, and
  * engines (the DuckDB oracle replays all ten rounds):
  *
  *  - features are quantized ONCE per row to integer micro-units
  *    (round(f·1e6) as long) — the only floats that enter training
  *    are already 6-dp-rounded ratios;
  *  - weights live as integer micro-units; the margin
  *    z = (Σ wᵢ·fᵢ)/1e12 is an exact long dot product (bounded:
  *    |w|≤2e7, |f|≤1e6, d=6 → |Σ|≤1.2e14 < 2^53, so even the
  *    long→double conversion is exact);
  *  - the link is the ALGEBRAIC sigmoid σ(z) = ½ + z/(2(1+|z|)) —
  *    rational arithmetic only, so both engines compute the identical
  *    double (a transcendental exp could differ in the last ulp and
  *    flip a quantization round on a knife-edge row);
  *  - per-row gradient terms are re-quantized (round((σ−y)·fᵢ) as
  *    long) and summed exactly — order/partitioning independent;
  *  - the weight update w ← w − round(lr·Gᵢ/n) rounds HALF_UP
  *    away-from-zero (BigDecimal, matching Spark's and DuckDB's
  *    round()), never Math.round (which rounds −2.5 to −2).
  *
  * Scale shape: each round is ONE narrow projection + ONE
  * partial-aggregated scalar aggregate (d long sums + a count) —
  * driver state is d longs, the classic bounded-model loop. Scoring
  * is a pure narrow map with the weights as literals.
  */
object QualityClassifier {

  /** Feature/weight quantization step (micro-units). */
  val Scale = 1000000L

  /** Fixed training rounds / learning rate — chosen on the synthetic
    * corpus (88% train accuracy distilling the kinked heuristic gate;
    * more rounds overshoot with this lr, fewer underfit).
    */
  val Iters = 10
  val Lr = 20.0

  val NumFeatures = 6

  /** The feature vector as 6-dp-deterministic doubles: bias, stopword
    * ratio, capped length term, punctuation ratio, digit ratio,
    * capped mean token length. Every component mirrors an existing
    * oracle-verified fragment of [[TextAnalysis]].
    */
  def featureCols(text: Column): Seq[Column] = Seq(
    lit(1.0),
    TextAnalysis.stopwordRatio(text),
    least(TextAnalysis.tokenCount(text).cast(DoubleType) / 100.0, lit(1.0)),
    TextAnalysis.punctRatio(text),
    TextAnalysis.digitRatio(text),
    least(TextAnalysis.meanTokenLen(text) / 10.0, lit(1.0)))

  /** Features quantized to integer micro-units (the training/scoring
    * representation).
    */
  def featuresMicro(text: Column): Seq[Column] =
    featureCols(text).map(f => round(f * Scale).cast(LongType))

  /** Algebraic sigmoid — rational ops only, bit-identical across
    * engines.
    */
  def sigma(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** HALF_UP away-from-zero — matches Spark round() and DuckDB
    * round(); Math.round would differ on negative .5 boundaries.
    */
  private def roundHalfUp(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Trained weights in micro-units, in [[featureCols]] order. */
  final case class Model(wMicro: IndexedSeq[Long]) {
    require(wMicro.length == NumFeatures)
  }

  /** Margin z of a staged micro-feature frame against literal
    * weights — exact long dot product, then one exact long→double
    * conversion (see object doc for the bound).
    */
  private def zOf(w: IndexedSeq[Long]): Column =
    (0 until NumFeatures).map(i => lit(w(i)) * col(s"f$i"))
      .reduceLeft(_ + _).cast(DoubleType) / lit(1.0e12)

  /** Train on `docs`: `label` must evaluate to 0/1. Each round
    * collects d+1 scalars (bounded model state); the feature frame is
    * cached across the fixed rounds and released by the caller's
    * CacheRegistry sweep.
    */
  def fit(docs: DataFrame, textCol: Column, label: Column,
      iters: Int = Iters, lr: Double = Lr): Model = {
    val staged = docs.select(
      featuresMicro(textCol).zipWithIndex
        .map { case (c, i) => c.as(s"f$i") } :+
        label.cast(LongType).as("y"): _*)
    val cached = graft.CacheRegistry.register(
      staged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val spark = docs.sparkSession
    var w = IndexedSeq.fill(NumFeatures)(0L)
    for (_ <- 0 until iters) {
      // The round's weights ride a broadcast 1-row frame instead of
      // being inlined as literals: the per-round gradient plan is then
      // STRUCTURALLY IDENTICAL across all `iters` rounds (only the
      // broadcast row's data changes), so Catalyst's generated code is
      // compiled by Janino once and cache-hit 9 times, where the
      // literal form re-planned and re-compiled a brand-new source
      // string every round (~10 sequential codegen compilations per
      // fit, measured as the dominant cost of the 6-long-scalar
      // rounds). Arithmetic is unchanged: the dot product multiplies
      // the same longs whether they arrive as literals or as broadcast
      // columns, and the algebraic sigmoid path is identical.
      val wRow = org.apache.spark.sql.Row(w: _*)
      val wDf = spark.createDataFrame(
        java.util.Collections.singletonList(wRow),
        StructType((0 until NumFeatures).map(i =>
          StructField(s"w$i", LongType, nullable = false))))
      val z = (0 until NumFeatures).map(i => col(s"w$i") * col(s"f$i"))
        .reduceLeft(_ + _).cast(DoubleType) / lit(1.0e12)
      val err = sigma(z) - col("y").cast(DoubleType)
      val aggs = (0 until NumFeatures).map(i =>
        sum(round(err * col(s"f$i")).cast(LongType)).as(s"g$i")) :+
        count(lit(1)).as("n")
      val row = cached.crossJoin(broadcast(wDf))
        .agg(aggs.head, aggs.tail: _*).collect().head
      val n = row.getLong(NumFeatures)
      require(n > 0, "classifier training needs a non-empty corpus")
      w = w.indices.map { i =>
        val g = if (row.isNullAt(i)) 0L else row.getLong(i)
        w(i) - roundHalfUp(lr * g.toDouble / n)
      }.toIndexedSeq
    }
    Model(w)
  }

  /** Score expression over a staged micro-feature frame (internal). */
  private def scoreStaged(m: Model): Column =
    round(sigma(zOf(m.wMicro)), 6)

  /** (extra columns…, score, pred) scoring pass — ONE narrow
    * projection with the model as literals; `keep` columns ride
    * through untouched.
    */
  def score(docs: DataFrame, textCol: Column, m: Model,
      keep: Seq[Column]): DataFrame = {
    val staged = docs.select(
      keep ++ featuresMicro(textCol).zipWithIndex.map {
        case (c, i) => c.as(s"f$i")
      }: _*)
    staged
      .withColumn("score", scoreStaged(m))
      .withColumn("pred", when(col("score") >= 0.5, 1).otherwise(0))
      .drop((0 until NumFeatures).map(i => s"f$i"): _*)
  }

  /** Train-then-score convenience: fit on (docs, label), emit every
    * `keep` column plus the realized label, score, and prediction.
    */
  def fitScore(docs: DataFrame, textCol: Column, label: Column,
      keep: Seq[Column]): DataFrame = {
    val m = fit(docs, textCol, label)
    score(docs.withColumn("y", label.cast(IntegerType)), textCol, m,
      keep :+ col("y"))
  }
}
