package graft.ops

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling and dataset splitting by portable content
  * hash — the training-pipeline primitive behind stable train/val/test
  * splits and reproducible sub-corpus selection.
  *
  * `sample(p)`/`rand()` are nondeterministic across runs, partitions,
  * and engines; hashing the row KEY instead gives every row a fixed
  * uniform coordinate u ∈ [0,1) (the md5-derived 60-bit hash over
  * 2^60), so membership is a pure function of the data: re-runs,
  * backfills, and other engines (the DuckDB oracle) agree exactly, and
  * adding new rows never reshuffles old rows between splits — the
  * property that keeps eval sets honest as a corpus grows.
  */
object Sampling {

  /** Uniform [0,1) coordinate of a key (one double division). */
  def coordinate(key: Column): Column =
    TextAnalysis.hash60(key.cast(StringType)).cast(DoubleType) /
      lit(math.pow(2.0, 60))

  /** Deterministic p-fraction sample: keep rows with u < p. */
  def sampleFraction(df: DataFrame, keyCol: String, p: Double): DataFrame =
    df.filter(coordinate(col(keyCol)) < p)

  /** Assign split labels by cumulative fraction, e.g.
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). Fractions must
    * sum to 1 (last bucket takes the remainder exactly).
    */
  def deterministicSplit(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val u = coordinate(col(keyCol))
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.init.zip(bounds.init).foldRight(
      lit(splits.last._1): Column) { case (((label, _), hi), acc) =>
      when(u < hi, label).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Quality-weighted deterministic sampling ("soft filtering"): each
    * row keeps with probability equal to its own weight column,
    * clamped to [0,1] — the curation move that downsamples low-quality
    * documents smoothly instead of hard-thresholding them (a 0.9-score
    * doc survives 90% of the time, a 0.2 doc 20%), while staying a
    * pure function of (key, weight): re-runs, backfills, and other
    * engines agree row-for-row. A NULL weight drops the row (the
    * comparison is NULL), matching SQL filter semantics.
    *
    * Scale shape: a single narrow filter expression — no shuffle, no
    * aggregate; the hash coordinate and the weight are both per-row.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String): DataFrame =
    df.filter(coordinate(col(keyCol)) <
      least(lit(1.0), greatest(lit(0.0), col(weightCol).cast(DoubleType))))

  /** Per-key lookup as a when/otherwise CASE chain (shared by the
    * stratified/mixture/replication knobs so NULL- and unknown-key
    * policy lives in one place: keys are matched with ===, so a NULL
    * key falls through to `default`).
    */
  private def caseLookup(key: Column, pairs: Seq[(String, Double)],
      default: Column): Column =
    pairs.foldRight(default) { case ((k, v), acc) =>
      when(key === k, lit(v)).otherwise(acc)
    }

  /** Stratified deterministic sampling: per-stratum keep rates (e.g.
    * downsample web to 10%, keep books at 100%) — the training-mixture
    * control knob. Same stability contract as [[sampleFraction]],
    * applied per stratum; unknown strata fall back to `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val u = coordinate(col(keyCol))
    val rate = caseLookup(col(strataCol), rates.toSeq.sortBy(_._1),
      lit(defaultRate))
    df.filter(u < rate)
  }

  /** Domain mixing: downsample each source to hit a TARGET mixture —
    * the knob that turns "we have 80% web, 5% books" into "train on
    * 50% web, 20% books". Per-source keep rates are computed from the
    * actual counts: scale = min over targeted sources of n_s/target_s
    * (the largest corpus size at which the mixture is feasible without
    * upsampling), rate_s = target_s·scale / n_s — the binding source
    * keeps everything, the rest downsample deterministically via the
    * same hash coordinate as [[sampleFraction]]. Sources absent from
    * `targets` are dropped (rate 0). Caveat: a TARGETED source with
    * zero rows cannot constrain the scale (no count row exists), so
    * the mixture silently proceeds without it — callers needing
    * strict feasibility should validate per-source counts first.
    *
    * Scale shape: one tiny count aggregate, broadcast-joined back; the
    * filter is a pure per-row expression. Deterministic end to end.
    * Output schema = input schema (internal rate/count columns are
    * projected away).
    */
  def domainMix(df: DataFrame, keyCol: String, sourceCol: String,
      targets: Seq[(String, Double)]): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "targets must be positive shares")
    val counts = df.filter(col(sourceCol).isin(targets.map(_._1): _*))
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n_src"))
    val tgt = caseLookup(col(sourceCol), targets, lit(null).cast(DoubleType))
    val withScale = counts
      .withColumn("feasible", col("n_src").cast(DoubleType) / tgt)
      .agg(min(col("feasible")).as("scale"))
    val rate =
      least(lit(1.0), tgt * col("scale") / col("n_src").cast(DoubleType))
    df.join(broadcast(counts), Seq(sourceCol), "inner")
      .crossJoin(broadcast(withScale))
      .filter(coordinate(col(keyCol)) < rate)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Temperature-flattened mixture at α = 0.5: target shares ∝ √n_src
    * — the standard flattening for multi-domain/multilingual corpora
    * (scarce sources upweighted relative to natural sampling, dominant
    * ones capped, uniform in the α→0 limit). Derives the per-source
    * targets from ONE bounded count aggregate (#sources values to the
    * driver — model-state class, like k-means centroids) and delegates
    * to [[domainMix]], sharing its rate arithmetic and determinism
    * contract. α is pinned to 0.5 because √ is IEEE-exact in every
    * engine, so the derived targets replay bit-for-bit in the oracle;
    * a general `pow(n, α)` has no such cross-libm guarantee.
    */
  def temperatureMix(df: DataFrame, keyCol: String, sourceCol: String,
      sources: Seq[String]): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    val counts = df.filter(col(sourceCol).isin(sources: _*))
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = sources.filter(counts.contains)
      .map(s0 => s0 -> math.sqrt(counts(s0).toDouble))
    domainMix(df, keyCol, sourceCol, targets)
  }

  /** Epoch-weighted replication — the UPSAMPLING dual of [[domainMix]]:
    * training mixtures often repeat scarce high-quality sources for
    * fractional epochs (books ×3.25) while passing bulk web through
    * once. Each row is emitted floor(e) times, plus once more when its
    * hash coordinate falls below frac(e) — so a 3.25-epoch source
    * repeats every document 3 times and a deterministic quarter of
    * them a 4th; e < 1 degrades to [[sampleFraction]]. Sources absent
    * from `epochs` use `defaultEpochs`.
    *
    * Determinism contract is [[coordinate]]'s: the bumped subset is a
    * pure function of the key, stable under re-runs, backfills, and
    * engines. Scale shape: a narrow per-row explode — no shuffle, no
    * aggregate, no driver-side anything; output partitioning follows
    * the input. Output = input columns + `copy_idx` (0-based).
    */
  def repeatFactor(df: DataFrame, keyCol: String, sourceCol: String,
      epochs: Seq[(String, Double)], defaultEpochs: Double = 1.0): DataFrame = {
    require(epochs.forall(_._2 >= 0) && defaultEpochs >= 0,
      "epoch factors must be non-negative")
    val e = caseLookup(col(sourceCol), epochs, lit(defaultEpochs))
    // NULL key ⇒ NULL coordinate ⇒ the comparison is NULL; coalesce to
    // 0 so such rows still get their floor(e) whole-epoch copies (the
    // oracle's CASE WHEN NULL THEN 1 ELSE 0 END agrees)
    val copies = (floor(e).cast(IntegerType) +
      coalesce((coordinate(col(keyCol)) < (e - floor(e))).cast(IntegerType),
        lit(0))).as("__n")
    df.withColumn("__n", copies)
      .filter(col("__n") > 0) // guards sequence() against an empty range
      .withColumn("copy_idx", explode(sequence(lit(0), col("__n") - 1)))
      .drop("__n")
  }

  /** Deterministic negative sampling for contrastive training: pair
    * every row with `k` pseudo-random partners drawn from a
    * hash-selected POOL — the in-batch/pool-negatives pattern of
    * contrastive pipelines (dense-index the whole corpus and you need
    * a global zipWithIndex; index only a bounded pool and the pick is
    * a hash + an equi-join against a small frame AQE broadcasts).
    * The pool is itself a [[sampleFraction]] of the corpus, so
    * membership and every pick are pure functions of the data — the
    * same re-run/backfill/cross-engine stability contract as the
    * split family. Self-pairs are dropped (a row can appear in its
    * own pool slice).
    *
    * Scale shape: the pool's dense index is a single-partition
    * window over ~poolFrac·N rows — the bounded-model-state contract
    * ([[graft.sim.KMeans]] centroids, IVF cells); everything
    * corpus-sized stays narrow: explode(k) + hash + broadcast join.
    *
    * @return (keyCol, neg_idx ∈ 1..k, neg_<keyCol> — the partner key)
    */
  def negativeSample(df: DataFrame, keyCol: String, k: Int,
      poolFrac: Double): DataFrame = {
    require(k >= 1 && poolFrac > 0 && poolFrac <= 1, "need k>=1, 0<frac<=1")
    val pool = sampleFraction(df.select(col(keyCol)).distinct(), keyCol, poolFrac)
      .withColumn("__slot", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(keyCol)))
        .cast(LongType))
    val m = pool.agg(max(col("__slot")).as("__m"))
    // probe side dedupes like the pool side (and the oracle's DISTINCT
    // CTE): duplicate-key inputs otherwise fan the output out per copy
    df.select(col(keyCol)).distinct()
      .crossJoin(broadcast(m))
      .select(col(keyCol), col("__m"),
        explode(sequence(lit(1L), lit(k.toLong))).as("neg_idx"))
      .withColumn("__slot",
        TextAnalysis.hash60(concat(col(keyCol).cast(StringType), lit(":"),
          col("neg_idx").cast(StringType))) % col("__m") + 1L)
      .join(pool.select(col("__slot"), col(keyCol).as(s"neg_$keyCol")),
        Seq("__slot"))
      .filter(col(keyCol) =!= col(s"neg_$keyCol"))
      .select(col(keyCol), col("neg_idx"), col(s"neg_$keyCol"))
  }

  /** DuckDB mirror of [[coordinate]] for oracle generation. */
  def coordinateSql(keyExpr: String): String =
    s"cast(cast(('0x' || substr(md5(cast($keyExpr as varchar)), 1, 15)) as bigint) as double) / ${math.pow(2.0, 60)}"

  /** DuckDB mirror of [[graft.text.TextAnalysis.hash60]]. */
  def hash60Sql(keyExpr: String): String =
    s"cast(('0x' || substr(md5($keyExpr), 1, 15)) as bigint)"
}
