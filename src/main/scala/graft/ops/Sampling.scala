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

  /** Exactly-n-per-group deterministic sample: the n rows with the
    * HIGHEST hash coordinates in each group, via the bounded
    * [[graft.functions.TopKAgg]] heap — the count-bounded companion to
    * [[stratifiedSample]]'s rate-bounded draw (eval-set carving wants
    * "8 docs per language", not "0.1% per language").
    *
    * Scale shape: ONE partial aggregate — each map partition
    * contributes at most n (hash, key) pairs per group to the
    * shuffle, so shuffle volume is O(partitions·groups·n) regardless
    * of group skew; no per-group window sort anywhere (the
    * row_number() formulation sorts every row of the hottest group
    * through one reducer — the DuckDB oracle replays it that way
    * because the oracle runs at test scale, the engine never does).
    *
    * Determinism: "n largest under (hash DESC, key ASC)" is a pure
    * function of the group's key SET — arrival order, partitioning,
    * and engines agree; as the corpus grows, a group's sample only
    * changes when a new key hashes above its current floor, the same
    * bounded-churn property as [[KMinDistinct]]'s sketch.
    *
    * @param keyCol integral unique row key (cast to LONG — the heap
    *               payload); ties in the 60-bit hash break by key ASC
    */
  /** The TopKAgg heap payload is a LONG: a non-integral key column
    * would cast to NULL row-by-row and the heap would silently skip
    * every row, returning an EMPTY sample with no error — fail loudly
    * at plan time instead (the Long-only contract is in both
    * functions' scaladoc, but a require beats documentation).
    */
  private def requireIntegralKey(df: DataFrame, keyCol: String,
      fn: String): Unit = {
    val dt = df.schema(keyCol).dataType
    require(dt == LongType || dt == IntegerType || dt == ShortType ||
      dt == ByteType,
      s"$fn requires an integral key column (heap payload is LONG); " +
        s"'$keyCol' is ${dt.simpleString} — cast or surrogate-key it first")
  }

  def groupSample(df: DataFrame, keyCol: String, groupCols: Seq[String],
      n: Int): DataFrame = {
    requireIntegralKey(df, keyCol, "groupSample")
    val ord = TextAnalysis.hash60(col(keyCol).cast(StringType))
    val g = groupCols.map(col)
    df.groupBy(g: _*)
      .agg(graft.functions.TopKAgg.top_k_by(
        ord, col(keyCol).cast(LongType), n).as("top"))
      .select(g :+ posexplode(col("top")).as(Seq("p", "t")): _*)
      .select(g ++ Seq((col("p") + 1).cast(LongType).as("rnk"),
        col("t.payload").as(keyCol)): _*)
  }

  /** Exactly-n-per-group WEIGHTED sample without replacement
    * (Efraimidis & Spirakis '06): each row draws priority u^(1/w)
    * from its deterministic hash coordinate u and weight w; the n
    * highest priorities per group are the sample, and for n = 1 the
    * selection probability is exactly w_i/Σw — the principled
    * weighted version of [[groupSample]]'s uniform draw (quality- or
    * recency-weighted eval carving, per-domain boosted subsets).
    *
    * The ORDER uses the monotone-equivalent key ln(u)/w (u, w > 0;
    * ln(u) < 0, so dividing by a LARGER w moves the key toward 0 =
    * up), quantized to integer nano-units — one libm log on the exact
    * dyadic rational u, no cross-engine pow() in sight, and the same
    * bounded [[graft.functions.TopKAgg]] heap as groupSample: O(n)
    * state per group, map-side partials, no per-group window sort.
    *
    * @param weightCol positive weights; callers clamp to
    *                  [1e-6, ∞) — at 1e-6 the quantized key still
    *                  fits a long with three orders of margin
    */
  def weightedSampleK(df: DataFrame, keyCol: String,
      groupCols: Seq[String], weightCol: String, n: Int): DataFrame = {
    requireIntegralKey(df, keyCol, "weightedSampleK")
    val u = coordinate(col(keyCol))
    val ord = round(log(u) / col(weightCol) * 1e9d).cast(LongType)
    val g = groupCols.map(col)
    df.groupBy(g: _*)
      .agg(graft.functions.TopKAgg.top_k_by(
        ord, col(keyCol).cast(LongType), n).as("top"))
      .select(g :+ posexplode(col("top")).as(Seq("p", "t")): _*)
      .select(g ++ Seq((col("p") + 1).cast(LongType).as("rnk"),
        col("t.payload").as(keyCol)): _*)
  }

  /** Neyman-optimal allocation of a `total` sample budget across
    * strata: n_h ∝ N_h·σ_h (Neyman 1934 — minimum-variance stratified
    * estimation of the metric's mean under a fixed budget). The
    * survey-sampling way to carve an eval set: strata whose metric
    * varies more get proportionally more of the budget than sheer
    * size would give them.
    *
    * Determinism across engines: per-stratum moments are EXACT integer
    * sums (Σx, Σx² — the metric must be integral; at true corpus
    * scale lift Σx² to decimal), σ_h is one sqrt over those integers,
    * the weight N_h·σ_h quantizes to integer micro-units so the
    * denominator is an exact integer sum, and the allocation is pure
    * integer arithmetic: least(N_h, (total·w_h) div Σw) — floor
    * division both engines. Zero-variance strata get weight 0 (the
    * textbook edge: a constant stratum needs one observation for its
    * mean, which the floor allocation rounds to zero — callers who
    * need coverage add a floor themselves); n_h = 1 strata have
    * undefined sample variance and also get σ = 0.
    *
    * Scale shape: one partial-aggregated moment shuffle over the
    * corpus, then strata-sized frames only.
    */
  def neymanAlloc(df: DataFrame, strataCol: String, metricCol: String,
      total: Int): DataFrame = {
    require(total >= 1)
    val stats = df.groupBy(col(strataCol)).agg(
      count(lit(1)).as("n_h"),
      sum(col(metricCol).cast(LongType)).as("s1"),
      sum((col(metricCol) * col(metricCol)).cast(LongType)).as("s2"))
    val nD = col("n_h").cast(DoubleType)
    val varE = (col("s2").cast(DoubleType) -
      col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / nD) /
      (nD - 1.0)
    val withW = stats
      .withColumn("sigma",
        when(col("n_h") > 1, sqrt(varE)).otherwise(lit(0.0)))
      .withColumn("w", round(nD * col("sigma") * 1e6d).cast(LongType))
    val wTot = withW.agg(sum(col("w")).as("w_tot"))
    withW.crossJoin(broadcast(wTot))
      .withColumn("alloc",
        when(col("w_tot") > 0,
          least(col("n_h"),
            expr(s"(cast($total as bigint) * w) div w_tot")))
          .otherwise(lit(0L)))
      .select(col(strataCol), col("n_h"), col("sigma"), col("w"),
        col("alloc"))
  }

  /** The allocation applied: each stratum's `alloc` highest rows
    * under the (hash60 DESC, key ASC) deterministic order — i.e.
    * [[groupSample]]'s bounded-heap draw with a PER-STRATUM count.
    * The heap needs one literal bound, so the max allocation collects
    * to the driver (ONE value off a strata-sized frame — the bounded
    * scalar class, like the rollup depth); the per-stratum cut then
    * joins back and trims ranks, so shuffle volume stays
    * O(partitions·strata·max_alloc) and no per-stratum window ever
    * sorts the corpus.
    */
  def neymanSample(df: DataFrame, keyCol: String, strataCol: String,
      metricCol: String, total: Int): DataFrame = {
    requireIntegralKey(df, keyCol, "neymanSample")
    val alloc = neymanAlloc(df, strataCol, metricCol, total)
    val nMax = alloc.agg(max(col("alloc"))).head().getLong(0)
      .max(1L).min(Int.MaxValue.toLong).toInt
    groupSample(df.select(col(keyCol), col(strataCol)),
        keyCol, Seq(strataCol), nMax)
      .join(broadcast(alloc), Seq(strataCol))
      .filter(col("rnk") <= col("alloc"))
      .select(col(strataCol), col("n_h"),
        round(col("sigma"), 6).as("sigma"), col("w"), col("alloc"),
        col("rnk"), col(keyCol))
  }

  /** Per-source row counts collected to the driver: #sources values —
    * the bounded-model-state class ([[graft.sim.KMeans]] centroids),
    * never corpus-sized. ONE scan of the corpus; every mixture op
    * derives its rates from this single aggregate.
    */
  private def sourceCounts(df: DataFrame, sourceCol: String,
      sources: Seq[String]): Map[String, Long] =
    df.filter(col(sourceCol).isin(sources: _*))
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Shared rate arithmetic of the mixture family: scale = min over
    * targeted sources of n_s/target_s (the largest corpus size at
    * which the mixture is feasible without upsampling), rate_s =
    * min(1, target_s·scale / n_s) — the binding source keeps
    * everything, the rest downsample. Pure IEEE double ops in the
    * exact order the DuckDB oracle evaluates them (`n/t`, `min`,
    * `t*scale/n`), so driver-computed rates replay bit-for-bit
    * cross-engine.
    */
  private def ratesFromCounts(counts: Map[String, Long],
      targets: Seq[(String, Double)]): Seq[(String, Double)] = {
    val present = targets.filter(t => counts.getOrElse(t._1, 0L) > 0L)
    if (present.isEmpty) Nil
    else {
      val scale = present.map { case (s, t) => counts(s).toDouble / t }.min
      present.map { case (s, t) =>
        s -> math.min(1.0, t * scale / counts(s).toDouble)
      }
    }
  }

  /** Keep-rate filter over precomputed per-source rates: one narrow
    * per-row expression — no join, no second scan; sources without a
    * rate drop (NULL rate ⇒ NULL comparison ⇒ filtered).
    */
  private def mixByRates(df: DataFrame, keyCol: String, sourceCol: String,
      rates: Seq[(String, Double)]): DataFrame =
    if (rates.isEmpty) df.filter(lit(false))
    else df.filter(coordinate(col(keyCol)) <
      caseLookup(col(sourceCol), rates, lit(null).cast(DoubleType)))

  /** Domain mixing: downsample each source to hit a TARGET mixture —
    * the knob that turns "we have 80% web, 5% books" into "train on
    * 50% web, 20% books". Rates follow [[ratesFromCounts]]: the
    * binding source keeps everything, the rest downsample
    * deterministically via the same hash coordinate as
    * [[sampleFraction]]. Sources absent from `targets` are dropped
    * (rate 0). Caveat: a TARGETED source with zero rows cannot
    * constrain the scale (no count row exists), so the mixture
    * silently proceeds without it — callers needing strict
    * feasibility should validate per-source counts first.
    *
    * Scale shape: ONE tiny count aggregate (#sources values to the
    * driver — bounded model state), then a pure per-row filter: no
    * join back, no second scan of the corpus. Deterministic end to
    * end ([[ratesFromCounts]]'s IEEE-order contract). Output schema =
    * input schema.
    */
  def domainMix(df: DataFrame, keyCol: String, sourceCol: String,
      targets: Seq[(String, Double)]): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "targets must be positive shares")
    val counts = sourceCounts(df, sourceCol, targets.map(_._1))
    mixByRates(df, keyCol, sourceCol, ratesFromCounts(counts, targets))
  }

  /** Temperature-flattened mixture: target shares ∝ n_src^α — the
    * standard flattening for multi-domain/multilingual corpora
    * (scarce sources upweighted relative to natural sampling,
    * dominant ones capped; α=1 is natural sampling, the α→0 limit is
    * uniform). Derives the per-source targets from ONE bounded count
    * aggregate and shares [[ratesFromCounts]]'s rate arithmetic and
    * determinism contract — a single corpus scan total (the count),
    * plus the narrow output filter.
    *
    * Cross-ENGINE exactness holds at α = 0.5, computed via `sqrt`
    * (IEEE-754 requires correctly-rounded sqrt, so every engine's
    * targets agree bit-for-bit — the DuckDB oracle replays it); a
    * general `pow(n, α)` is only correctly-rounded WITHIN one libm,
    * so other α values are deterministic across re-runs and
    * backfills on the JVM but are not oracle-exact against another
    * engine's pow — validated by fixture replay instead
    * (PropertySpec).
    */
  def temperatureMix(df: DataFrame, keyCol: String, sourceCol: String,
      sources: Seq[String], alpha: Double = 0.5): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val counts = sourceCounts(df, sourceCol, sources)
    val flat: Double => Double =
      if (alpha == 0.5) math.sqrt else math.pow(_, alpha)
    val targets = sources.filter(counts.getOrElse(_, 0L) > 0L)
      .map(s0 => s0 -> flat(counts(s0).toDouble))
    mixByRates(df, keyCol, sourceCol, ratesFromCounts(counts, targets))
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
    * a hash + an equi-join against a small broadcast frame). The pool
    * is the `poolSize` keys with the SMALLEST hash coordinates (ties
    * by key), so membership and every pick remain pure functions of
    * the data — the same re-run/backfill/cross-engine stability
    * contract as the split family — while the pool is bounded by
    * COUNT, not by a fraction of the corpus: at 100× the data the
    * pool (and its driver footprint) is the same size. Self-pairs are
    * dropped (a row can land on its own pool slot).
    *
    * Scale shape: the pool selection is a TakeOrdered (top-poolSize
    * by coordinate — per-partition heaps + a driver merge, NO global
    * sort and NO single-partition window anywhere in the plan); slot
    * numbering happens on the driver over poolSize rows — the
    * bounded-model-state class ([[graft.sim.KMeans]] centroids, IVF
    * cells). Everything corpus-sized stays narrow: explode(k) + hash
    * + broadcast join.
    *
    * @return (keyCol, neg_idx ∈ 1..k, neg_<keyCol> — the partner key)
    */
  def negativeSample(df: DataFrame, keyCol: String, k: Int,
      poolSize: Int): DataFrame = {
    require(k >= 1 && poolSize >= 2, "need k>=1, poolSize>=2")
    val ids = df.select(col(keyCol)).distinct()
    val poolKeys = ids
      .orderBy(coordinate(col(keyCol)).asc, col(keyCol).asc)
      .limit(poolSize)
      .collect()
    val m = poolKeys.length.toLong
    require(m >= 2, s"distinct key count $m too small for a negative pool")
    val poolSchema = StructType(Seq(
      StructField("__slot", LongType, nullable = false),
      StructField(s"neg_$keyCol", df.schema(keyCol).dataType)))
    val poolRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(poolKeys.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(i + 1L, r.get(0))
      }: _*)
    val pool = df.sparkSession.createDataFrame(poolRows, poolSchema)
    // probe side dedupes like the pool side (and the oracle's DISTINCT
    // CTE): duplicate-key inputs otherwise fan the output out per copy
    ids
      .select(col(keyCol),
        explode(sequence(lit(1L), lit(k.toLong))).as("neg_idx"))
      .withColumn("__slot",
        TextAnalysis.hash60(concat(col(keyCol).cast(StringType), lit(":"),
          col("neg_idx").cast(StringType))) % lit(m) + 1L)
      .join(broadcast(pool), Seq("__slot"))
      .filter(col(keyCol) =!= col(s"neg_$keyCol"))
      .select(col(keyCol), col("neg_idx"), col(s"neg_$keyCol"))
  }

  /** Deterministic corpus shuffle for TRAINING ORDER: every row gets a
    * (shard, shard_pos) coordinate — shard by one keyed hash, position
    * within the shard by an INDEPENDENT second hash (domain-separated
    * prefixes, so shard membership and within-shard order are
    * uncorrelated) — the seekable pseudo-random permutation a training
    * dataloader consumes instead of `ORDER BY rand()` (which is
    * neither stable nor resumable). Shard membership is a pure
    * function of the key (stable under re-runs and backfills, like the
    * split family); within-shard POSITIONS are dense 1..n_shard and
    * therefore shift when the corpus changes — positions are an
    * epoch-scoped artifact, not a durable id (document vs
    * [[deterministicSplit]], whose labels never move).
    *
    * Scale shape: ONE shuffle keyed by shard + a per-shard sort — the
    * exact physical work of writing a shuffled training set, with
    * `numShards` the parallelism/spill knob (100 TB / 10k shards =
    * 10 GB sorts). The window partitions on shard, never on the whole
    * corpus; there is no global ordering anywhere.
    */
  /** Shared shard coordinate of [[shuffleShards]]/[[assignDenseIds]]. */
  private def shardOf(keyCol: String, numShards: Int): Column =
    TextAnalysis.hash60(
      concat(lit("shard:"), col(keyCol).cast(StringType))) % numShards

  def shuffleShards(df: DataFrame, keyCol: String, numShards: Int): DataFrame = {
    require(numShards >= 1, "need numShards >= 1")
    // refuse to silently clobber caller columns (e.g. rendezvousShard
    // also emits 'shard') — the Hilbert.sortByH convention
    Seq("shard", "shard_pos", "__ord").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it before shuffleShards"))
    val shard = shardOf(keyCol, numShards)
    val ord = TextAnalysis.hash60(
      concat(lit("ord:"), col(keyCol).cast(StringType)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__ord"), col(keyCol))
    df.withColumn("shard", shard.cast(IntegerType))
      .withColumn("__ord", ord)
      .withColumn("shard_pos", row_number().over(w).cast(LongType))
      .drop("__ord")
  }

  /** Global dense row ids 0..N-1 — the scalable zipWithIndex: the id
    * is the row's rank under the deterministic total order
    * (shard, within-shard hash order) of [[shuffleShards]], computed
    * WITHOUT a global sort: per-shard counts collect to the driver
    * (numShards values — bounded), prefix-sum into offsets, and each
    * row's id = offset(its shard) + its per-shard dense position.
    * One tiny count aggregate + one shard-partitioned window; the
    * global-window/single-partition formulation never appears (that
    * is the WindowExec one-reducer cliff at 100 TB). numShards is the
    * parallelism knob: each shard's window sorts N/numShards rows.
    *
    * Deterministic: a pure function of the key set (the same contract
    * as [[shuffleShards]]), so re-runs and engines agree — the oracle
    * replays it as ONE global row_number over (shard, ord, key),
    * correct at oracle scale, never run by the engine.
    * Output: input columns + shard, shard_pos, dense_id.
    */
  def assignDenseIds(df: DataFrame, keyCol: String,
      numShards: Int): DataFrame = {
    require(!df.columns.contains("dense_id"),
      "input already has a 'dense_id' column — rename it first")
    // bounded: numShards rows — counted from the shard expression
    // alone, so the positions window is never executed for the sizes
    val counts = df
      .groupBy(shardOf(keyCol, numShards).cast(IntegerType).as("shard"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sharded = shuffleShards(df, keyCol, numShards)
    val offsets = new Array[Long](numShards)
    var acc = 0L
    (0 until numShards).foreach { s =>
      offsets(s) = acc; acc += counts.getOrElse(s, 0L)
    }
    sharded.withColumn("dense_id",
      element_at(lit(offsets), col("shard") + 1) + col("shard_pos") - 1L)
  }

  /** Rendezvous (highest-random-weight) sharding: each key routes to
    * the named shard with the LARGEST keyed hash of (shard, key) —
    * the minimal-movement routing rule. When the shard set changes,
    * the only keys that move are those whose winning weight involved
    * the added/removed shard (expected 1/(S+1) of keys on add), while
    * modulo routing ([[shuffleShards]]) reshuffles (S-1)/S of the
    * corpus. Use it where shard identity is OPERATIONAL state —
    * cache/index/worker routing that survives topology edits; use
    * [[shuffleShards]] where shards are an epoch-scoped artifact
    * (training-order output) and dense positions matter.
    *
    * Scale shape: a pure per-row expression — S hash evaluations and
    * a running structwise max, no shuffle, no join; S is a bounded
    * route table (tens to hundreds), not data. Deterministic: ties
    * (60-bit hash collisions) break by shard name.
    */
  def rendezvousShard(df: DataFrame, keyCol: String,
      shards: Seq[String]): DataFrame = {
    require(shards.nonEmpty && shards.distinct.size == shards.size,
      "need a non-empty, duplicate-free shard list")
    val candidates = shards.map { s =>
      struct(
        TextAnalysis.hash60(concat(lit(s + ":"), col(keyCol).cast(StringType)))
          .as("w"),
        lit(s).as("s"))
    }
    val best =
      if (candidates.size == 1) candidates.head
      else greatest(candidates: _*)
    df.withColumn("shard", best.getField("s"))
  }

  /** DuckDB mirror of [[coordinate]] for oracle generation. */
  def coordinateSql(keyExpr: String): String =
    s"cast(cast(('0x' || substr(md5(cast($keyExpr as varchar)), 1, 15)) as bigint) as double) / ${math.pow(2.0, 60)}"

  /** DuckDB mirror of [[graft.text.TextAnalysis.hash60]]. */
  def hash60Sql(keyExpr: String): String =
    s"cast(('0x' || substr(md5($keyExpr), 1, 15)) as bigint)"
}
