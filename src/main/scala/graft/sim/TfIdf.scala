package graft.sim

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TF-IDF document vectors and sparse cosine similar-pairs — the
  * lexical similarity complement to the embedding-based [[Ann]] family
  * (near-dup mining, related-document linking, template detection).
  *
  * Weighting: smoothed-idf `w = tf · (ln((N+1)/(df+1)) + 1)`, computed
  * over a DF-CAPPED vocabulary (tokens appearing in more than `maxDf`
  * documents are excluded from the vector space — they carry ~zero idf
  * signal and are exactly the tokens that would blow up the inverted
  * index). Cosine is taken within that pruned space, norms included:
  * the operator defines a self-consistent similarity, not an
  * approximation of the uncapped one.
  *
  * Scale shape: tf and df are hash-aggregation shuffles (map-side
  * combined); pair generation is an inverted-index self-join keyed by
  * token, where the df cap bounds every posting list to ≤ maxDf docs —
  * the same bucket-occupancy discipline as the LSH band joins, so
  * candidate work is O(vocab · maxDf²) worst case and never |corpus|².
  * The doc-count scalar is a broadcast one-row frame, not a driver
  * round-trip.
  *
  * Cross-engine determinism (the oracle hashes values exactly):
  * weights are fixed-point BIGINTs — `floor(tf · idf₆ · 10³ + 0.5)`
  * with idf pre-rounded to 6 dp — so dot products and squared norms
  * are EXACT integer sums (order-independent across partitions and
  * engines); the only floating-point steps are one ln/round per vocab
  * token and one sqrt/divide per surviving pair, each a deterministic
  * scalar function of identical inputs. floor(x + 0.5), not
  * cast/round: double→bigint casts truncate in Spark but round in
  * DuckDB, and half-up vs half-even rounding of doubles differs by
  * engine version — floor of an integral-valued double is exact
  * everywhere.
  *
  * Aggregation width: dots and norms accumulate in plain LONG when the
  * corpus's weights provably fit (max |w| ≤ [[SafeLongWeight]], so a
  * pair's dot of up to 10⁶ overlap terms stays under 2⁶³) — half the
  * hash-aggregate width of decimal(38) on the operator's hottest
  * shuffle (the inverted-index pair fan-out) — and FALL BACK to exact
  * decimal(38) accumulation otherwise. The choice is made from one
  * cheap max-aggregate over the (already persisted) vector frame, and
  * both paths produce identical values (each is exact in its regime),
  * so the fallback is a width decision, not a semantics change. This
  * matters because Spark's non-ANSI long sum WRAPS silently on
  * overflow — a spammy document repeating one rare token ~10⁵ times
  * would otherwise push w·w past 2⁶³ and quietly emit NaN cosines
  * while the oracle's exact accumulation keeps the pair.
  */
object TfIdf {

  /** Fixed-point scale of the weight quantization (3 decimal places).
    * Cosine is scale-invariant, so this only sets the quantization
    * granularity of the similarity definition — and the headroom that
    * keeps long-typed dot products exact (see class doc).
    */
  val Scale: Long = 1000L

  /** Largest |w| for which long accumulation is provably exact:
    * SafeLongWeight² · 10⁶ overlap terms ≤ 9·10¹⁸ < 2⁶³. Weights are
    * tf·idf₆·[[Scale]], so this admits tf·idf₆ up to 3,000 — ordinary
    * documents by a wide margin; corpora with heavier terms take the
    * decimal path automatically.
    */
  val SafeLongWeight: Long = 3000000L

  /** Fixed-point TF-IDF terms: (idCol, token, w) with
    * w = floor(tf · idf₆ · Scale + 0.5) as BIGINT (3-dp fixed point).
    * Vocabulary = tokens with document frequency ≤ maxDf.
    */
  def docVectors(df: DataFrame, idCol: String, textCol: String,
      maxDf: Long): DataFrame = {
    val toks = graft.ops.Parallelism.widen(df)
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df_t"))
      .filter(col("df_t") <= maxDf)
    val n = df.agg(count(lit(1)).as("n"))
    val idf6 = round(log((col("n") + 1.0d) / (col("df_t") + 1.0d)) + 1.0d, 6)
    tf.join(dfreq, Seq("tok"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("tok"),
        floor(col("tf") * idf6 * lit(Scale.toDouble) + 0.5d)
          .cast(LongType).as("w"))
  }

  /** Cosine-similar pairs (id_a, id_b, cos_sim) with id_a < id_b and
    * cos_sim ≥ threshold (compared on the 6-dp-rounded value, so the
    * boundary is engine-agnostic).
    */
  def similarPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.3, maxDf: Long = 100): DataFrame = {
    // vectors feed the norm aggregation AND both sides of the pair
    // join — persist the narrow (id, tok, w) frame once
    val vecs = graft.CacheRegistry.register(
      docVectors(df, idCol, textCol, maxDf)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // width decision (see class doc): long sums when the max weight
    // provably cannot overflow, exact decimal(38) otherwise. One
    // bounded driver scalar over the persisted frame — which the
    // downstream consumers were about to materialize anyway.
    val maxW = {
      val r = vecs.agg(max(abs(col("w")))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0) // empty vocabulary → 0
    }
    val term = (p: org.apache.spark.sql.Column) =>
      if (maxW <= SafeLongWeight) p
      else p.cast(DecimalType(38, 0))
    val norms = vecs.groupBy(col(idCol))
      .agg(sum(term(col("w")) * term(col("w"))).as("n2"))
    val a = vecs.select(col("tok"), col(idCol).as("id_a"), col("w").as("w_a"))
    val b = vecs.select(col("tok"), col(idCol).as("id_b"), col("w").as("w_b"))
    val dots = a.join(b, Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(term(col("w_a")) * term(col("w_b"))).as("dot"))
    dots
      .join(norms.select(col(idCol).as("id_a"), col("n2").as("n2_a")), Seq("id_a"))
      .join(norms.select(col(idCol).as("id_b"), col("n2").as("n2_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("dot").cast(DoubleType) /
          (sqrt(col("n2_a").cast(DoubleType)) * sqrt(col("n2_b").cast(DoubleType))),
          6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
