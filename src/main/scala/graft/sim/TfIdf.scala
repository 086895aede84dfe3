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
  * Aggregation width: dots and norms accumulate in plain LONG (the
  * 3-dp weight scale keeps per-term products ≤ ~10¹⁵ for realistic
  * tf·idf magnitudes, so a pair's dot stays far under 2⁶³ even at
  * 10⁴-token overlaps) — half the hash-aggregate width of the
  * decimal(38) accumulation it replaces, on the operator's hottest
  * shuffle (the inverted-index pair fan-out). The exactness envelope
  * is documented, not silent: [[Scale]] is the knob, and callers with
  * pathological per-document term counts (tf·idf₆ beyond ~3·10⁶)
  * should lower it.
  */
object TfIdf {

  /** Fixed-point scale of the weight quantization (3 decimal places).
    * Cosine is scale-invariant, so this only sets the quantization
    * granularity of the similarity definition — and the headroom that
    * keeps long-typed dot products exact (see class doc).
    */
  val Scale: Long = 1000L

  /** Fixed-point TF-IDF terms: (idCol, token, w) with w = the 6-dp
    * fixed-point weight as BIGINT. Vocabulary = tokens with document
    * frequency ≤ maxDf.
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
    // long sums, not decimal(38): exact within the documented Scale
    // envelope and half the aggregation width on the pair shuffle
    val norms = vecs.groupBy(col(idCol))
      .agg(sum(col("w") * col("w")).as("n2"))
    val a = vecs.select(col("tok"), col(idCol).as("id_a"), col("w").as("w_a"))
    val b = vecs.select(col("tok"), col(idCol).as("id_b"), col("w").as("w_b"))
    val dots = a.join(b, Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("w_a") * col("w_b")).as("dot"))
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
