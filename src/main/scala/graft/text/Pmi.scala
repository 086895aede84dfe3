package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PMI phrase mining — the word2phrase/AutoPhrase collocation signal:
  * a bigram whose observed rate far exceeds the independence
  * prediction of its parts ("new york", "machine learning") is a
  * phrase candidate worth gluing into one token before BPE/vocab
  * training; a frequent-but-unsurprising bigram ("of the") is not.
  * PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ) with p from the corpus's own
  * unigram/bigram counts.
  *
  * Scale shape: the token-array frame is computed ONCE and persisted
  * (two narrow explodes read it — unigram and bigram streams), each
  * count is a partial-aggregated hash shuffle (heavy hitters collapse
  * map-side), the two grand totals are 1-row broadcasts, and the
  * unigram vocabulary joins back onto the (min-count-gated) bigram
  * frame — AQE broadcasts it when it fits, which a natural-language
  * vocabulary does. No pairwise work, no windows, no driver data.
  *
  * Determinism: counts are exact longs; the single ln per surviving
  * bigram is evaluated on the identical double expression tree the
  * oracle uses, and rounded to 6 dp — the established cross-engine
  * libm discipline of UnigramLm/Dsir.
  */
object Pmi {

  /** Phrase candidates: (bigram, n_pair, n_a, n_b, pmi), bigrams with
    * n_pair >= minCount. pmi = round(ln((n_pair/Nb) / ((n_a/Nu)·(n_b/Nu))), 6).
    */
  def phrases(df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, "need minCount >= 1")
    val toks = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(df)
        .select(TextAnalysis.tokens(col(textCol)).as("toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val uni = toks.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    // adjacent pairs via the bound-array transform (Dedup.shingleHashes
    // trick): element_at reads hit the lambda-bound array, not a
    // re-evaluated tokenizer
    val pairs = toks.select(explode(element_at(
        transform(array(col("toks")), t =>
          transform(
            when(size(t) >= 2, sequence(lit(1), size(t) - 1))
              .otherwise(array().cast(ArrayType(IntegerType))),
            i => struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b")))),
        1)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val nu = uni.agg(sum(col("c")).as("nu"))
    val nb = toks.select(
        greatest(size(col("toks")) - 1, lit(0)).cast(LongType).as("k"))
      .agg(sum(col("k")).as("nb"))
    val ua = uni.select(col("tok").as("a"), col("c").as("n_a"))
    val ub = uni.select(col("tok").as("b"), col("c").as("n_b"))
    pairs
      .join(ua, Seq("a")).join(ub, Seq("b"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(
        concat_ws(" ", col("a"), col("b")).as("bigram"),
        col("c_ab").as("n_pair"), col("n_a"), col("n_b"),
        round(log(
          (col("c_ab").cast(DoubleType) / col("nb").cast(DoubleType)) /
            ((col("n_a").cast(DoubleType) / col("nu").cast(DoubleType)) *
             (col("n_b").cast(DoubleType) / col("nu").cast(DoubleType)))), 6)
          .as("pmi"))
  }
}
