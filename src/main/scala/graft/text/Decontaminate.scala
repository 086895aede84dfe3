package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Benchmark decontamination — the n-gram overlap scrub every serious
  * pretraining pipeline runs before training: a document that shares
  * any width-n token window with an evaluation benchmark leaks test
  * data into the training set and must be flagged/dropped (the
  * 13-gram rule of the published GPT-3/PaLM data cards; n is a knob
  * here because the synthetic docs are short).
  *
  * Scale shape — the benchmark side is EVAL-SUITE-sized (thousands of
  * prompts, megabytes) while the corpus is the 100 TB side, so the
  * design is strictly asymmetric:
  *  - the benchmark's distinct gram hashes BROADCAST (a long set,
  *    ~8 bytes/gram — far under any broadcast threshold);
  *  - the corpus runs two narrow passes over (tokenize → windowed
  *    gram hash → array_distinct): one emits (id, n_grams), the other
  *    explodes into the broadcast-hash-join probe. Recomputing the
  *    narrow projection twice beats materializing a corpus-sized
  *    gram table (no cache can hold it at target scale);
  *  - the only shuffle is the per-doc partial-aggregated hit count,
  *    keyed by doc id.
  *
  * Reference for the window construction:
  * [[graft.dedup.SubstringDedup]] (same positional w-gram recipe;
  * here windows are deduplicated per doc because overlap COUNTS, not
  * positions, are the contract).
  */
object Decontaminate {

  /** Distinct width-`n` token-window hashes of `textCol`, as an array
    * column; docs shorter than n tokens get an empty array.
    */
  def gramSet(textCol: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column = {
    require(n >= 2, s"gram width n=$n must be at least 2 tokens")
    val toks = TextAnalysis.tokens(textCol)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => TextAnalysis.hash60(
            concat_ws(" ", slice(toks, i + 1, lit(n))))))
        .otherwise(array().cast(ArrayType(LongType))))
  }

  /** Per-corpus-document contamination audit against a benchmark
    * table: (idCol, n_grams, n_hit, contaminated) where n_grams is
    * the doc's distinct gram count, n_hit how many of those grams
    * appear anywhere in the benchmark, and contaminated = 1 iff any
    * does. Every corpus row is present exactly once (short docs with
    * zero grams report 0/0/0).
    */
  def audit(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    val base = corpus.select(col(idCol).as("id"),
      gramSet(col(textCol), n).as("hs"))
    val grams = base.select(col("id"), explode(col("hs")).as("h"))
    val benchGrams = bench
      .select(explode(gramSet(col(benchTextCol), n)).as("h")).distinct()
    val hits = grams
      .join(broadcast(benchGrams), Seq("h"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_hit"))
    base.select(col("id"), size(col("hs")).cast(LongType).as("n_grams"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        when(coalesce(col("n_hit"), lit(0L)) >= 1, 1).otherwise(0)
          .as("contaminated"))
  }
}
