package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
  * MOSS algorithm): from the POSITIONAL stream of k-gram hashes, keep
  * the minimum of every w-wide window. The selected set is a
  * position-robust document signature with a guarantee MinHash does
  * not offer: any shared run of at least w+k-1 tokens between two
  * documents contributes at least one IDENTICAL selected print to
  * both — so partial overlaps (a quoted paragraph, a shared template
  * header) are detectable from the signature alone, where
  * whole-document MinHash agreement dilutes with document length.
  * Density is self-limiting: roughly 2/(w+1) of grams get selected.
  *
  * The dedup-family placement: [[Dedup.minhashCandidates]] finds
  * whole-document near-duplicates; [[Dedup.spanProfile]] profiles
  * exact shared spans corpus-wide; winnowed prints are the compact
  * per-document middle ground — join documents on a print to get
  * partial-overlap candidates at signature (not span-stream) cost.
  *
  * Determinism: grams hash with the same md5-based
  * [[TextAnalysis.hash60]] the fingerprint family uses; window minima
  * and the sorted-distinct selection are pure integer/array ops — the
  * whole signature hash-matches the DuckDB oracle.
  *
  * Scale shape: one narrow codegen-free map per document (arrays
  * bounded by document length), no shuffle; the candidate join this
  * feeds is an explode + equi-join on the print value, the same
  * bounded-bucket discipline as the LSH band join.
  */
object Winnow {

  /** Partial-overlap candidate pairs: documents sharing at least
    * `minShared` winnowed prints, with the shared count — the
    * signature-cost join for "which documents quote/embed each other"
    * that pairwise span comparison cannot afford at corpus scale.
    *
    * `maxDocsPerPrint` drops prints occurring in more than that many
    * documents before pairing (corpus-wide boilerplate — a print in
    * 10⁵ documents would alone create 10¹⁰ pairs); the same
    * bounded-bucket discipline as the LSH band join and the TF-IDF df
    * cap. Prints are distinct within a document, so the pair count IS
    * the distinct shared-print count.
    *
    * The capped print stream is computed in ONE pass (a window count
    * over the print key — the same shuffle the pair join needs anyway)
    * and persisted; both self-join sides read the cache, so the df-cap
    * work never runs twice.
    */
  def overlapCandidates(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 3, w: Int = 4, minShared: Long = 2,
      maxDocsPerPrint: Long = 100): org.apache.spark.sql.DataFrame = {
    val capped = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(df)
        .select(col(idCol).as("id"),
          explode(winnowedPrints(col(textCol), k, w)).as("p"))
        .withColumn("__nd", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("p"))))
        .filter(col("__nd") <= maxDocsPerPrint)
        .drop("__nd")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val a = capped.select(col("p"), col("id").as("id_a"))
    val b = capped.select(col("p"), col("id").as("id_b"))
    a.join(b, Seq("p"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Sorted distinct winnowed prints of `text` as array<long>:
    * minimum k-gram hash of every w-window of the gram stream; a
    * document with fewer than w grams (but at least one) selects its
    * global minimum — the whole document is one window; fewer than k
    * tokens → empty. Both the gram stream and the window scan are
    * LET-BOUND (single-element transform) so the tokenizer and the
    * gram pipeline evaluate once per row, not once per window slice.
    */
  def winnowedPrints(text: Column, k: Int = 3, w: Int = 4): Column = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    val gramsOf = element_at(
      transform(array(TextAnalysis.tokens(text)), t =>
        transform(
          when(size(t) >= k, sequence(lit(1), size(t) - (k - 1)))
            .otherwise(array().cast(ArrayType(IntegerType))),
          i => TextAnalysis.hash60(
            concat_ws(" ", (0 until k).map(o => element_at(t, i + o)): _*)))),
      1)
    element_at(
      transform(array(gramsOf), g =>
        when(size(g) >= w,
          array_sort(array_distinct(
            transform(sequence(lit(1), size(g) - (w - 1)),
              j => array_min(slice(g, j, lit(w)))))))
          .when(size(g) > 0, array(array_min(g)))
          .otherwise(array().cast(ArrayType(LongType)))),
      1)
  }
}
