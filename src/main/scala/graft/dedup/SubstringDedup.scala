package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact-substring dedup — first-occurrence-wins removal of duplicated
  * token runs at SUB-paragraph granularity, the published recipe for
  * training-corpus passage dedup (suffix-array family: find every
  * maximal duplicated extent of ≥ w tokens, keep the corpus-wide first
  * occurrence, scrub the rest). This closes the gap the two sibling
  * operators leave open:
  *
  *  - [[ParagraphDedup]] only catches DELIMITER-ALIGNED duplicates —
  *    a 60-token passage straddling a paragraph boundary survives it,
  *    because the cells on either side differ between documents;
  *  - [[Dedup.scrubDuplicateSpans]] removes EVERY occurrence of a
  *    duplicated span (boilerplate removal) — it has no ownership
  *    notion, so the first copy is lost too.
  *
  * The Spark shape replaces the suffix array with its shuffle-friendly
  * equivalent: a positional w-token window table. Every duplicated
  * passage of length L ≥ w contributes all of its L−w+1 windows to the
  * duplicate set, so the UNION of covered positions in each non-owner
  * occurrence is exactly the maximal duplicate extent — adjacent-hit
  * merging for free, no suffix sorting. Ownership is the packed
  * (doc, position) minimum per window hash, the same corpus-wide
  * first-occurrence rule (and the same loud packing guards) as
  * [[ParagraphDedup]].
  *
  * Scale shape: one narrow tokenize map, one posexplode (fan-out
  * tokens-per-doc), one hash-keyed ownership aggregate with map-side
  * combine, one equi-join back, position fan-out ≤ w per duplicated
  * window, and a per-document rebuild aggregate — group-table
  * footprint throughout, no windows over data-sized partitions, no
  * pairwise work, no driver-side data. The only window function is
  * per-document (high-cardinality key) in [[duplicateSpans]]'s island
  * merge.
  *
  * Guarantee boundary (inherent to the window recipe, documented not
  * papered over): duplicated runs SHORTER than w tokens are invisible;
  * w is the minimum match length, as in the public suffix-array
  * pipelines.
  */
object SubstringDedup {

  /** Positions pack into the low bits of the ownership key — shared
    * with [[ParagraphDedup]] so the two first-occurrence rules agree.
    */
  val IdxBits: Int = ParagraphDedup.IdxBits

  /** (base, covered): the persisted (id, toks) table and the distinct
    * (id, p) positions covered by some non-owner duplicated window.
    */
  private def coveredPositions(df: DataFrame, idCol: String,
      textCol: String, w: Int): (DataFrame, DataFrame) = {
    require(w >= 2, s"window width w=$w must be at least 2 tokens")
    val base = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(df)
        .select(col(idCol).cast(LongType).as("id"),
          TextAnalysis.tokens(col(textCol)).as("toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // positional w-gram hashes: entry at 0-based pos i covers
    // toks[i, i+w) — same construction as Dedup.scrubDuplicateSpans
    val gramArr = when(size(col("toks")) >= w,
      transform(sequence(lit(0), size(col("toks")) - w),
        i => TextAnalysis.hash60(
          concat_ws(" ", slice(col("toks"), i + 1, lit(w)))) % Dedup.P))
      .otherwise(array().cast(ArrayType(LongType)))
    // packed (doc, pos) ownership key with ParagraphDedup's loud
    // guards: aliasing would let duplicates survive silently and the
    // oracle replays the same arithmetic, so both ends must abort
    val pk = when(
      col("id") < lit(0L) || col("id") >= lit(1L << (63 - IdxBits)),
      raise_error(concat(
        lit(s"SubstringDedup: doc key outside [0, 2^${63 - IdxBits}): "),
        col("id").cast("string"))).cast(LongType))
      .when(col("pos") < lit(1L << IdxBits),
        col("id") * lit(1L << IdxBits) + col("pos").cast(LongType))
      .otherwise(raise_error(concat(
        lit(s"SubstringDedup: window position ≥ 2^$IdxBits in doc "),
        col("id").cast("string"))).cast(LongType))
    // the window table feeds two consumers (ownership agg + probe)
    val spans = graft.CacheRegistry.register(
      base.select(col("id"), posexplode(gramArr).as(Seq("pos", "h")))
        .withColumn("pk", pk)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val owners = spans.groupBy(col("h")).agg(min(col("pk")).as("owner"))
    val covered = spans.join(owners, Seq("h"))
      .filter(col("pk") =!= col("owner"))
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + (w - 1))).as("p"))
      .distinct()
    (base, covered)
  }

  /** Scrub every non-first occurrence of every duplicated ≥ w-token
    * run and reassemble the surviving tokens in order. Output:
    * (idCol, text_dedup, n_tokens, n_kept, n_dropped) — every input
    * document present exactly once (fully-duplicate documents survive
    * with empty text, like [[ParagraphDedup]]).
    */
  def dedupSubstrings(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8): DataFrame = {
    val (base, covered) = coveredPositions(df, idCol, textCol, w)
    val kept = base
      .select(col("id"), posexplode(col("toks")).as(Seq("p", "tok")))
      .join(covered, Seq("id", "p"), "left_anti")
      .groupBy(col("id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("p"), col("tok")))),
            s => s.getField("tok")),
          " ").as("text_dedup"),
        count(lit(1)).as("n_kept"))
    base.select(col("id"), size(col("toks")).cast(LongType).as("n_tokens"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** The maximal duplicate extents themselves — (idCol, span_start,
    * span_end, span_len) with [span_start, span_end) a 0-based token
    * interval in the NON-owner document. Adjacent covered positions
    * merge by the islands rule (position − rank is constant within a
    * run); the window is per-document only.
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8): DataFrame = {
    val (_, covered) = coveredPositions(df, idCol, textCol, w)
    val win = Window.partitionBy(col("id")).orderBy(col("p"))
    covered
      .withColumn("grp", col("p") - row_number().over(win))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("p")).cast(LongType).as("span_start"),
        (max(col("p")) + 1).cast(LongType).as("span_end"),
        count(lit(1)).as("span_len"))
      .select(col("id").as(idCol),
        col("span_start"), col("span_end"), col("span_len"))
  }
}
