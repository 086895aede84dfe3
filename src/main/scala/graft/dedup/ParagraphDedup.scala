package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact duplicate-PARAGRAPH removal with document reassembly — the
  * sub-document granularity of exact dedup used by the MassiveText /
  * RefinedWeb recipes: split each document at structural boundaries
  * (blank lines in production; the delimiter is a parameter), keep
  * only the FIRST occurrence of each distinct paragraph across the
  * whole corpus, and stitch the survivors back into per-document
  * cleaned text. Boilerplate (headers, footers, license blocks)
  * repeated across thousands of pages disappears from every copy but
  * the first, while each page keeps its unique content — something
  * document-level dedup (graft.dedup.Dedup.exactDedup) cannot do and
  * span-level winnowing ([[Winnow]]) only approximates.
  *
  * Semantics:
  *  - paragraphs are the literal-delimiter split cells; cells that are
  *    empty or whitespace-only are dropped on BOTH the dedup and the
  *    reassembly path (they carry no content, only formatting);
  *  - "first occurrence" is the minimum of (docKey, position) under
  *    the packed total order docKey·2^20 + position — deterministic,
  *    partitioning-independent, and replayed exactly by the oracle
  *    (positions must fit 20 bits — ENFORCED with raise_error, since
  *    an overflow would alias ownership keys across documents — and
  *    doc keys 43: ~10^6 paragraphs per document, ~8·10^12 docs);
  *  - paragraph identity is the portable 60-bit md5 hash
  *    ([[TextAnalysis.hash60]]) of the cell — both engines group by
  *    the same hash, so results agree even in the (~n²/2^61)
  *    collision case;
  *  - documents whose every paragraph is a duplicate stay in the
  *    output with empty text (a downstream length gate drops them).
  *
  * Scale shape: one narrow posexplode (persisted once for its three
  * consumers), one hash-keyed partial
  * aggregate (the owner min), one hash-keyed join of cells to owners,
  * and one docKey-keyed aggregate to reassemble — every shuffle is on
  * a high-cardinality hash key with map-side combine, no windows, no
  * driver-side data. At 100 TB the owner table is |distinct
  * paragraphs| rows of (hash, packed-owner) — the same footprint as
  * document-level exact dedup's group table.
  */
object ParagraphDedup {

  /** Positions pack into the low 20 bits of the ownership key. */
  val IdxBits = 20

  /** @param idCol   integral document key (cast to LONG)
    * @param textCol paragraph-bearing text column
    * @param delim   literal paragraph delimiter (e.g. "\n\n"); also
    *                used to re-join the kept paragraphs
    */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      delim: String): DataFrame = {
    val cells = df
      .select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
          .as(Seq("idx", "para")))
      .filter(trim(col("para")) =!= "")
    // fail LOUDLY past the packing bounds: an idx overflowing into the
    // doc-key bits — or a doc_id whose shifted product wraps 2^63 —
    // would alias ownership keys across documents and let duplicates
    // survive silently (the oracle replays the same arithmetic, so
    // the gate could not catch it either). Both ends guard.
    val pk = when(
      col("doc_id") < lit(0L) || col("doc_id") >= lit(1L << (63 - IdxBits)),
      raise_error(concat(
        lit(s"ParagraphDedup: doc key outside [0, 2^${63 - IdxBits}): "),
        col("doc_id").cast("string"))).cast(LongType))
      .when(col("idx") < lit(1L << IdxBits),
        col("doc_id") * lit(1L << IdxBits) + col("idx").cast(LongType))
      .otherwise(raise_error(concat(
        lit(s"ParagraphDedup: paragraph index ≥ 2^$IdxBits in doc "),
        col("doc_id").cast("string"))).cast(LongType))
    // the split+hash lineage feeds THREE consumers (owners, the join
    // probe, totals) — persist it so the corpus text tokenizes once,
    // the spanProfile discipline
    val hashed = graft.CacheRegistry.register(
      cells
        .withColumn("h", TextAnalysis.hash60(col("para")))
        .withColumn("pk", pk)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val owners = hashed.groupBy(col("h")).agg(min(col("pk")).as("owner"))
    val kept = hashed.join(owners, Seq("h")).filter(col("pk") === col("owner"))
    val reassembled = kept.groupBy(col("doc_id")).agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("idx"), col("para")))),
          _.getField("para")),
        delim).as("text_dedup"),
      count(lit(1)).as("n_kept"))
    val totals = hashed.groupBy(col("doc_id")).agg(count(lit(1)).as("n_paras"))
    df.select(col(idCol).cast(LongType).as("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
}
