package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED POSITIONAL inverted index — the phrase-query sibling of
  * [[Bm25Index]]: where the BM25 postings carry (tok, df, id, tf, dl)
  * for bag-of-words ranking, this table carries (tok, id, pos) so
  * ADJACENCY is answerable at serve time — phrase search, k-word-gap
  * proximity, highlight offsets. Bucketed by term with the shared
  * staleness fingerprint; a phrase probe scans ONLY the queried
  * terms' buckets (bucket pruning, spec-pinned) and the adjacency
  * join moves postings-sized data — candidate-proportional, never
  * corpus-proportional.
  */
object PhraseIndex {

  /** The positional postings frame: one row per (tok, id, pos),
    * pos = 0-based token offset within the document.
    */
  def postingsOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.ops.Parallelism.widen(docs)
      .select(col(idCol).as("id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col("tok"), col("id"), col("pos").cast("long").as("pos"))

  /** Persist (or reuse) the positional index; true on (re)build. */
  def ensure(docs: DataFrame, idCol: String, textCol: String,
      table: String, nBuckets: Int): Boolean =
    graft.dedup.IncrementalDedup.ensureBucketedState(
      docs, idCol, textCol, table, nBuckets,
      bucketCols = Seq("tok"), sortCols = Seq("tok", "id", "pos"))(
      postingsOf(docs, idCol, textCol))

  /** The corpus's most frequent bigram, FROM the index: adjacency is
    * a (id, pos+1) self-join of the postings — equal by construction
    * to a lead() over dense per-doc positions — then one grouped
    * count and a TakeOrdered(1) with total tie-break.
    */
  def topBigram(spark: SparkSession, table: String): DataFrame = {
    val p = spark.table(table)
    p.alias("a").join(p.alias("b"),
        col("a.id") === col("b.id") && col("b.pos") === col("a.pos") + 1L)
      .groupBy(col("a.tok").as("w1"), col("b.tok").as("w2"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1").asc, col("w2").asc)
      .limit(1)
      .select(col("w1"), col("w2"))
  }

  /** Per-document occurrences of the two-token phrase (w1 w2), FROM
    * the index: each side scans only its term's buckets; the
    * adjacency join is postings-sized.
    */
  def phraseOccurrences(spark: SparkSession, table: String,
      w1: String, w2: String): DataFrame = {
    val p = spark.table(table)
    val a = p.filter(col("tok") === w1)
      .select(col("id"), col("pos"))
    val b = p.filter(col("tok") === w2)
      .select(col("id").as("id2"), col("pos").as("pos2"))
    a.join(b, col("id") === col("id2") && col("pos2") === col("pos") + 1L)
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_occ"), min(col("pos")).as("first_pos"))
      .select(col("doc_id"), lit(w1).as("w1"), lit(w2).as("w2"),
        col("n_occ"), col("first_pos"))
  }
}
