package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed byte-pair-encoding vocabulary training (Sennrich et al.
  * 2016, arXiv:1508.07909): iteratively merge the most frequent
  * adjacent symbol pair across the corpus, starting from characters.
  * The learned merge list IS the tokenizer model.
  *
  * Classic BPE trains on the WORD-FREQUENCY table, not the raw token
  * stream — the corpus collapses to (distinct word, count) once, and
  * every round then works on vocabulary-sized data (Heaps' law keeps
  * that ≪ corpus size at any scale). Each round is: one
  * partial-aggregated pair-count shuffle over the word table, a
  * TakeOrdered(1) argmax (count desc, pair lexicographic — fully
  * deterministic), and a narrow per-word merge rewrite (a left fold
  * expression; leftmost-first non-overlapping application, the
  * standard BPE rule). Driver state is one (pair, weight) per round —
  * the bounded-model-state contract of [[graft.sim.KMeans]].
  *
  * Production vocabularies run ~30k merges with this exact per-round
  * shape (cost O(vocab) each, independent of corpus size); at that
  * depth the word table should be re-persisted with a localCheckpoint
  * every ~50 rounds to truncate plan lineage, and rounds can be
  * batched by taking the top-k DISJOINT pairs per round (the
  * SentencePiece speedup) at a small fidelity cost. The oracle-checked
  * query runs the exact algorithm at small depth.
  */
object Bpe {

  final case class Merge(step: Int, lhs: String, rhs: String, weight: Long)

  /** Characters of `w` as an array<string> of single-char symbols. */
  private def chars(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** Leftmost-first non-overlapping merge of adjacent (a, b) → a+b in
    * the symbol array: a left fold that replaces the accumulator's
    * last element when it is `a` and the incoming symbol is `b`.
    * (Overlapping runs resolve leftmost-first automatically: once a
    * pair merges, the merged symbol a+b no longer equals `a`... unless
    * a == a+b, which needs b empty — impossible for real symbols.)
    */
  private def applyMerge(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast(ArrayType(StringType)),
      (acc, c) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && c === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(c))))

  /** Adjacent symbol pairs of each word, weighted by word count. */
  private def pairs(words: DataFrame): DataFrame =
    words.filter(size(col("sym")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("sym")) - 1),
        i => struct(element_at(col("sym"), i).as("a"),
          element_at(col("sym"), i + 1).as("b")))).as("p"))
      .select(col("p.a"), col("p.b"), col("cnt"))

  /** Train `steps` merges on the whitespace-token stream of `textCol`.
    * Stops early if the corpus runs out of adjacent pairs.
    */
  def train(df: DataFrame, textCol: String, steps: Int): Seq[Merge] = {
    require(steps >= 1)
    var cur = graft.ops.Parallelism.widen(df)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), chars(col("w")).as("sym"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = Seq.newBuilder[Merge]
    try {
      var step = 1
      var exhausted = false
      while (step <= steps && !exhausted) {
        val best = pairs(cur)
          .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("w"))
          .orderBy(col("w").desc, col("a").asc, col("b").asc)
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val (a, b, w) = (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
          out += Merge(step, a, b, w)
          val next = cur
            .select(col("cnt"), applyMerge(col("sym"), a, b).as("sym"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count() // materialize before dropping the parent cache
          cur.unpersist()
          cur = next
          step += 1
        }
      }
      out.result()
    } finally cur.unpersist()
  }

  /** Batched trainer — the documented scale path: `steps` ROUNDS, each
    * taking the top `batch` pairwise-DISJOINT pairs (no shared symbol,
    * so their rewrites cannot interact) and applying them in ONE pass
    * over the word table. Cuts driver round-trips and rewrite passes
    * by ~batch× versus [[train]] at a small fidelity cost (pair counts
    * are not refreshed between merges inside a round — the
    * SentencePiece speedup). When every picked pair is disjoint and
    * stays the argmax after the others apply, the result equals
    * sequential training.
    */
  def trainBatched(df: DataFrame, textCol: String, steps: Int,
      batch: Int): Seq[Merge] = {
    require(steps >= 1 && batch >= 1)
    var cur = graft.ops.Parallelism.widen(df)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), chars(col("w")).as("sym"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = Seq.newBuilder[Merge]
    try {
      var step = 1
      var round = 1
      var exhausted = false
      while (round <= steps && !exhausted) {
        // over-fetch so the greedy disjoint filter can still fill the batch
        val top = pairs(cur)
          .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("w"))
          .orderBy(col("w").desc, col("a").asc, col("b").asc)
          .limit(batch * 4).collect()
        if (top.isEmpty) exhausted = true
        else {
          round += 1
          val used = scala.collection.mutable.Set.empty[String]
          val picked = top.iterator
            .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
            .filter { case (a, b, _) =>
              val ok = !used(a) && !used(b) && !used(a + b)
              if (ok) { used += a; used += b; used += (a + b) }
              ok
            }
            .take(batch).toSeq
          picked.foreach { case (a, b, w) =>
            out += Merge(step, a, b, w); step += 1
          }
          val folded = picked.foldLeft(col("sym")) {
            case (sym, (a, b, _)) => applyMerge(sym, a, b)
          }
          val next = cur.select(col("cnt"), folded.as("sym"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          next.count()
          cur.unpersist()
          cur = next
        }
      }
      out.result()
    } finally cur.unpersist()
  }

  /** The merge table as a DataFrame: (step, lhs, rhs, weight). */
  def merges(spark: SparkSession, df: DataFrame, textCol: String,
      steps: Int): DataFrame = {
    import spark.implicits._
    train(df, textCol, steps).toDF()
  }

  /** Encode: segment every document with a learned merge list. The
    * merge chain is applied to the DISTINCT-word table (one fold per
    * merge, composed as a single narrow expression), and documents
    * join their token stream against that ≤vocabulary-sized map (AQE
    * broadcasts it when it fits) — the corpus is never folded per
    * occurrence. Returns (idCol, n_tokens, n_subwords): the
    * compression the vocabulary achieves per document.
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val folded = merges.foldLeft(chars(col("w"))) {
      (sym, m) => applyMerge(sym, m.lhs, m.rhs)
    }
    val toks = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(df)
        .select(col(idCol).as("id"),
          explode(TextAnalysis.tokens(col(textCol))).as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val wordLens = toks.select(col("w")).distinct()
      .select(col("w"), size(folded).as("n_sub"))
    val perDoc = toks.join(wordLens, Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("n_sub")).as("n_subwords"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"))
  }
}
