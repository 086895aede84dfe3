package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AllPairsSpec extends SparkSpec {
  import spark.implicits._

  private def run(threshold: Double, texts: (Long, String)*): Map[(Long, Long), Double] = {
    val out = AllPairs.pairs(texts.toSeq.toDF("doc_id", "text"),
        "doc_id", "text", threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    graft.CacheRegistry.releaseAll()
    out
  }

  /** Brute-force exact Jaccard over distinct whitespace tokens. */
  private def bruteforce(threshold: Double, texts: (Long, String)*): Map[(Long, Long), Double] = {
    val sets = texts.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib && sa.nonEmpty && sb.nonEmpty
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= threshold
    } yield (ia, ib) ->
      BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
  }

  test("matches brute force on a mixed corpus (no false negatives)") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",   // 1 token swap
      3L -> "the quick brown fox leaps over the lazy dog today",
      4L -> "completely different content about spark engines",
      5L -> "content about spark engines completely different", // permutation of 4
      6L -> "one two three four five six seven eight nine ten",
      7L -> "one two three four five six seven eight nine",    // subset of 6
      8L -> "")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      assert(run(t, docs: _*) === bruteforce(t, docs: _*), s"threshold $t")
    }
  }

  test("permuted documents are exact duplicates (jaccard 1.0)") {
    val p = run(0.9,
      4L -> "completely different content about spark engines",
      5L -> "content about spark engines completely different")
    assert(p === Map((4L, 5L) -> 1.0))
  }

  test("duplicate tokens collapse: jaccard is over DISTINCT token sets") {
    val p = run(0.5,
      1L -> "a a a a a a b",
      2L -> "a b b b")
    assert(p === Map((1L, 2L) -> 1.0))
  }

  test("threshold boundary is inclusive") {
    // sets {a,b,c,d} vs {a,b,c,e}: |∩|=3, |∪|=5 → j=0.6 exactly
    val docs = Seq(1L -> "a b c d", 2L -> "a b c e")
    assert(run(0.6, docs: _*).keySet === Set((1L, 2L)))
    assert(run(0.601, docs: _*).isEmpty)
  }

  test("topKNeighbors ≡ the window formulation over the full pair set") {
    val emb = spark.read.parquet(s"$sf/documents.parquet")
    val got = AllPairs.topKNeighbors(emb, "doc_id", "text", 0.5, k = 2)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    graft.CacheRegistry.releaseAll()
    // reference: full pairs -> symmetric -> row_number window
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val p = AllPairs.pairs(emb, "doc_id", "text", 0.5)
    val sym = p.select(col("id_a").as("id"), col("id_b").as("nbr"), col("jaccard"))
      .union(p.select(col("id_b"), col("id_a"), col("jaccard")))
      .withColumn("q", round(col("jaccard") * 1000000.0).cast("long"))
    val want = sym.withColumn("rank", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("q").desc, col("nbr").asc)))
      .filter(col("rank") <= 2)
      .select(col("id"), col("rank"), col("nbr"),
        (col("q").cast("double") / 1000000.0).as("jaccard"))
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    graft.CacheRegistry.releaseAll()
    assert(got.nonEmpty && got === want)
    // per-doc bound holds
    assert(got.groupBy(_._1).forall(_._2.size <= 2))
  }

  test("topKNeighbors plan is window-free (bounded heap, not a per-doc sort)") {
    val emb = spark.read.parquet(s"$sf/documents.parquet")
    val plan = AllPairs.topKNeighbors(emb, "doc_id", "text", 0.9, k = 3)
      .queryExecution.executedPlan.toString
    graft.CacheRegistry.releaseAll()
    assert(!plan.contains("Window"),
      "the k-per-doc report must come from the bounded TopKAgg heap, " +
        "not a data-sized per-doc window sort")
  }
}
