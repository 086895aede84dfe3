package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The blocklist kernel's contract: every (term, end-position)
  * occurrence of the whole dictionary in one pass — including terms
  * nested inside other terms, occurrences overlapping across terms,
  * and self-overlapping (bordered) terms — plus the distinct-term
  * count; and the generated code stays one static call no matter how
  * large the dictionary is.
  */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: all end positions of every term + distinct terms. */
  private def naive(text: String, dict: Seq[String]): (Int, Int) = {
    val hits = dict.iterator.map { t =>
      (0 to text.length - t.length).count(i => text.startsWith(t, i))
    }.sum
    (hits, dict.count(text.contains(_)))
  }

  private def run(texts: Seq[String], dict: Seq[String]): Seq[(Int, Int)] =
    texts.toDF("t")
      .select(Blocklist.blocklist_hits(col("t"), dict).as("h"))
      .select(col("h.hits"), col("h.terms"))
      .collect().toSeq.map(r => (r.getInt(0), r.getInt(1)))

  test("≡ brute-force scan on random texts (overlaps, nesting, borders)") {
    val rnd = new scala.util.Random(42)
    val alpha = "abc"
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    // deliberately includes bordered terms ("aa", "abab"), a term that
    // is a suffix of another ("ab" in "cab"... via random), nesting
    val dict = (Seq("a", "aa", "aba", "abab", "bb", "cab", "b") ++
      Seq.fill(12)(word(1 + rnd.nextInt(5)))).distinct
    val texts = "" +: Seq.fill(60)(word(rnd.nextInt(200)))
    assert(run(texts, dict) == texts.map(naive(_, dict)))
  }

  test("dict-suffix outputs: a term ending inside another term's match") {
    // "scan" ends wherever "table scan" ends; "art" sits inside "part"
    val dict = Seq("table scan", "scan", "art", "password")
    val text = "the part table scan starts a scan"
    // "scan" at 2 positions + "table scan" at 1 + "art" in "part" and
    // "starts" = 2
    assert(run(Seq(text), dict) == Seq((5, 3)))
  }

  test("bordered terms count every end position (kernel semantics)") {
    assert(run(Seq("aaaa"), Seq("aa")) == Seq((3, 1)))
    assert(run(Seq("ababab"), Seq("abab")) == Seq((2, 1)))
  }

  test("multibyte UTF-8 terms match byte-exactly (self-synchronizing)") {
    val dict = Seq("déjà", "é")
    val texts = Seq("déjà vu déjà", "plain ascii", "ééé")
    assert(run(texts, dict) == texts.map(naive(_, dict)))
  }

  test("term-count attribution ≡ per-term brute force; scratch reuse across rows and dicts") {
    val rnd = new scala.util.Random(7)
    val alpha = "abc"
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val dict = (Seq("a", "ab", "ba", "aa") ++
      Seq.fill(8)(word(1 + rnd.nextInt(4)))).distinct
    val texts = "" +: Seq.fill(40)(word(rnd.nextInt(120)))
    val got = texts.toDF("t")
      .select(Blocklist.blocklist_term_counts(col("t"), dict).as("a"))
      .collect().toSeq.map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getInt(0), r.getInt(1))).toSeq)
    val want = texts.map { tx =>
      dict.zipWithIndex.flatMap { case (t, i) =>
        val c = (0 to tx.length - t.length).count(j => tx.startsWith(t, j))
        if (c > 0) Some((i, c)) else None
      }.sortBy(_._1).toSeq
    }
    assert(got == want)
    // a second dictionary in the same thread re-keys the scratch
    val got2 = Seq("abab").toDF("t")
      .select(Blocklist.blocklist_term_counts(col("t"),
        Seq("ab", "zz")).as("a"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got2 == Seq((0, 2)))
  }

  test("null text degrades to null; empty dictionary is rejected") {
    val out = Seq("x").toDF("t")
      .withColumn("t", when(lit(false), col("t")))
      .select(Blocklist.blocklist_hits(col("t"), Seq("x")).as("h"))
      .collect()
    assert(out.length == 1 && out.head.isNullAt(0))
    intercept[IllegalArgumentException](AhoCorasick.build(Nil))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "a")))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("")))
  }

  test("hasBorder flags self-overlap-capable terms") {
    assert(AhoCorasick.hasBorder("aa"))
    assert(AhoCorasick.hasBorder("abab"))
    assert(AhoCorasick.hasBorder("the fast t")) // border "t"
    assert(!AhoCorasick.hasBorder("slow query"))
    assert(!AhoCorasick.hasBorder("a"))
  }

  test("generated code is one static call — a 2000-term dictionary stays codegen'd") {
    import org.apache.spark.sql.execution.debug._
    val dict = (0 until 2000).map(i => s"term${i}x").toSeq
    // literal inputs constant-fold to a LocalTableScan — feed from a
    // range so the projection stays a codegen stage
    val df = spark.range(2)
      .select(when(col("id") === 0, "term5x and term1999x here")
        .otherwise("nothing").as("t"))
      .select(Blocklist.blocklist_hits(col("t"), dict).as("h"))
      .select(col("h.hits"), col("h.terms"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val stats = try codegenStringSeq(df.queryExecution.executedPlan)
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(stats.nonEmpty, "expected a WholeStageCodegen subtree")
    stats.foreach { case (_, _, bc) =>
      assert(bc.maxMethodCodeSize > 0, "codegen failed to compile")
      assert(bc.maxMethodCodeSize < 8192,
        s"dictionary size leaked into generated code: ${bc.maxMethodCodeSize}")
    }
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1))).toSet ==
      Set((2, 2), (0, 0)))
  }
}
