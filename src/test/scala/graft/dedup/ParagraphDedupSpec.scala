package graft.dedup

import graft.SparkSpec

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // doc 1 owns both paragraphs
    (1L, "alpha beta\n\nshared boilerplate"),
    // doc 2 repeats doc 1's boilerplate, keeps its unique cell
    (2L, "shared boilerplate\n\ngamma delta"),
    // doc 3 is ENTIRELY duplicates (of doc 1 and of itself)
    (3L, "shared boilerplate\n\nalpha beta\n\nshared boilerplate"),
    // doc 4: internal duplicate cell + blank cells around it
    (4L, "\n\nepsilon\n\n\n\nepsilon\n\nzeta")
  ).toDF("doc_id", "text")

  private def result = ParagraphDedup
    .dedupParagraphs(docs, "doc_id", "text", "\n\n")
    .as[(Long, String, Long, Long)].collect()
    .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("first corpus-wide occurrence wins; survivors reassemble in order") {
    val r = result
    assert(r(1L) === (("alpha beta\n\nshared boilerplate", 2L, 2L)))
    assert(r(2L) === (("gamma delta", 2L, 1L)))
  }

  test("fully-duplicate documents stay present with empty text") {
    assert(result(3L) === (("", 3L, 0L)))
  }

  test("blank cells are ignored; within-doc duplicates collapse") {
    // doc 4 has cells: "", "epsilon", "", "epsilon", "zeta" → 3 non-blank,
    // 2 kept (first epsilon + zeta), rejoined without the blank cells
    assert(result(4L) === (("epsilon\n\nzeta", 3L, 2L)))
  }

  test("output covers every input document exactly once") {
    assert(result.keySet === Set(1L, 2L, 3L, 4L))
  }

  test("subset stability: removing later docs never changes earlier winners") {
    val sub = ParagraphDedup
      .dedupParagraphs(docs.filter($"doc_id" <= 2L), "doc_id", "text", "\n\n")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(sub(1L) === result(1L) && sub(2L) === result(2L))
  }

  test("generative law: engine matches a direct reference fold") {
    // random docs over a TINY cell pool → heavy cross-document
    // duplication, the regime the operator exists for
    val rnd = new scala.util.Random(3)
    val pool = Vector("alpha beta", "gamma", "delta eps", "zeta", " ", "")
    val corpus = (1L to 200L).map { id =>
      id -> Vector.fill(1 + rnd.nextInt(6))(pool(rnd.nextInt(pool.size)))
    }
    // reference: first-occurrence-wins on (doc, idx) over non-blank cells
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = corpus.map { case (id, cells) =>
      val withIdx = cells.zipWithIndex.filter(_._1.trim.nonEmpty)
      val kept = withIdx.filter { case (c, _) =>
        if (seen.contains(c)) false else { seen += c; true }
      }
      id -> ((kept.map(_._1).mkString("\n\n"),
        withIdx.size.toLong, kept.size.toLong))
    }.toMap
    val out = ParagraphDedup.dedupParagraphs(
      corpus.map { case (id, cells) => (id, cells.mkString("\n\n")) }
        .toDF("doc_id", "text"),
      "doc_id", "text", "\n\n")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === expected)
  }

  test("doc keys outside the packing range abort loudly") {
    // a negative key (or one ≥ 2^43) would silently wrap the packed
    // ownership key and alias across documents — must raise instead
    val bad = Seq((-1L, "alpha\n\nbeta")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      ParagraphDedup.dedupParagraphs(bad, "doc_id", "text", "\n\n").collect()
    }
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(msg).getOrElse("")
    assert(msg(ex).contains("doc key outside"))
  }

  test("plan has no window and no single-partition exchange") {
    val plan = ParagraphDedup.dedupParagraphs(docs, "doc_id", "text", "\n\n")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    assert(!plan.contains("SinglePartition"), s"single partition:\n$plan")
  }
}
