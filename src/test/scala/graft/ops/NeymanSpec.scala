package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Neyman allocation + draw invariants: budget respected, n_h caps,
  * zero-variance edge, and the sample being exactly the per-stratum
  * hash-order prefix of the allocated length.
  */
class NeymanSpec extends SparkSpec {
  import spark.implicits._

  // three strata: high-variance (wide length spread), low-variance,
  // and a CONSTANT stratum (σ = 0 — must get zero allocation)
  private def corpus = (
    (1L to 40L).map(i => (i, "hi", if (i % 2 == 0) 10L else 1000L)) ++
    (41L to 80L).map(i => (i, "lo", 500L + (i % 3))) ++
    (81L to 100L).map(i => (i, "const", 250L))
  ).toDF("doc_id", "source", "n_chars")

  test("allocation: Σalloc ≤ total, alloc ≤ N_h, σ=0 stratum gets zero") {
    val a = Sampling.neymanAlloc(corpus, "source", "n_chars", total = 30)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(4))).toMap
    assert(a.values.map(_._3).sum <= 30)
    a.values.foreach { case (nh, _, al) => assert(al >= 0 && al <= nh) }
    assert(a("const")._3 == 0L && a("const")._2 == 0.0)
    // the wide-spread stratum out-earns the narrow one despite equal size
    assert(a("hi")._3 > a("lo")._3)
  }

  test("draw ≡ per-stratum hash-order prefix of the allocated length") {
    val got = Sampling.neymanSample(corpus, "doc_id", "source",
      "n_chars", total = 30)
      .select($"source", $"rnk", $"doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // reference: full window ranking (test scale only)
    val alloc = Sampling.neymanAlloc(corpus, "source", "n_chars", 30)
      .select($"source", $"alloc")
    import org.apache.spark.sql.expressions.Window
    val ref = corpus
      .withColumn("hv", graft.text.TextAnalysis.hash60(
        $"doc_id".cast("string")))
      .withColumn("rnk", row_number().over(Window.partitionBy($"source")
        .orderBy($"hv".desc, $"doc_id".asc)).cast("long"))
      .join(alloc, Seq("source"))
      .filter($"rnk" <= $"alloc")
      .select($"source", $"rnk", $"doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref && got.nonEmpty)
  }
}
