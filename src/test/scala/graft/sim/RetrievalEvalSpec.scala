package graft.sim

import graft.SparkSpec

class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  test("recall and reciprocal rank match hand counts, misses score zero") {
    val exact = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), // query 1: 3 true neighbors
      (2L, 20L, 1), (2L, 21L, 2)                // query 2: 2 true neighbors
    ).toDF("query_id", "neighbor_id", "rank")
    val approx = Seq(
      (1L, 99L, 1), (1L, 11L, 2), (1L, 12L, 3), // q1: 2 hits, first at rank 2
      (2L, 98L, 1), (2L, 97L, 2)                // q2: zero hits
    ).toDF("query_id", "neighbor_id", "rank")
    val got = RetrievalEval.vsExact(exact, approx)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) === ((3L, 2L, 0.666667, 0.5)))
    assert(got(2L) === ((2L, 0L, 0.0, 0.0)))
  }
}
