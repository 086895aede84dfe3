package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Sequential 2-pattern semantics: gap-allowed precedence via the
  * min/max-span test, strict-timestamp ties supporting neither order,
  * and the support threshold.
  */
class SeqMiningSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  private def pats(rows: Seq[(String, Long, String)], minSup: Long) =
    SeqMining.patterns2(
      rows.map { case (e, t, ty) => (e, ts(t), ty) }.toDF("e", "ts", "ty"),
      "e", "ts", "ty", minSup)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7)))
      .toMap

  test("gap-allowed precedence: a..x..b supports (a,b) only") {
    val m = pats(Seq(("u", 1L, "a"), ("u", 5L, "x"), ("u", 9L, "b")),
      minSup = 1L)
    assert(m.contains(("a", "b")) && !m.contains(("b", "a")))
    assert(m(("a", "x"))._1 === 1L)
  }

  test("interleaving supports both orders; same-ts ties support neither") {
    val both = pats(Seq(("u", 1L, "b"), ("u", 2L, "a"), ("u", 3L, "b")),
      minSup = 1L)
    assert(both.contains(("a", "b")) && both.contains(("b", "a")))
    val tie = pats(Seq(("u", 4L, "a"), ("u", 4L, "b")), minSup = 1L)
    assert(tie.isEmpty)
  }

  private def pats3(rows: Seq[(String, Long, String)], minSup: Long) =
    SeqMining.patterns3(
      rows.map { case (e, t, ty) => (e, ts(t), ty) }.toDF("e", "ts", "ty"),
      "e", "ts", "ty", minSup)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap

  test("3-patterns need a strict b-witness between the endpoints") {
    // a@1 b@2 c@3 supports <a,b,c>; c@0 a@1 b@2 does NOT support <c,a,b>
    // reversed
    val m = pats3(Seq(("u", 1L, "a"), ("u", 2L, "b"), ("u", 3L, "c")),
      minSup = 1L)
    assert(m.contains(("a", "b", "c")))
    assert(!m.contains(("c", "b", "a")))
    assert(!m.contains(("b", "a", "c"))) // no a-event after the first b
  }

  test("repeated types: <a,a,c> needs two a-events before a later c") {
    val yes = pats3(Seq(("u", 1L, "a"), ("u", 2L, "a"), ("u", 3L, "c")),
      minSup = 1L)
    assert(yes.contains(("a", "a", "c")))
    val no = pats3(Seq(("u", 1L, "a"), ("u", 3L, "c")), minSup = 1L)
    assert(!no.contains(("a", "a", "c")))
  }

  test("prefix-extension confidence = n_abc / n_ab") {
    val rows = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "c"),
      ("u2", 1L, "a"), ("u2", 2L, "b"))
    val m = pats3(rows, minSup = 1L)
    // both users support <a,b>; only u1 extends with c
    assert(m(("a", "b", "c")) === ((1L, 2L, 0.5)))
  }

  test("support counts entities, not event pairs; threshold filters") {
    val rows = Seq(
      ("u1", 1L, "a"), ("u1", 2L, "a"), ("u1", 3L, "b"), ("u1", 4L, "b"),
      ("u2", 1L, "a"), ("u2", 2L, "b"),
      ("u3", 1L, "b"), ("u3", 2L, "a"))
    val m = pats(rows, minSup = 2L)
    // (a,b): u1, u2 → 2; conf = 2/3 (three users have a); lift = 2·3/(3·3)
    assert(m(("a", "b")) === ((2L, 3L, 3L, 3L, 0.666667, 0.666667)))
    assert(!m.contains(("b", "a"))) // only u3 → below threshold
  }
}
