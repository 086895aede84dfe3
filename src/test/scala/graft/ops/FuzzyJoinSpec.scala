package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletionVariants enumerates the full <=d neighborhood, distinct") {
    val out = spark.range(1).select(
        FuzzyJoin.deletionVariants(lit("abc"), 2).as("v"))
      .select(explode($"v")).as[String].collect().toSet
    // d=0: abc; d=1: bc, ac, ab; d=2: a, b, c
    assert(out === Set("abc", "bc", "ac", "ab", "a", "b", "c"))
  }

  test("short strings delete down to empty without error") {
    val out = spark.range(1).select(
        FuzzyJoin.deletionVariants(lit("a"), 2).as("v"))
      .select(explode($"v")).as[String].collect().toSet
    assert(out === Set("a", ""))
  }

  test("pairs within distance 2 found; distance 3 excluded; ordered str_a < str_b") {
    val df = Seq("kitten", "sitten", "sittin", "sitting", "zzzzzz").toDF("s")
    val out = FuzzyJoin.selfJoin(df, "s", maxEdits = 2)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("kitten", "sitten")) === 1L)
    assert(out(("sitten", "sittin")) === 1L)
    assert(out(("sittin", "sitting")) === 1L)
    assert(out(("kitten", "sittin")) === 2L)
    assert(out(("sitten", "sitting")) === 2L)
    // kitten->sitting is distance 3; zzzzzz matches nothing
    assert(!out.contains(("kitten", "sitting")))
    assert(!out.keys.exists(p => p._1 == "zzzzzz" || p._2 == "zzzzzz"))
    assert(out.keys.forall(p => p._1 < p._2))
  }

  test("blocking is complete: equals brute-force all-pairs on random short keys") {
    // deterministic vocabulary with planted near-misses
    val words = (0 until 60).map { i =>
      val base = "abcdefgh".substring(0, 3 + i % 5)
      if (i % 3 == 0) base + ("xy".substring(0, i % 2 + 1)) else base + i.toString
    }.distinct
    val df = words.toDF("s")
    val fuzzy = FuzzyJoin.selfJoin(df, "s", maxEdits = 2)
      .as[(String, String, Long)].collect().toSet
    val n = df.select($"s".as("a"))
    val brute = n.join(df.select($"s".as("b")), $"a" < $"b")
      .withColumn("d", levenshtein($"a", $"b").cast("long"))
      .filter($"d" <= 2).as[(String, String, Long)].collect().toSet
    assert(fuzzy === brute)
  }

  test("duplicate corpus rows do not multiply the pair list") {
    val df = Seq("abc", "abc", "abd", "abd").toDF("s")
    val out = FuzzyJoin.selfJoin(df, "s", maxEdits = 1).collect()
    assert(out.length === 1)
  }
}
