package graft.functions

import graft.SparkSpec
import graft.dedup.{Dedup, SortedNeighborhood}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property laws for the round-10 kernels, drawn deterministically
  * (same offline-scalacheck pattern as cleanse.PropertySpec): entropy
  * bounds, rank permutation/order laws on random keyed data, and
  * containment's set-algebra bounds.
  */
class KernelLawsSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int, seed: Long = 7L): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  private def h(s: String): Double =
    CharEntropyKernel.entropyQ6(UTF8String.fromString(s))

  test("law: 0 ≤ entropy ≤ ln(distinct chars), equality at the extremes") {
    val strGen = Gen.chooseNum(1, 200).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'h') ++ Seq(' ', '.'))).map(_.mkString))
    cases(strGen, 300).foreach { s =>
      val e = h(s)
      val k = s.toSet.size
      assert(e >= 0.0, s"negative entropy for '$s'")
      // quantization error bound: 1e-6 per step, rounded to 6 dp
      assert(e <= math.log(k.toDouble) + 2e-6,
        s"entropy $e exceeds ln($k) for '$s'")
      if (k == 1) assert(e === 0.0)
    }
  }

  test("law: entropy is invariant under permutation and symbol renaming") {
    val strGen = Gen.chooseNum(2, 120).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a' to 'f')).map(_.mkString))
    cases(strGen, 200).foreach { s =>
      val shuffled = new String(s.sorted.toArray)
      assert(h(s) === h(shuffled), s"permutation changed entropy for '$s'")
      val renamed = s.map(c => ('z' - (c - 'a')).toChar)
      assert(h(s) === h(renamed), s"renaming changed entropy for '$s'")
    }
  }

  test("law: rankByOrder is the unique order-isomorphism onto 0..N-1") {
    // random duplicate-heavy keys, random sizes, random shard counts —
    // batched into a handful of Spark jobs
    val caseGen = for {
      n <- Gen.chooseNum(1, 300)
      keyCard <- Gen.chooseNum(1, 20)
      shards <- Gen.oneOf(1, 3, 17, 64)
    } yield (n, keyCard, shards)
    cases(caseGen, 6).foreach { case (n, keyCard, shards) =>
      val df = (0 until n).map(i => (i.toLong, s"k${(i * 131) % keyCard}"))
        .toDF("id", "k")
      val got = SortedNeighborhood.rankByOrder(df, Seq("k", "id"), shards)
        .select($"k", $"id", $"snm_rank").as[(String, Long, Long)]
        .collect()
      // permutation of 0..N-1
      assert(got.map(_._3).sorted.toSeq == (0L until n.toLong))
      // order isomorphism: rank sorts exactly like (k, id)
      val byRank = got.sortBy(_._3).map(t => (t._1, t._2)).toSeq
      assert(byRank == got.map(t => (t._1, t._2)).sortBy(identity).toSeq,
        s"rank order diverged from key order (n=$n, shards=$shards)")
    }
  }

  test("law: set_contains_any ≡ arrays_overlap on random key sets") {
    val gArr = Gen.listOfN(8, Gen.chooseNum(0L, 40L))
    val gKeys = Gen.listOfN(6, Gen.chooseNum(0L, 40L))
    cases(Gen.zip(gArr, gKeys), 60).zipWithIndex.foreach {
      case ((arr, keys), i) =>
        val df = Seq(Tuple1(arr)).toDF("hs")
        val got = df.select(TextHashes.set_contains_any($"hs",
          keys.toArray).as("x")).head().getBoolean(0)
        val want = arr.exists(keys.toSet)
        assert(got === want, s"case $i: arr=$arr keys=$keys")
    }
    // empty array never matches; empty key set never matches
    val e = Seq(Tuple1(Seq.empty[Long])).toDF("hs")
    assert(!e.select(TextHashes.set_contains_any($"hs", Array(1L, 2L)).as("x"))
      .head().getBoolean(0))
    val f = Seq(Tuple1(Seq(1L, 2L))).toDF("hs")
    assert(!f.select(TextHashes.set_contains_any($"hs", Array.empty[Long]).as("x"))
      .head().getBoolean(0))
  }

  test("law: containment lies in (0,1] and shared ≤ min(n_src, n_dst)") {
    val wordGen = Gen.oneOf((1 to 12).map(i => s"w$i"))
    val docGen = Gen.chooseNum(6, 40).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val docs = cases(docGen, 24).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(docs, "doc_id", "text",
        w = 3, minContain = 0.01, dfCap = 64)
      .select($"src_id", $"dst_id", $"shared", $"n_src", $"n_dst", $"contain")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty, "fixture should produce at least one pair")
    rows.foreach { case (s, d, sh, ns, nd, c) =>
      assert(s != d)
      assert(sh >= 1 && sh <= math.min(ns, nd),
        s"shared $sh outside [1, min($ns,$nd)] for ($s,$d)")
      assert(c > 0.0 && c <= 1.0, s"containment $c out of range for ($s,$d)")
      // the emitted ratio IS shared/n_src (6 dp)
      assert(math.abs(c - sh.toDouble / ns) < 1e-6)
    }
  }
}
