package graft.cleanse

import graft.SparkSpec
import graft.functions.ToNumber
import graft.ops.HierarchyRollup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The SURVEY §5 property laws for the cleansing/parse layer and the
  * rollup, generated with ScalaCheck under deterministic seeds (the
  * scalatest↔scalacheck integration artifact isn't available offline,
  * so cases are drawn explicitly). Pure-JVM laws (ToNumber.parse)
  * check hundreds of cases; Spark-evaluated laws batch generated cases
  * into one job each (a session per case would dominate runtime).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Draw n deterministic samples from a generator. */
  private def cases[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // ------------------------------------------------ to_number ∘ format = id
  test("law: to_number parses any comma-grouped formatted decimal back") {
    val centsGen = Gen.chooseNum(-999999999999L, 999999999999L)
    cases(centsGen, 500).foreach { c =>
      val value = BigDecimal(c, 2)
      val s = String.format(java.util.Locale.US, "%,.2f", value.bigDecimal)
      val parsed = ToNumber.parse(UTF8String.fromString(s), 18, 2)
      assert(parsed != null, s"failed to parse '$s'")
      assert(BigDecimal(parsed.toJavaBigDecimal) == value, s"'$s' → $parsed ≠ $value")
    }
  }

  test("law: to_number rejects sentinels and junk (never throws, yields null)") {
    val junkGen = Gen.oneOf("(D)", "(Z)", "", "abc", "1.2.3", "--5", "1,2,3a",
      "NaN", "1 2", "+-1", ".", "-")
    cases(junkGen, 100).foreach { s =>
      assert(ToNumber.parse(UTF8String.fromString(s), 18, 2) == null, s"'$s'")
    }
  }

  // ------------------------------------------- location derivation is total
  test("law: locationOf is total and prefix-stable over generated code triples") {
    val codeGen = Gen.oneOf(Gen.const(null: String), Gen.const(""),
      Gen.chooseNum(1, 999).map(_.toString))
    val tripleGen = Gen.zip(
      Gen.chooseNum(1, 99).map(n => f"$n%02d"), codeGen, codeGen)
    val triples = cases(tripleGen, 400)
    val out = triples.toDF("state", "asd", "county")
      .select(col("state"),
        Cleanse.locationOf(col("state"), col("asd"), col("county")).as("loc"))
      .as[(String, String)].collect()
    assert(out.length === 400)
    // total: never null; prefix-stable: always starts with the state fips
    assert(out.forall { case (st, loc) => loc != null && loc.startsWith(st) })
    // all three branch shapes appear in the generated corpus
    val shapes = triples.map { case (_, asd, county) =>
      (county != null && county.nonEmpty, asd != null && asd.nonEmpty)
    }.toSet
    assert(shapes.size >= 3)
  }

  // --------------------------------------------- rollup conservation (SUM)
  test("law: SumMode rollup conserves leaf mass at the synthesized root") {
    val forestGen = for {
      n <- Gen.chooseNum(1, 25)
      paths <- Gen.listOfN(n,
        Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d")).map(_.take(3)))
      cents <- Gen.listOfN(n, Gen.chooseNum(1L, 100000L))
    } yield paths.map(_.mkString("/")).zip(cents).distinctBy(_._1)
    cases(forestGen, 8, seed = 7L).filter(_.nonEmpty).foreach { leaves =>
      val df = leaves.toDF("pathStr", "cents")
        .select(split(col("pathStr"), "/").as("path"),
          (col("cents").cast(DecimalType(18, 0)) / 100)
            .cast(DecimalType(18, 2)).as("m"))
      // crossRoundDedup=false: the PG recursive-UNION dedup collapses
      // identical (path, value) rows — a FIDELITY behavior that breaks
      // mass conservation exactly when a synthesized parent collides
      // with a leaf; the conservation law is stated for the plain
      // additive rollup
      val rolled = HierarchyRollup.rollup(
        df, Seq.empty, "path", Seq("m"), HierarchyRollup.SumMode,
        crossRoundDedup = false)
      val rootMass = rolled.filter(size(col("path")) === 0)
        .select(sum(col("m"))).head().getDecimal(0)
      val leafMass = df.select(sum(col("m"))).head().getDecimal(0)
      assert(rootMass != null && rootMass.compareTo(leafMass) == 0,
        s"root $rootMass ≠ leaves $leafMass")
      graft.CacheRegistry.releaseAll()
    }
  }

  // --------------------------------- packing partitions the token stream
  test("law: pack spans tile each shard's token stream exactly") {
    val rowGen = Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0, 300))
    val rows = cases(rowGen, 300).zipWithIndex.map { case ((sh, n), i) =>
      (i.toLong, s"shard$sh", n)
    }
    val out = graft.ops.Packing.packSequences(
      rows.toDF("id", "shard", "n_tokens"), "shard", "id", "n_tokens", 128)
      .select(col("shard"), col("id"), col("n_tokens"),
        col("start_tok"), col("end_tok"), col("pack_first"), col("pack_last"))
      .as[(String, Long, Int, Long, Long, Long, Long)].collect()
    out.groupBy(_._1).values.foreach { shard =>
      val sorted = shard.sortBy(_._2)
      // spans are contiguous from 0 and cover the shard's total exactly
      var expect = 0L
      sorted.foreach { case (_, _, n, s0, e0, pf, pl) =>
        assert(s0 === expect && e0 === s0 + n)
        assert(pf === s0 / 128)
        assert(pl === math.max(e0 - 1, s0) / 128)
        expect = e0
      }
    }
  }

  // --------------------------------- domain mix: subset + monotone rates
  test("law: domainMix output is a deterministic subset honoring rate order") {
    import graft.ops.Sampling
    val rows = cases(Gen.chooseNum(0, 5), 600).zipWithIndex.map {
      case (s, i) => (i.toLong, s"s$s")
    }
    val df = rows.toDF("id", "src")
    val targets = Seq("s0" -> 0.5, "s1" -> 0.3, "s2" -> 0.2)
    val kept = Sampling.domainMix(df, "id", "src", targets)
      .as[(Long, String)].collect().toSet
    // subset of the input, only targeted sources
    assert(kept.subsetOf(rows.toSet))
    assert(kept.forall(r => targets.exists(_._1 == r._2)))
    // output schema is exactly the input schema (no leaked columns)
    assert(Sampling.domainMix(df, "id", "src", targets).columns.toSeq ===
      Seq("id", "src"))
    // determinism
    val again = Sampling.domainMix(df, "id", "src", targets)
      .as[(Long, String)].collect().toSet
    assert(again === kept)
  }

  test("law: temperatureMix flattens toward uniform and keeps the smallest source whole") {
    import graft.ops.Sampling
    // skewed corpus: 400 / 100 / 25 rows across three sources
    val rows = ((0 until 400).map(i => (i.toLong, "big")) ++
      (400 until 500).map(i => (i.toLong, "mid")) ++
      (500 until 525).map(i => (i.toLong, "rare")))
    val df = rows.toDF("id", "src")
    val kept = Sampling.temperatureMix(df, "id", "src",
      Seq("big", "mid", "rare"))
      .as[(Long, String)].collect()
    val by = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // the scale-constraining (smallest-√n-feasibility) source is kept
    // at rate 1 — here that is every source's sqrt ratio vs rare's:
    // rate_i = √25/√n_i · √n_i/√n_i… concretely rate_rare = 1
    assert(by("rare") == 25)
    // flattening: kept shares are ∝ √n, so big/rare ratio compresses
    // from 16× to ~4× (hash-sampling noise allowed)
    val ratio = by("big").toDouble / by("rare")
    assert(ratio > 2.0 && ratio < 6.0, s"big/rare kept ratio $ratio")
    // kept counts never exceed originals and subset holds
    assert(kept.toSet.subsetOf(rows.toSet))
    // determinism
    val again = Sampling.temperatureMix(df, "id", "src",
      Seq("big", "mid", "rare")).as[(Long, String)].collect()
    assert(again.toSet == kept.toSet)
  }

  test("law: temperatureMix at general α replays the fixture rate arithmetic") {
    import graft.ops.Sampling
    // same skewed corpus; α = 0.3 flattens harder than √ (α = 0.5)
    val rows = ((0 until 400).map(i => (i.toLong, "big")) ++
      (400 until 500).map(i => (i.toLong, "mid")) ++
      (500 until 525).map(i => (i.toLong, "rare")))
    val df = rows.toDF("id", "src")
    val srcs = Seq("big", "mid", "rare")
    val kept = Sampling.temperatureMix(df, "id", "src", srcs, alpha = 0.3)
      .as[(Long, String)].collect().toSet
    // fixture replay: derive the α=0.3 rates independently (the same
    // IEEE op order the operator documents) and apply them through the
    // public coordinate filter — the two paths must agree row-for-row
    val counts = Map("big" -> 400L, "mid" -> 100L, "rare" -> 25L)
    val t = srcs.map(s => s -> math.pow(counts(s).toDouble, 0.3))
    val scale = t.map { case (s, ti) => counts(s).toDouble / ti }.min
    val rates = t.map { case (s, ti) =>
      s -> math.min(1.0, ti * scale / counts(s).toDouble) }.toMap
    val expected = srcs.flatMap { s =>
      val rate = rates(s)
      df.filter($"src" === s)
        .filter(Sampling.coordinate($"id") < rate)
        .as[(Long, String)].collect()
    }.toSet
    assert(kept === expected)
    // harder flattening than α=0.5: big/rare kept ratio compresses more
    val by = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(by("rare") == 25) // binding source still kept whole
    val r03 = by("big").toDouble / by("rare")
    val r05 = Sampling.temperatureMix(df, "id", "src", srcs)
      .as[(Long, String)].collect().groupBy(_._2).view.mapValues(_.length)
      .toMap match { case m => m("big").toDouble / m("rare") }
    assert(r03 < r05, s"alpha=0.3 ratio $r03 should flatten below alpha=0.5's $r05")
    // determinism across re-runs (within-JVM pow contract)
    val again = Sampling.temperatureMix(df, "id", "src", srcs, alpha = 0.3)
      .as[(Long, String)].collect().toSet
    assert(again === kept)
  }

  test("law: zValue is a bijection on the 8-bit grid and quadrant-monotone") {
    import graft.ops.ZOrder
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
    val zs = grid.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    // distinct coordinates → distinct z (interleave loses no bits)
    assert(zs.map(_._3).distinct.length === grid.length)
    // the high interleaved bit dominates: every z in the (x<8, y<8)
    // quadrant sorts before every z with x≥8 or y≥8
    val lowQ = zs.filter(t => t._1 < 8 && t._2 < 8).map(_._3).max
    val rest = zs.filter(t => t._1 >= 8 || t._2 >= 8).map(_._3).min
    assert(lowQ < rest)
  }

  test("law: span profile counts are bounded and exhaustive") {
    import graft.dedup.Dedup
    val wordGen = Gen.oneOf("a", "b", "c", "d", "e")
    val docGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    val docs = cases(docGen, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Dedup.spanProfile(docs, "doc_id", "text", w = 3, minDocs = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length === 120)                         // every doc survives
    out.foreach { case (_, nSpans, nDup, frac) =>
      assert(nDup >= 0 && nDup <= nSpans)              // dup ⊆ spans
      assert(frac >= 0.0 && frac <= 1.0)
      if (nSpans > 0)
        assert(math.abs(frac - math.rint(nDup.toDouble / nSpans * 1e6) / 1e6) < 1e-9)
      else assert(frac === 0.0)
    }
  }

  test("law: unigram-LM scores are non-positive and vocabulary-consistent") {
    import graft.text.UnigramLm
    val wordGen = Gen.oneOf("u", "v", "w", "x")
    val docGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))
    val docs = cases(docGen, 100).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = UnigramLm.score(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(out.length === 100)
    out.foreach { case (_, n, s) =>
      assert(n === 8L)
      assert(s <= 0.0)                              // log-probs never positive
      assert(s >= math.log(1.0 / 800) - 1e-6)       // min token prob ≥ 1/total
    }
  }
}
