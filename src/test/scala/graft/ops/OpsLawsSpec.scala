package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Semantic laws for the dimension/time-series operators, generated
  * under deterministic ScalaCheck seeds (cases drawn explicitly — the
  * scalatest↔scalacheck bridge isn't available offline). Each law
  * batches all generated rows into ONE Spark job.
  */
class OpsLawsSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int, seed: Long = 7L): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // a random change stream over few keys/attrs so runs and ties occur
  private val eventGen = for {
    k <- Gen.oneOf("a", "b", "c")
    ts <- Gen.chooseNum(1L, 40L)
    attr <- Gen.oneOf("x", "y", "z")
    seq <- Gen.chooseNum(1L, 1000000L) // tie-break for equal ts
  } yield (k, ts, attr, seq)

  /** One row per (k, ts, seq) so the (ts, seq) tie order is total. */
  private def dedupOrder(rows: Seq[(String, Long, String, Long)]) =
    rows.groupBy(t => (t._1, t._2, t._4)).map(_._2.head).toSeq

  test("law: SCD2 as-of lookup reproduces every input row's attribute") {
    val rows = dedupOrder(cases(eventGen, 300))
    val df = rows.toDF("k", "ts", "attr", "seq")
    val hist = Scd2.build(df, Seq("k"), "ts", Seq("attr"), tieCols = Seq("seq"))
    // the version whose [valid_from, valid_to) half-open interval
    // contains an input row's ts must carry that row's attribute —
    // for the LAST row of each (k, ts) under the (ts, seq) order
    // (earlier same-ts rows are transient within the interval bound)
    val lastPerTs = df.withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"k", $"ts")
          .orderBy($"seq".desc)))
      .filter($"__rn" === 1).drop("__rn")
    val joined = lastPerTs.alias("i").join(hist.alias("h"),
      $"i.k" === $"h.k" && $"i.ts" >= $"h.valid_from" &&
        ($"h.valid_to".isNull || $"i.ts" < $"h.valid_to"))
    // every input instant is covered by exactly one interval
    assert(joined.count() === lastPerTs.count())
    // and mismatching attributes can only arise from same-ts ties
    // where a later seq overwrote within the instant — excluded above,
    // so the covering version's attr must equal the row's attr OR the
    // instant held several seqs and the interval carries the LAST one
    val mismatch = joined.filter($"i.attr" =!= $"h.attr")
      .join(df.groupBy($"k".as("mk"), $"ts".as("mts"))
          .agg(countDistinct($"attr").as("na")),
        $"i.k" === $"mk" && $"i.ts" === $"mts")
      .filter($"na" === 1)
    assert(mismatch.count() === 0)
  }

  test("law: SCD2 intervals chain without gaps or overlap per key") {
    val rows = dedupOrder(cases(eventGen, 300))
    val hist = Scd2.build(rows.toDF("k", "ts", "attr", "seq"),
      Seq("k"), "ts", Seq("attr"), tieCols = Seq("seq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"version")
    val chained = hist.withColumn("__next_from", lead($"valid_from", 1).over(w))
    // valid_to equals the next version's valid_from (NULL only on last)
    assert(chained.filter(
      ($"__next_from".isNotNull && !($"valid_to" <=> $"__next_from")) ||
        ($"__next_from".isNull && $"valid_to".isNotNull)).count() === 0)
    // versions are dense from 1
    val dense = hist.groupBy($"k")
      .agg(count(lit(1)).as("n"), max($"version").as("mx"), min($"version").as("mn"))
    assert(dense.filter($"mx" =!= $"n" || $"mn" =!= 1).count() === 0)
  }

  private val obsGen = for {
    k <- Gen.oneOf("k1", "k2", "k3", "k4")
    h <- Gen.chooseNum(0, 120)
    v <- Gen.chooseNum(-1000, 1000)
  } yield (k, h, v)

  test("law: gap fill covers each key's span exactly, observed cells exact") {
    val rows = cases(obsGen, 400)
    val df = rows.map { case (k, h, v) =>
      (k, java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime +
        h * 3600000L, v)
    }.toDF("k", "ms", "v")
      .select($"k", ($"ms" / 1000).cast("timestamp").as("t"), $"v")
    val out = GapFill.fill(df, Seq("k"), date_trunc("hour", $"t"),
      "interval 1 hour", Seq("v_sum" -> sum($"v")))
    // row count per key = span hours (dense grid, no extras)
    val spans = df.groupBy($"k").agg(
      ((max(unix_timestamp(date_trunc("hour", $"t"))) -
        min(unix_timestamp(date_trunc("hour", $"t")))) / 3600 + 1).as("expect"))
    val got = out.groupBy($"k").agg(count(lit(1)).as("got"))
    assert(spans.join(got, "k").filter($"expect" =!= $"got").count() === 0)
    // observed buckets keep their exact aggregate; empty ones are 0-count
    val exact = df.groupBy($"k", date_trunc("hour", $"t").as("bucket"))
      .agg(sum($"v").as("expect_sum"), count(lit(1)).as("expect_n"))
    val cmp = out.join(exact, Seq("k", "bucket"), "left")
    assert(cmp.filter($"expect_sum".isNotNull &&
      ($"v_sum" =!= $"expect_sum" || $"n_obs" =!= $"expect_n")).count() === 0)
    assert(cmp.filter($"expect_sum".isNull &&
      ($"n_obs" =!= 0 || $"v_sum".isNotNull)).count() === 0)
  }

  test("law: forward-filled value equals the most recent observed aggregate") {
    val rows = cases(obsGen, 200)
    val df = rows.map { case (k, h, v) =>
      (k, java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime +
        h * 3600000L, v)
    }.toDF("k", "ms", "v")
      .select($"k", ($"ms" / 1000).cast("timestamp").as("t"), $"v")
    val out = GapFill.fill(df, Seq("k"), date_trunc("hour", $"t"),
      "interval 1 hour", Seq("v_sum" -> sum($"v")))
    // reference: join each grid row to the latest observed bucket <= it
    val obs = df.groupBy($"k".as("ok"), date_trunc("hour", $"t").as("ob"))
      .agg(sum($"v").as("ov"))
    val latest = out.alias("g").join(obs,
        $"g.k" === $"ok" && $"ob" <= $"g.bucket")
      .groupBy($"g.k", $"g.bucket", $"g.v_sum_fill")
      .agg(max_by($"ov", $"ob").as("expect"))
    assert(latest.filter(!($"v_sum_fill" <=> $"expect")).count() === 0)
  }

  private val factGen = for {
    k <- Gen.oneOf("a", "b", "c", "d")
    v <- Gen.chooseNum(-500L, 500L)
    part <- Gen.chooseNum(0, 3) // which delta batch the row lands in
  } yield (k, v, part)

  test("law: incremental merge over any split equals the full recompute") {
    val rows = cases(factGen, 400)
    val df = rows.toDF("k", "v", "part")
    def agg(d: org.apache.spark.sql.DataFrame) = d.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"),
        min($"v").as("mn"), max($"v").as("mx"))
    val full = agg(df.drop("part")).as[(String, Long, Long, Long, Long)]
      .collect().toSet
    // fold the four delta batches through merge in sequence
    // (associativity: (((b0 + b1) + b2) + b3) must equal the onepass)
    val batches = (0 to 3).map(p => agg(df.filter($"part" === p).drop("part")))
    val merged = batches.reduce((a, b) => IncrementalAgg.merge(
      a, b, Seq("k"), Seq("n", "s"), Seq("mn"), Seq("mx")))
    assert(merged.as[(String, Long, Long, Long, Long)].collect().toSet === full)
  }

  test("law: merging an empty delta is the identity") {
    val df = Seq(("a", 1L), ("b", 5L)).toDF("k", "v")
    def agg(d: org.apache.spark.sql.DataFrame) = d.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val base = agg(df)
    val merged = IncrementalAgg.merge(base, agg(df.limit(0)),
      Seq("k"), Seq("n", "s"))
    assert(merged.as[(String, Long, Long)].collect().toSet ===
      base.as[(String, Long, Long)].collect().toSet)
  }

  test("law: negative sampling is deterministic, count-bounded, self-free") {
    val df = (1L to 200L).map(k => (k, s"doc$k")).toDF("id", "payload")
    val a = Sampling.negativeSample(df, "id", k = 3, poolSize = 40)
      .as[(Long, Long, Long)].collect().toSet
    val b = Sampling.negativeSample(df, "id", k = 3, poolSize = 40)
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b) // pure function of the data
    // the pool is the poolSize keys with the smallest hash coordinates
    val pool = df.select($"id")
      .orderBy(Sampling.coordinate($"id"), $"id").limit(40)
      .as[Long].collect().toSet
    assert(pool.size === 40) // capped by COUNT, not a corpus fraction
    assert(a.map(_._3).subsetOf(pool)) // partners come from the pool
    assert(a.forall(t => t._1 != t._3)) // no self pairs
    // every key yields k picks minus its (rare) self-collisions
    val perKey = a.groupBy(_._1).view.mapValues(_.size)
    assert(perKey.values.forall(n => n >= 1 && n <= 3))
    assert(a.map(t => (t._1, t._2)).size === a.size) // (key, idx) unique
  }

  test("law: negative sampling has no Window node in its plan") {
    val df = (1L to 200L).map(k => (k, s"doc$k")).toDF("id", "payload")
    val plan = Sampling.negativeSample(df, "id", k = 2, poolSize = 40)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"negative sampling must not build a global window index:\n$plan")
  }

  test("law: group sample equals the window formulation at every n") {
    val df = (1L to 500L).map(k => (k, s"g${k % 7}")).toDF("id", "grp")
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(1, 4, 16)) {
      val agg = Sampling.groupSample(df.select($"id", $"grp"), "id",
        Seq("grp"), n).as[(String, Long, Long)].collect().toSet
      val win = df
        .withColumn("hv", graft.text.TextAnalysis.hash60($"id".cast("string")))
        .withColumn("rnk", row_number().over(
          Window.partitionBy($"grp").orderBy($"hv".desc, $"id".asc)))
        .filter($"rnk" <= n)
        .select($"grp", $"rnk".cast("long"), $"id")
        .as[(String, Long, Long)].collect().toSet
      assert(agg === win, s"aggregate ≠ window at n=$n")
    }
  }

  test("law: group sample has bounded churn under corpus growth") {
    val df = (1L to 500L).map(k => (k, s"g${k % 7}")).toDF("id", "grp")
    val full = Sampling.groupSample(df, "id", Seq("grp"), 8)
      .as[(String, Long, Long)].collect()
    val sub = Sampling.groupSample(df.filter($"id" <= 250L), "id",
      Seq("grp"), 8).as[(String, Long, Long)].collect()
    // the subset's sample per group = full sample restricted to the
    // subset's keys, topped up from the next-highest hashes — so every
    // full-sample member whose key survives the cut stays sampled
    val fullKept = full.filter(_._3 <= 250L).map(t => (t._1, t._3)).toSet
    assert(fullKept.subsetOf(sub.map(t => (t._1, t._3)).toSet))
    // and there is no Window/SinglePartition in the aggregate's plan
    val plan = Sampling.groupSample(df, "id", Seq("grp"), 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("SinglePartition"))
  }

  test("law: shuffle shards is a deterministic permutation with stable membership") {
    val df = (1L to 300L).map(k => (k, s"doc$k")).toDF("id", "payload")
    val a = Sampling.shuffleShards(df, "id", numShards = 8)
      .select($"id", $"shard", $"shard_pos")
      .as[(Long, Int, Long)].collect()
    // permutation: every row kept, (shard, pos) unique, positions dense 1..n
    assert(a.length === 300)
    assert(a.map(t => (t._2, t._3)).distinct.length === 300)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // both hashes actually spread: >1 shard, and within a shard the
    // id order differs from the position order (it IS shuffled)
    assert(a.map(_._2).distinct.length > 1)
    val someShard = a.groupBy(_._2).values.maxBy(_.length)
    assert(someShard.sortBy(_._3).map(_._1).toSeq !=
      someShard.map(_._1).sorted.toSeq)
    // determinism + shard membership stable under corpus growth
    // (positions may shift — membership must not)
    val b = Sampling.shuffleShards(df, "id", numShards = 8)
      .select($"id", $"shard", $"shard_pos").as[(Long, Int, Long)].collect()
    assert(a.toSet === b.toSet)
    val grown = (1L to 400L).map(k => (k, s"doc$k")).toDF("id", "payload")
    val g = Sampling.shuffleShards(grown, "id", numShards = 8)
      .select($"id", $"shard").as[(Long, Int)].collect().toMap
    assert(a.forall(t => g(t._1) == t._2))
  }

  test("law: dense ids are a 0..N-1 permutation ordered like the shards") {
    val df = (1L to 700L).map(k => (k, s"doc$k")).toDF("id", "payload")
    val out = Sampling.assignDenseIds(df, "id", numShards = 8)
      .select($"id", $"shard", $"shard_pos", $"dense_id")
      .as[(Long, Int, Long, Long)].collect()
    assert(out.length === 700)
    assert(out.map(_._4).sorted.toSeq === (0L until 700L)) // exact 0..N-1
    // id order refines (shard, shard_pos) order
    val sorted = out.sortBy(_._4)
    assert(sorted.map(t => (t._2, t._3)).toSeq ===
      sorted.map(t => (t._2, t._3)).sortBy(identity).toSeq)
    // deterministic across re-runs
    val again = Sampling.assignDenseIds(df, "id", numShards = 8)
      .select($"id", $"dense_id").as[(Long, Long)].collect().toMap
    assert(out.forall(t => again(t._1) === t._4))
    // no global window: every Window node in the plan is shard-keyed
    val plan = Sampling.assignDenseIds(df, "id", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global exchange:\n$plan")
  }

  test("law: rendezvous sharding moves ONLY keys won by a topology change") {
    val df = (1L to 1000L).map(k => (k, s"doc$k")).toDF("id", "payload")
    val s4 = Seq("a", "b", "c", "d")
    def route(shards: Seq[String]) = Sampling.rendezvousShard(df, "id", shards)
      .select($"id", $"shard").as[(Long, String)].collect().toMap
    val before = route(s4)
    assert(before.values.toSet.subsetOf(s4.toSet))
    // every shard actually receives keys, and determinism holds
    assert(before.values.toSet.size === 4)
    assert(route(s4) === before)
    // ADD a shard: the minimal-movement law — a key either keeps its
    // assignment or moves to the NEW shard; nothing reshuffles between
    // the surviving shards (modulo routing would move ~4/5 of keys)
    val after = route(s4 :+ "e")
    val moved = before.keys.filter(k => after(k) != before(k)).toSeq
    assert(moved.nonEmpty && moved.forall(k => after(k) == "e"))
    val frac = moved.size.toDouble / before.size
    assert(frac > 0.1 && frac < 0.35, s"moved fraction $frac, expected ~1/5")
    // REMOVE a shard: only its keys move, redistributed to survivors
    val dropped = route(s4.init)
    before.foreach { case (k, s0) =>
      if (s0 != "d") assert(dropped(k) === s0, s"key $k moved without cause")
      else assert(dropped(k) != "d")
    }
  }

  test("law: negative sampling dedupes a duplicate-key probe side") {
    val unique = (1L to 100L).map(k => (k, s"doc$k")).toDF("id", "payload")
    val dup = unique.unionAll(unique.filter($"id" % 3 === 0))
    val a = Sampling.negativeSample(unique, "id", k = 2, poolSize = 20)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val b = Sampling.negativeSample(dup, "id", k = 2, poolSize = 20)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a === b) // no fan-out per input copy — matches the oracle's DISTINCT
  }

  test("law: snapshot diff statuses partition the key universe") {
    val keyGen = Gen.chooseNum(1L, 400L)
    val oldKeys = cases(keyGen, 250, seed = 11L).distinct
    val curKeys = cases(keyGen, 250, seed = 99L).distinct
    val old = oldKeys.map(k => (k, s"text-${k % 7}")).toDF("k", "text")
    val cur = curKeys.map(k => (k, s"text-${k % 5}")).toDF("k", "text")
    val out = SnapshotDiff.diff(old, cur, Seq("k"), md5($"text"))
      .as[(Long, String)].collect().toMap
    assert(out.keySet === (oldKeys ++ curKeys).toSet)
    val oldSet = oldKeys.toSet
    val curSet = curKeys.toSet
    out.foreach { case (k, st) =>
      val expect =
        if (!oldSet(k)) "added"
        else if (!curSet(k)) "removed"
        else if (k % 7 == k % 5) "unchanged" // same text both sides
        else "changed"
      assert(st === expect, s"key $k")
    }
  }
}
