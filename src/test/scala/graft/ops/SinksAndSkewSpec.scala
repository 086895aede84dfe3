package graft.ops

import graft.SparkSpec
import graft.sources.ParquetSink
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksAndSkewSpec extends SparkSpec {
  import spark.implicits._

  test("overwritePartitions replaces only the partitions present") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val v1 = Seq((2012, "16", 1L), (2012, "30", 2L), (2013, "16", 3L))
      .toDF("year", "state", "v")
    ParquetSink.overwritePartitions(v1, dir, Seq("year", "state"))
    // re-pull of (2012,16) only, with a corrected value
    val v2 = Seq((2012, "16", 99L)).toDF("year", "state", "v")
    ParquetSink.overwritePartitions(v2, dir, Seq("year", "state"))
    val out = spark.read.parquet(dir)
      .select($"year", $"state", $"v").as[(Int, String, Long)]
      .collect().toSet
    assert(out === Set((2012, "16", 99L), (2012, "30", 2L), (2013, "16", 3L)))
  }

  test("compaction shrinks file counts, preserves content and partitions") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val rows = (1 to 4000).map(i => (i % 2, i.toLong, s"payload-$i"))
      .toDF("year", "id", "v")
    // 32 writer tasks × 2 partition values → many small files
    rows.repartition(32).write.mode("overwrite").partitionBy("year").parquet(dir)
    val before = spark.read.parquet(dir).collect().toSet
    val (nBefore, nAfter) = ParquetSink.compact(
      spark, dir, Seq("year"), targetBytes = 8L * 1024 * 1024)
    assert(nBefore > 8, s"fixture produced only $nBefore files")
    assert(nAfter === 2, s"compaction left $nAfter files") // 1 per partition
    val after = spark.read.parquet(dir)
    assert(after.collect().toSet === before) // layout-only rewrite
    // partition layout preserved on disk: one data file per year dir
    def dataFiles(d: String) = new java.io.File(d).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(dataFiles(s"$dir/year=0") === 1 && dataFiles(s"$dir/year=1") === 1)
    // idempotent: recompacting an already-compact table is a no-op shape
    val (_, nAgain) = ParquetSink.compact(
      spark, dir, Seq("year"), targetBytes = 8L * 1024 * 1024)
    assert(nAgain === 2)
    // unpartitioned path too
    val dir2 = Files.createTempDirectory("graft-compact2").toString
    rows.repartition(16).write.mode("overwrite").parquet(dir2)
    val (b2, a2) = ParquetSink.compact(spark, dir2, Seq.empty,
      8L * 1024 * 1024)
    assert(b2 === 16 && a2 === 1)
    // (partitioned reads order the partition column last — align)
    assert(spark.read.parquet(dir2).select($"id", $"v", $"year")
      .collect().toSet ===
      spark.read.parquet(dir).select($"id", $"v", $"year").collect().toSet)
  }

  test("compaction preserves string partition values and schema exactly") {
    // the classic inference trap: a STRING partition value '01' would
    // re-infer as int 1 and rewrite the directory as year=1 — the
    // inference-off rewrite read + schema gate must keep it '01'
    val dir = Files.createTempDirectory("graft-compact-str").toString
    val rows = (1 to 2000).map(i => (if (i % 2 == 0) "01" else "02",
      i.toLong, s"p-$i")).toDF("code", "id", "v")
    rows.repartition(16).write.mode("overwrite").partitionBy("code").parquet(dir)
    val beforeSchema = spark.read.parquet(dir).schema
      .map(f => (f.name, f.dataType))
    val before = spark.read.parquet(dir).collect().toSet
    val (_, nAfter) = ParquetSink.compact(
      spark, dir, Seq("code"), targetBytes = 8L * 1024 * 1024,
      keepBackup = true)
    assert(nAfter === 2)
    // directory names byte-identical — '01' did NOT become '1'
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs === Set("code=01", "code=02"), s"directories drifted: $dirs")
    // a reader sees the identical schema and content
    val after = spark.read.parquet(dir)
    assert(after.schema.map(f => (f.name, f.dataType)) === beforeSchema)
    assert(after.collect().toSet === before)
    // keepBackup retained the rollback copy alongside
    val bak = new java.io.File(dir.stripSuffix("/") + "__compact_old")
    assert(bak.isDirectory, "keepBackup=true must retain the backup")
    assert(spark.read.parquet(bak.toString).count() === 2000)
  }

  test("deterministic split: stable membership, correct proportions") {
    val df = (1 to 10000).map(i => (s"doc-$i", i)).toDF("key", "v")
    val split = Sampling.deterministicSplit(df, "key",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 8000.0) / 8000 < 0.05)
    assert(math.abs(counts("val") - 1000.0) / 1000 < 0.2)
    // membership is a pure function of the key: a subset of the corpus
    // assigns identically (growing data never reshuffles old rows)
    val subset = Sampling.deterministicSplit(
      df.filter($"v" <= 5000), "key",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"key", $"split")
    val joined = split.select($"key", $"split".as("full_split"))
      .join(subset, Seq("key"))
    assert(joined.filter($"full_split" =!= $"split").count() === 0)
    // deterministic fraction sample is the train prefix of the same hash
    assert(Sampling.sampleFraction(df, "key", 0.8).count() === counts("train"))
  }

  test("stratified sampling applies per-stratum keep rates") {
    val df = (1 to 6000).map(i =>
      (s"doc-$i", if (i % 3 == 0) "books" else "web")).toDF("key", "src")
    val kept = Sampling.stratifiedSample(df, "key", "src",
      Map("web" -> 0.1, "books" -> 1.0))
    val bySrc = kept.groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(bySrc("books") === 2000L)                    // keep-all stratum intact
    assert(math.abs(bySrc("web") - 400.0) / 400 < 0.25) // ~10% of 4000
    // membership ⊆ the global fraction sample at the same rate
    val web10 = Sampling.sampleFraction(df.filter($"src" === "web"), "key", 0.1)
    assert(kept.filter($"src" === "web").exceptAll(web10).isEmpty)
  }

  test("weighted sampling keeps rows in proportion to their own weight") {
    val df = (1 to 9000).map { i =>
      val w = (i % 3) match {
        case 0 => 0.0   // never survives
        case 1 => 1.0   // always survives (u < 1 for every hash)
        case 2 => 0.5
      }
      (s"doc-$i", w)
    }.toDF("key", "w")
    val kept = Sampling.weightedSample(df, "key", "w")
      .groupBy($"w").count().as[(Double, Long)].collect().toMap
    assert(!kept.contains(0.0))                      // zero weight drops all
    assert(kept(1.0) === 3000L)                      // full weight keeps all
    assert(math.abs(kept(0.5) - 1500.0) / 1500 < 0.15)
    // weights clamp: >1 behaves as 1, negative as 0; NULL drops
    val edge = Seq(("a", Some(5.0)), ("b", Some(-2.0)), ("c", Option.empty[Double]))
      .toDF("key", "w")
    val ek = Sampling.weightedSample(edge, "key", "w")
      .select($"key").as[String].collect().toSet
    assert(ek === Set("a"))
    // determinism: a re-run selects the identical row set
    val again = Sampling.weightedSample(df, "key", "w")
    assert(Sampling.weightedSample(df, "key", "w")
      .exceptAll(again).isEmpty && again.exceptAll(
        Sampling.weightedSample(df, "key", "w")).isEmpty)
    // monotonicity law: raising every weight never drops a kept row
    // (u < w ⇒ u < w + 0.3) — the property that makes weight sweeps
    // nested, like sampleFraction's prefix property
    val bumped = Sampling.weightedSample(
      df.withColumn("w", least(lit(1.0), $"w" + 0.3)), "key", "w")
    assert(Sampling.weightedSample(df, "key", "w").select($"key")
      .exceptAll(bumped.select($"key")).isEmpty)
  }

  test("as-of join attaches the latest right row at or before each left ts") {
    def t(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val left = Seq((1L, 100L, t(5)), (1L, 101L, t(10)), (1L, 102L, t(2)),
      (2L, 200L, t(7))).toDF("user_id", "event_id", "ts")
    val right = Seq((1L, t(3), 30.0), (1L, t(10), 99.0), (3L, t(1), 7.0))
      .toDF("user_id", "ts", "pv")
    val out = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "ts", Seq("pv"))
      .select($"event_id", $"asof_pv").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(100L) === Some(30.0))  // latest ≤ t5 is t3
    assert(out(101L) === Some(99.0))  // equal ts matches (inclusive)
    assert(out(102L) === None)        // nothing at or before t2
    assert(out(200L) === None)        // user 2 has no right rows at all
  }

  test("range join matches boundary semantics: lo inclusive, hi exclusive") {
    val points = Seq(0.0, 9.99, 10.0, 24.9, 25.0, 50.9, 51.0, -1.0)
      .toDF("v")
    val bands = Seq(("low", 0, 10), ("mid", 10, 25), ("high", 25, 51))
      .toDF("band", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, bands, "v", "lo", "hi", g = 10.0)
      .select($"v", $"band").as[(Double, String)].collect().toMap
    assert(out === Map(0.0 -> "low", 9.99 -> "low", 10.0 -> "mid",
      24.9 -> "mid", 25.0 -> "high", 50.9 -> "high"))
    // 51.0 (== hi, exclusive) and -1.0 (below all) match nothing
  }

  test("bloom-equipped parquet carries row-group filters; reads stay exact") {
    import graft.sources.ParquetSink
    val dir = Files.createTempDirectory("graft-bloomw").toString
    val df = (1L to 50000L).map(i => (i * 2654435761L % 1000003L, s"p$i"))
      .toDF("key", "payload")
    ParquetSink.writeWithBloom(df, dir, Seq("key"), ndv = 60000L)
    // footer metadata: the key column chunk really has a bloom filter
    val conf = spark.sparkContext.hadoopConfiguration
    val file = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf))
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns
      val byName = (0 until cols.size()).map(i => cols.get(i))
        .map(c => c.getPath.toDotString -> c).toMap
      assert(byName("key").getBloomFilterOffset > 0,
        "key column must carry a bloom filter")
      assert(byName("payload").getBloomFilterOffset <= 0,
        "unnamed columns must not pay for one")
      // and the filter actually answers membership for a key that is
      // IN THIS file (multi-partition writes spread rows over files)
      val bf = reader.getBloomFilterDataReader(
        reader.getFooter.getBlocks.get(0)).readBloomFilter(byName("key"))
      val probe = spark.read.parquet(file.getAbsolutePath)
        .select($"key").as[Long].head()
      assert(bf.findHash(bf.hash(java.lang.Long.valueOf(probe))))
    } finally reader.close()
    // reads with point predicates remain exact
    val want = df.filter($"key" === 42L).count()
    assert(spark.read.parquet(dir).filter($"key" === 42L).count() === want)
  }

  test("interval-overlap join equals the theta join, emits each pair once") {
    val rnd = new scala.util.Random(11)
    val a = (1 to 300).map { i =>
      val lo = rnd.nextDouble() * 100
      (i % 5, i.toLong, lo, lo + rnd.nextDouble() * 30) // long intervals
    }.toDF("k", "a_id", "a_lo", "a_hi")
    val b = (1 to 300).map { i =>
      val lo = rnd.nextDouble() * 100
      (i % 5, i.toLong, lo, lo + rnd.nextDouble() * 3) // short intervals
    }.toDF("k", "b_id", "b_lo", "b_hi")
    val grid = RangeJoin.intervalOverlap(a, b,
      "a_lo", "a_hi", "b_lo", "b_hi", g = 4.0, keys = Seq("k"))
      .select($"k", $"a_id", $"b_id")
    val pairs = grid.as[(Int, Long, Long)].collect()
    // emit-once even though long intervals co-occupy many cells
    assert(pairs.length === pairs.distinct.length)
    val theta = a.join(b, Seq("k"))
      .filter($"a_lo" < $"b_hi" && $"b_lo" < $"a_hi")
      .select($"k", $"a_id", $"b_id").as[(Int, Long, Long)].collect()
    assert(pairs.toSet === theta.toSet)
    // boundary: touching intervals [0,1) and [1,2) do NOT overlap
    val ta = Seq((1, 1L, 0.0, 1.0)).toDF("k", "a_id", "a_lo", "a_hi")
    val tb = Seq((1, 2L, 1.0, 2.0), (1, 3L, 0.999, 2.0))
      .toDF("k", "b_id", "b_lo", "b_hi")
    val touch = RangeJoin.intervalOverlap(ta, tb,
      "a_lo", "a_hi", "b_lo", "b_hi", g = 1.0, keys = Seq("k"))
      .select($"b_id").as[Long].collect().toSet
    assert(touch === Set(3L))
  }

  test("point-in-interval grid join equals the theta join on random data") {
    val rnd = new scala.util.Random(17)
    val pts = (1 to 500).map(i => (i.toLong, rnd.nextDouble() * 120 - 10))
      .toDF("pid", "v")
    val ivs = (1 to 200).map { i =>
      val lo = rnd.nextDouble() * 100
      (i.toLong, lo, lo + rnd.nextDouble() * 25)
    } ++ Seq((900L, 50.0, 40.0), (901L, 30.0, 30.0)) // inverted + empty
    val ivDf = ivs.toDF("iid", "lo", "hi")
    val grid = RangeJoin.pointInInterval(pts, ivDf, "v", "lo", "hi", g = 7.0)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val theta = pts.join(ivDf, $"v" >= $"lo" && $"v" < $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(grid === theta)
    assert(!grid.exists(_._2 >= 900L)) // degenerate intervals match nothing
  }

  test("ORC roundtrip preserves rows and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.collect().toSet === src.collect().toSet)
    // predicate pushdown reaches the ORC reader (same contract as
    // parquet: PushedFilters in the scan node)
    val plan = back.filter($"n_regionkey" === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"),
      s"no pushdown in:\n$plan")
  }

  test("bucketed co-located join runs with zero shuffle exchanges") {
    import graft.sources.Bucketing
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey".as("l_orderkey"), $"o_custkey")
    Bucketing.writeBucketed(li, "li_b", Seq("l_orderkey"), 8, Seq("l_orderkey"))
    Bucketing.writeBucketed(ord, "ord_b", Seq("l_orderkey"), 8, Seq("l_orderkey"))
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // AQE off so the executed plan is inspectable pre-run; broadcast
      // off so the join would otherwise need two exchanges
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
      assert(Bucketing.shuffleFree(bucketed), "bucketed join must not shuffle")
      val plain = li.join(ord, "l_orderkey")
      assert(!Bucketing.shuffleFree(plain), "sanity: plain join shuffles")
      assert(bucketed.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("salted join equals the plain join on skewed data") {
    val big = (1 to 10000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", 1.0), ("k7", 2.0), ("missing", 3.0)).toDF("key", "w")
    val plain = big.join(small, Seq("key")).select($"key", $"v", $"w")
    val salted = SkewJoin.saltedJoin(big, small, Seq("key"), saltBy = $"v")
      .select($"key", $"v", $"w")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() === 1001) // 1000 hot + k7
  }
}
