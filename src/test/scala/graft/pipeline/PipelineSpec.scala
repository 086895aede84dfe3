package graft.pipeline

import graft.SparkSpec
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Ann
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank", "a"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend", "a"),
    (3L, "completely different content about spark shuffles and partitions", "a"),
    (4L, "THE  QUICK brown fox jumps over the lazy dog near the river bank", "b"),
    (5L, "el la de que los something else entirely here now", "b")
  ).toDF("doc_id", "text", "source")

  test("exact dedup groups case/whitespace-normalized duplicates") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .filter($"n_copies" > 1).collect()
    assert(out.length === 1)         // docs 1 and 4 normalize identically
    assert(out.head.getAs[Long]("keep_id") === 1L)
    assert(out.head.getAs[Long]("n_copies") === 2L)
  }

  test("short/empty documents yield empty shingle sets, not a crash") {
    // fewer tokens than the shingle width w=3 must produce an empty
    // shingle list (PG/DuckDB range(1,0) semantics), never the Spark
    // descending sequence(1,0) → element_at(t,0) crash
    val shorts = Seq((1L, "", "a"), (2L, "one", "a"), (3L, "two words", "a"),
      (4L, "exactly three tokens", "a")).toDF("doc_id", "text", "source")
    val grams = shorts
      .select($"doc_id", Dedup.shingleHashes($"text").as("g"))
      .select($"doc_id", size($"g").as("n")).as[(Long, Int)].collect().toMap
    assert(grams(1L) === 0 && grams(2L) === 0 && grams(3L) === 0)
    assert(grams(4L) === 1)
    // downstream ops must degrade gracefully too: signature is the
    // all-P sentinel, candidate/apply/jaccard paths run clean
    val sig = shorts.select(
      Dedup.minhashSignature(Dedup.shingleHashes($"text")).as("sig"))
      .filter($"sig" === array(Seq.fill(Dedup.minhashCoeffs.size)(lit(Dedup.P)): _*))
    assert(sig.count() === 3)
    // the three sentinel-signature docs form one "identical" group
    // (empty shingle set ≡ empty shingle set) → min id 1 survives
    assert(Dedup.dropNearDuplicates(shorts, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet === Set(1L, 4L))
    assert(Dedup.ngramJaccardPairs(shorts, "doc_id", "text",
      blockCols = Seq("source")).count() === 0)
  }

  test("span profile counts cross-document duplicated spans") {
    // docs 1/2 share every 6-token span except the tail; doc 3 shares
    // none; a 3-token doc has no 6-token span at all but must survive
    val d = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),
      (3L, "u v w x y z p q r s"),
      (4L, "too short doc")
    ).toDF("doc_id", "text")
    val out = Dedup.spanProfile(d, "doc_id", "text", w = 6, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) === ((5L, 4L, 0.8)))   // spans @1..5; 4 shared with doc 2
    assert(out(2L) === ((5L, 4L, 0.8)))
    assert(out(3L) === ((5L, 0L, 0.0)))   // unique content
    assert(out(4L) === ((0L, 0L, 0.0)))   // shorter than w
  }

  test("tokenize-to-ids is length-preserving with a dense ranked vocab") {
    val out = graft.queries.PipelineQueries.qTokenize(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).split(',').filter(_.nonEmpty).map(_.toLong).toSeq))
    assert(out.nonEmpty)
    val maxId = out.flatMap(_._3).max
    out.foreach { case (_, n, ids) =>
      assert(ids.length.toLong === n)          // one id per token, in order
      assert(ids.forall(i => i >= 1 && i <= maxId))
    }
    // ids are dense 1..|vocab| (row_number ranking leaves no gaps)
    assert(out.flatMap(_._3).distinct.sorted === (1L to maxId))
  }

  test("unigram LM scores common-token docs above rare-token docs") {
    // "the" dominates the corpus; "xylophone"/"quux" are singletons —
    // the all-common doc must have the higher (less negative) score
    val d = Seq(
      (1L, "the the the the the the"),
      (2L, "xylophone quux zebra"),
      (3L, "the the xylophone"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = graft.text.UnigramLm.score(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._2 > out(3L)._2 && out(3L)._2 > out(2L)._2)
    assert(out.values.forall(_._2 <= 0.0)) // log-probs are never positive
    assert(out(4L) === ((0L, 0.0)))        // token-less doc survives
    // doc 1: p(the) = 8/12, score = round(round(ln(2/3)*1e6)/1e6, 6)
    val exp = math.round(math.log(8.0 / 12.0) * 1e6) / 1e6
    assert(math.abs(out(1L)._2 - exp) < 1e-9)
  }

  test("minhash candidates surface near-dups, not unrelated docs") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select($"id_a", $"id_b", $"sig_agreement")
      .as[(Long, Long, Double)].collect().toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 4L)))  // identical after normalization? no —
    // minhash runs on raw text; 1 vs 4 differ in case but share most
    // 3-gram shingles ("brown fox jumps", …) → must be candidates
    assert(keys.contains((1L, 2L)))  // one-word difference
    assert(!keys.exists(k => k._1 == 3L || k._2 == 3L)) // unrelated doc
    pairs.filter(p => (p._1, p._2) == (1L, 2L))
      .foreach(p => assert(p._3 > 0.4))
  }

  test("fast (xxhash64) minhash path finds the same near-dup pairs") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text", fast = true)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(k => k._1 == 3L || k._2 == 3L))
  }

  test("simhash of near-identical docs is close in hamming distance") {
    val sh = docs.select($"doc_id", Dedup.simhash($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)))
    assert(sh(1L) !== sh(3L))
  }

  test("simhash candidate pairs surface the near-identical docs") {
    val pairs = Dedup.simhashCandidates(docs, "doc_id", "text", maxHamming = 6)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect()
    val keys = pairs.map(p => (p._1, p._2)).toSet
    // docs 1/2 differ by one word; their simhashes must be close
    assert(keys.contains((1L, 2L)))
    assert(pairs.forall(_._3 <= 6))
    // unrelated content stays out at a tight threshold
    val tight = Dedup.simhashCandidates(docs, "doc_id", "text", maxHamming = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(!tight.exists(k => k._1 == 3L || k._2 == 3L))
  }

  test("pair-band simhash candidates equal the single-band set exactly") {
    // Equality must hold at a maxHamming where pairs genuinely FLIP
    // BITS ACROSS MULTIPLE BANDS (docs 1/2 at maxHamming = 6 span
    // several 8-bit bands of the 8-band pair layout), so the compound
    // keys' two-untouched-bands pigeonhole is exercised, not just the
    // hamming-0 trivial case. Exact candidate generation is the
    // contract: both layouts must emit the identical (id_a, id_b,
    // hamming) set for every budget.
    for (h <- Seq(1, 3, 6)) {
      val single = Dedup.simhashCandidates(docs, "doc_id", "text", h)
        .as[(Long, Long, Int)].collect().toSet
      val paired = Dedup.simhashCandidatesScaled(docs, "doc_id", "text", h)
        .as[(Long, Long, Int)].collect().toSet
      assert(paired === single, s"maxHamming=$h")
    }
    assert(Dedup.simhashCandidatesScaled(docs, "doc_id", "text", 6)
      .as[(Long, Long, Int)].collect().exists(p => (p._1, p._2) == (1L, 2L)))
  }

  test("ngram jaccard finds the near-dup pair within its block") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      blockCols = Seq("source"), threshold = 0.2)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 > 0.5))
    // cross-block pairs (1,4) must NOT be compared (different source)
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 4L))
  }

  test("exact-dedup-first: a planted 1000-copy cluster yields O(clusters) candidates") {
    val boiler = "subscribe to our newsletter for updates and offers every week please"
    val big = ((1 to 1000).map(i => (i.toLong, boiler, "a")) ++ Seq(
      (1001L, "the quick brown fox jumps over the lazy dog near the river bank", "a"),
      (1002L, "the quick brown fox jumps over the lazy dog near the river bend", "a"),
      (1003L, "completely different content about spark shuffles and partitions", "a")
    )).toDF("doc_id", "text", "source")
    val kept = Dedup.dropNearDuplicates(big, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    // the cluster collapses to its min id; the near-dup 1002 drops
    // against 1001; unrelated 1003 survives
    assert(kept === Set(1L, 1001L, 1003L))
    // candidate generation runs on REPRESENTATIVES only: 4 reps → pair
    // volume bounded by rep pairs, not the ~2M pairs (1000²/2 × 4
    // bands) the raw cluster would emit
    val repIds = Dedup.exact(big, "doc_id", "text").select($"keep_id".as("doc_id"))
    val reps = big.join(repIds, Seq("doc_id"), "left_semi")
    assert(reps.count() === 4)
    assert(Dedup.minhashCandidates(reps, "doc_id", "text").count() <= 6)
  }

  test("IVF centroid sampling is id-distribution-agnostic (offset ids work)") {
    // ids start at 100000: the old `filter(id < nlist)` centroid pick
    // would find ZERO centroids and return an empty result
    val vecs = (0 until 50).map { i =>
      (i.toLong + 100000L, Array.tabulate(64)(j => math.sin(i * 17 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Ann.ivfTopK(vecs, vecs.filter($"vec_id" === 100003L),
      "vec_id", "embedding", k = 3, nlist = 8, nprobe = 3)
      .select($"neighbor_id").as[Long].collect()
    assert(out.length === 3)
    assert(out.forall(n => n != 100003L && n >= 100000L && n < 100050L))
  }

  test("incremental dedup drops incoming docs that duplicate the reference") {
    val reference = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank", "r"),
      (11L, "content that lives only in the existing reference corpus", "r")
    ).toDF("doc_id", "text", "source")
    val incoming = Seq(
      (20L, "the quick brown fox jumps over the lazy dog near the river bank", "i"), // exact dup of 10
      (21L, "THE QUICK brown fox jumps over the lazy dog near the river bank", "i"), // normalized dup of 10
      (22L, "the quick brown fox jumps over the lazy dog near the river bend", "i"), // near dup of 10
      (23L, "entirely novel incoming material about catalyst optimizer rules", "i"),
      (24L, "entirely novel incoming material about catalyst optimizer rules", "i")  // in-batch dup: KEPT
    ).toDF("doc_id", "text", "source")
    val kept = Dedup.dropDuplicatesAgainst(incoming, reference, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    // exact (20), normalized (21), and near (22) duplicates drop; both
    // copies of the novel doc survive (in-batch dedup is a separate op)
    assert(kept === Set(23L, 24L))
    // a cluster of reference copies must not explode candidate volume:
    // the rep-level pairing bounds pairs by rep count, and results agree
    val bigRef = reference.unionByName(
      Seq.tabulate(500)(i => (100L + i, "boilerplate repeated verbatim in the reference forever and ever amen", "r"))
        .toDF("doc_id", "text", "source"))
    val kept2 = Dedup.dropDuplicatesAgainst(incoming, bigRef, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept2 === Set(23L, 24L))
  }

  test("repetition ratio flags repeated phrases, not novel text") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "every word here is completely different from the others"),
      (3L, "two words")).toDF("doc_id", "text")
    val r = df.select($"doc_id", TextAnalysis.repetitionRatio($"text").as("rr"))
      .as[(Long, Double)].collect().toMap
    assert(r(1L) > 0.8)   // 8 positions, 1 distinct shingle
    assert(r(2L) === 0.0) // all shingles distinct
    assert(r(3L) === 0.0) // under w tokens → no positions
  }

  test("sequence packing is shard-local, contiguous, and budget-chunked") {
    import graft.ops.Packing
    val df = Seq(
      (1L, "a", 100), (2L, "a", 100), (3L, "a", 100),
      (4L, "b", 250), (5L, "b", 0), (6L, "b", 60)
    ).toDF("doc_id", "shard", "n_tokens")
    val out = Packing.packSequences(df, "shard", "doc_id", "n_tokens", budget = 128)
      .select($"doc_id", $"start_tok", $"end_tok", $"pack_first", $"pack_last")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 0L, 100L, 0L, 0L)))
    assert(out(2L) === ((2L, 100L, 200L, 0L, 1L)))  // straddles the chunk edge
    assert(out(3L) === ((3L, 200L, 300L, 1L, 2L)))
    assert(out(4L) === ((4L, 0L, 250L, 0L, 1L)))    // shard b restarts at 0
    assert(out(5L) === ((5L, 250L, 250L, 1L, 1L)))  // empty doc: zero span
    assert(out(6L) === ((6L, 250L, 310L, 1L, 2L)))
  }

  test("contamination report counts distinct shared shingles per doc") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "totally unrelated content with zero overlap whatsoever here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "someone saw the quick brown fox yesterday")
    ).toDF("doc_id", "text")
    val rep = Dedup.contaminationReport(corpus, bench, "doc_id", "text", w = 3)
      .as[(Long, Long)].collect().toMap
    // shared 3-shingles: "the quick brown", "quick brown fox" → 2
    assert(rep === Map(1L -> 2L))
  }

  test("domain mix hits the target mixture via per-source rates") {
    import graft.ops.Sampling
    val rows = (1 to 400).map(i => (i.toLong, s"src${i % 4}")) ++
      (401 to 500).map(i => (i.toLong, "other"))
    val df = rows.toDF("doc_id", "source")
    val kept = Sampling.domainMix(df, "doc_id", "source",
      Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1))
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(!kept.contains("other"))        // untargeted source dropped
    // 100 docs per source; scale = min(100/0.4,…)=250 → expected kept
    // ≈ (100, 75, 50, 25); the binding source keeps everything
    assert(kept("src0") === 100L)
    assert(kept("src1") < 100L && kept("src1") > 40L)
    assert(kept("src2") < kept("src1"))
    assert(kept("src3") < kept("src2"))
    // determinism: same input → identical kept set
    val again = Sampling.domainMix(df, "doc_id", "source",
      Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1))
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(again === kept)
  }

  test("repeat factor emits exact whole-epoch copies plus the hashed fraction") {
    import graft.ops.Sampling
    val rows = (1 to 100).map(i => (i.toLong, s"src${i % 2}"))
    val df = rows.toDF("doc_id", "source")
    val out = Sampling.repeatFactor(df, "doc_id", "source",
      Seq("src0" -> 3.0, "src1" -> 1.25))
    val bySource = out.groupBy($"source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // integer epochs are exact: 50 docs × 3 copies
    assert(bySource("src0") === 150L)
    // fractional epochs: 50 + the deterministic subset under u < 0.25
    val bumped = df.filter($"source" === "src1")
      .filter(Sampling.coordinate($"doc_id") < 0.25).count()
    assert(bySource("src1") === 50L + bumped)
    // copy_idx is dense per document: 0..n-1
    val badIdx = out.groupBy($"doc_id").agg(
      count(lit(1)).as("n"), max($"copy_idx").as("mx"), min($"copy_idx").as("mn"))
      .filter($"mx" =!= $"n" - 1 || $"mn" =!= 0)
    assert(badIdx.count() === 0)
    // e < 1 degrades to sampleFraction: identical kept key set
    val frac = Sampling.repeatFactor(df, "doc_id", "source",
      Seq("src0" -> 0.4), defaultEpochs = 0.0)
      .select($"doc_id").as[Long].collect().toSet
    val direct = Sampling.sampleFraction(
      df.filter($"source" === "src0"), "doc_id", 0.4)
      .select($"doc_id").as[Long].collect().toSet
    assert(frac === direct)
    // NULL key: no coordinate, so no fractional bump — but the
    // floor(e) whole-epoch copies must survive (and match the oracle)
    val withNull = Seq((Some(1L), "src0"), (None: Option[Long], "src0"))
      .toDF("doc_id", "source")
    val nullCopies = Sampling.repeatFactor(withNull, "doc_id", "source",
      Seq("src0" -> 3.25))
      .filter($"doc_id".isNull).count()
    assert(nullCopies === 3L)
  }

  test("brute-force ANN ranks an identical vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f, 0.0f)),   // near-identical to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.7f, 0.7f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Ann.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id",
      "embedding", k = 2)
      .select($"neighbor_id", $"rank").as[(Long, Int)].collect().toSeq
    assert(top === Seq((1L, 1), (3L, 2)))
  }

  test("LSH buckets put identical vectors together; results ⊆ brute force") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 17 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" < 3)
    val lsh = Ann.lshBucketTopK(vecs, q, "vec_id", "embedding", k = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // every LSH neighbor must be a genuine corpus row, not fabricated
    assert(lsh.forall { case (qid, n) => n != qid && n >= 0 && n < 50 })
  }

  test("IVF ANN: probed-cell search finds the planted near-duplicate") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 17 + j).toFloat))
    } :+ (50L, Array.tabulate(64)(j => (math.sin(3 * 17 + j) * 1.001).toFloat))
    val df = vecs.toDF("vec_id", "embedding")
    val ivf = Ann.ivfTopK(df, df.filter($"vec_id" === 3), "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 3)
      .select($"neighbor_id", $"rank").as[(Long, Int)].collect().toSeq
    // vec 50 is a scaled copy of vec 3 (cosine ≈ 1): it must share
    // vec 3's nearest cell and therefore be found at rank 1
    assert(ivf.headOption.map(_._1) === Some(50L))
    // every neighbor is a genuine corpus row from a probed cell
    assert(ivf.forall { case (n, _) => n != 3L && n >= 0 && n <= 50 })
  }

  test("embedding near-dup pairs surface the planted duplicate pair") {
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 17 + j).toFloat))
    } :+ (30L, Array.tabulate(64)(j => (math.sin(5 * 17 + j) * 0.999).toFloat))
    val df = vecs.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
      threshold = 0.9)
      .select($"id_a", $"id_b", $"cos_sim").as[(Long, Long, Double)].collect()
    // the scaled copy of vec 5 shares every sign bucket with it and
    // sits at cosine ≈ 1 — it MUST be found; orthogonal-ish pairs must not
    assert(pairs.exists(p => p._1 == 5L && p._2 == 30L && p._3 > 0.99))
    assert(pairs.forall(_._3 >= 0.9))
  }

  test("resize samples nearest-neighbor bytes deterministically") {
    val payload = Multimodal.withPayload(docs, "text")
    val out = Multimodal.resize(spark, payload, "doc_id", outW = 4, outH = 4)
      .collect().map(r => r.id -> r).toMap
    assert(out.size === 5)
    val r1 = out(1L)
    assert(r1.outW === 4 && r1.outH === 4 && r1.resized.length === 16)
    // checksum is exactly the byte sum of the resized buffer
    assert(r1.checksum === r1.resized.map(_ & 0xff).sum.toLong)
    // deterministic: same input → same bytes on re-run
    val again = Multimodal.resize(spark, payload, "doc_id", 4, 4)
      .collect().map(r => r.id -> r.resized.toSeq).toMap
    assert(again(1L) === r1.resized.toSeq)
    // first output pixel is the source byte at (0,0) — nearest neighbor
    assert(r1.resized(0) === docs.filter($"doc_id" === 1)
      .head().getAs[String]("text").getBytes("UTF-8")(0))
  }

  test("fake codec decode is deterministic and metadata never decodes") {
    val payload = Multimodal.withPayload(docs, "text")
    val meta = Multimodal.metadata(payload, "doc_id").collect()
    assert(meta.length === 5)
    val feats = Multimodal.decodeFeatures(spark, payload, "doc_id").collect()
    assert(feats.map(_.id).sorted === Array(1L, 2L, 3L, 4L, 5L))
    assert(feats.forall(f => f.width >= 16 && f.channels >= 1 && f.brightness > 0))
    val again = Multimodal.decodeFeatures(spark, payload, "doc_id").collect()
    assert(feats.sortBy(_.id).toSeq === again.sortBy(_.id).toSeq)
  }

  test("PII redaction scrubs emails, SSNs, phones, IPs with typed tags") {
    val pii = Seq(
      (1L, "contact alice@example.com or +1-555-123-4567 today"),
      (2L, "ssn 123-45-6789 from host 192.168.0.1"),
      (3L, "no sensitive content here at all")).toDF("doc_id", "text")
    val out = pii.select($"doc_id",
      TextAnalysis.redactPii($"text").as("red"),
      TextAnalysis.piiCount($"text").as("n"))
      .as[(Long, String, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 === "contact <EMAIL> or <PHONE> today")
    assert(out(1L)._2 === 2)
    assert(out(2L)._1 === "ssn <SSN> from host <IP>")
    assert(out(2L)._2 === 2)
    assert(out(3L) === ("no sensitive content here at all", 0))
  }

  test("language id picks the language with most marker hits") {
    val out = docs.select($"doc_id", TextAnalysis.langId($"text").as("p"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(5L) === "es")
  }

  test("leakage-safe split: a near-dup cluster never straddles splits") {
    // docs 1, 2, 4 are one near-dup cluster (see `docs`); a split keyed
    // on doc_id could separate them — keyed on cluster_id it cannot
    val clusters = Dedup.duplicateClusters(docs, "doc_id", "text")
    val split = graft.ops.Sampling.deterministicSplit(
      clusters, "cluster_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val straddlers = split.groupBy($"cluster_id")
      .agg(countDistinct($"split").as("n_splits"))
      .filter($"n_splits" > 1)
    assert(straddlers.count() === 0)
    // and the cluster structure is the expected one: {1,2,4} together
    val byDoc = split.select($"doc_id", $"split").as[(Long, String)]
      .collect().toMap
    assert(byDoc(1L) === byDoc(2L) && byDoc(2L) === byDoc(4L))
    assert(byDoc.size === 5)
  }
}
