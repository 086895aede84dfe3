package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Ann
import graft.text.{Bm25, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication-family queries (exact, MinHash, SimHash, n-gram
  * Jaccard, all-pairs, incremental) plus privacy/split hygiene.
  *
  * Part of the [[PipelineQueries]] linear trait chain: each trait
  * extends the previous one, so member initialization order and
  * visibility are IDENTICAL to the former single-object layout (the
  * chain is a file split, not an architecture: everything still
  * composes into the one PipelineQueries object).
  */
private[queries] trait DedupQueries extends TextCurationQueries {
  // --------------------------------------------------------------- dedup

  /** Exact dedup by content fingerprint. */
  def qDedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(Tables.documents(s, d), "doc_id", "text")

  val qDedupExactSql: String =
    s"""SELECT md5($normSql) AS fp,
       |  min(doc_id) AS keep_id, count(*) AS n_copies
       |FROM documents GROUP BY 1""".stripMargin

  /** MinHash signatures (the hard part of MinHash-LSH, verified
    * element-by-element against the oracle).
    */
  def qMinhashSig(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), Dedup.shingleHashes(col("text")).as("grams"))
      .select(col("doc_id"),
        array_join(Dedup.minhashSignature(col("grams")), ",").as("sig"))

  val qMinhashSigSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id, ${shinglesSql("toks")} AS grams FROM t)
       |SELECT doc_id, array_to_string(${minhashSql("grams")}, ',') AS sig
       |FROM sh""".stripMargin

  /** MinHash LSH candidate pairs (band-bucket join + signature
    * agreement).
    */
  def qMinhashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text")

  val qMinhashPairsSql: String = {
    val bandSelects = bandSelectsSql("sigs", "doc_id")
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id, ${shinglesSql("toks")} AS grams FROM t),
       |sigs AS (SELECT doc_id, ${minhashSql("grams")} AS sig FROM sh),
       |buckets AS ($bandSelects)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  len(list_filter(range(1, ${Dedup.minhashCoeffs.size} + 1),
       |      i -> a.sig[i] = b.sig[i])) * 1.0 / ${Dedup.minhashCoeffs.size}
       |    AS sig_agreement
       |FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id""".stripMargin
  }

  /** End-to-end near-dedup application: the corpus minus confidently
    * near-duplicate docs (higher id of each candidate pair dropped).
    */
  def qDedupApply(s: SparkSession, d: String): DataFrame =
    Dedup.dropNearDuplicates(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"), col("source"))

  val qDedupApplySql: String = {
    val bandSelects = bandSelectsSql("sigs", "doc_id")
    // exact-dedup-first mirror of Dedup.dropNearDuplicates: collapse to
    // one min-id representative per normalized fingerprint, then run
    // MinHash-LSH over representatives only
    s"""WITH reps AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5($normSql)),
       |t AS (SELECT doc_id, $toksSql AS toks FROM documents
       |      WHERE doc_id IN (SELECT doc_id FROM reps)),
       |sh AS (SELECT doc_id, ${shinglesSql("toks")} AS grams FROM t),
       |sigs AS (SELECT doc_id, ${minhashSql("grams")} AS sig FROM sh),
       |buckets AS ($bandSelects),
       |drops AS (
       |  SELECT DISTINCT b.doc_id
       |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  WHERE len(list_filter(range(1, ${Dedup.minhashCoeffs.size} + 1),
       |        i -> a.sig[i] = b.sig[i])) * 1.0 / ${Dedup.minhashCoeffs.size} >= 0.75)
       |SELECT doc_id, source FROM documents
       |WHERE doc_id IN (SELECT doc_id FROM reps)
       |  AND doc_id NOT IN (SELECT doc_id FROM drops)""".stripMargin
  }

  /** Duplicate clustering: every document labeled with the min doc id
    * of its transitive near-duplicate component (exact-first reps →
    * LSH edges → connected components → docs inherit their rep's
    * component; singletons label themselves).
    */
  def qDupClusters(s: SparkSession, d: String): DataFrame =
    Dedup.duplicateClusters(Tables.documents(s, d), "doc_id", "text")

  val qDupClustersSql: String = {
    val bandSelects = bandSelectsSql("sigs", "doc_id")
    // transitive closure over the (tiny) near-dup edge list via a
    // recursive UNION — set semantics dedups across iterations, so the
    // recursion terminates on the cyclic symmetrized graph. All values
    // are BIGINT doc ids (engine-version-proof).
    s"""WITH RECURSIVE reps AS (
       |  SELECT md5($normSql) AS fp, min(doc_id) AS doc_id
       |  FROM documents GROUP BY 1),
       |t AS (SELECT doc_id, $toksSql AS toks FROM documents
       |      WHERE doc_id IN (SELECT doc_id FROM reps)),
       |sh AS (SELECT doc_id, ${shinglesSql("toks")} AS grams FROM t),
       |sigs AS (SELECT doc_id, ${minhashSql("grams")} AS sig FROM sh),
       |buckets AS ($bandSelects),
       |edges AS (
       |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  WHERE len(list_filter(range(1, ${Dedup.minhashCoeffs.size} + 1),
       |        i -> a.sig[i] = b.sig[i])) * 1.0 / ${Dedup.minhashCoeffs.size} >= 0.75),
       |sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM sym
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON s.src = r.dst),
       |comp AS (
       |  SELECT src AS id, least(src, min(dst)) AS component
       |  FROM reach GROUP BY src),
       |m AS (
       |  SELECT d.doc_id, r.doc_id AS rep
       |  FROM documents d JOIN reps r ON md5($normSql) = r.fp)
       |SELECT m.doc_id, coalesce(c.component, m.rep) AS cluster_id
       |FROM m LEFT JOIN comp c ON c.id = m.rep""".stripMargin
  }

  /** Quality-aware dedup representative: within each near-duplicate
    * cluster keep the HIGHEST-quality copy (ties to the lower id) —
    * the curation-grade refinement of `q_dedup_apply`'s keep-lowest-id
    * rule, which discards good rewrites in favor of whatever copy
    * happened to be ingested first. Composes
    * [[graft.dedup.Dedup.duplicateClusters]] with
    * [[graft.text.TextAnalysis.qualityScore]]; one extra window rank
    * over the cluster frame (tiny: one row per document, keyed by
    * cluster), nothing quadratic.
    */
  def qDedupBest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val clusters = Dedup.duplicateClusters(docs, "doc_id", "text")
    val scored = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    clusters.join(scored, Seq("doc_id"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("cluster_id"), col("doc_id"), col("quality"))
  }

  val qDedupBestSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks, text FROM documents),
       |w AS (SELECT doc_id, ${qualityExprSql("toks", "text")} AS quality FROM t),
       |j AS (SELECT c.cluster_id, c.doc_id, w.quality,
       |        row_number() OVER (PARTITION BY c.cluster_id
       |          ORDER BY w.quality DESC, c.doc_id ASC) AS rk
       |      FROM ($qDupClustersSql) c JOIN w USING (doc_id))
       |SELECT cluster_id, doc_id, quality FROM j WHERE rk = 1""".stripMargin

  /** Survivorship / golden-record fusion over the near-duplicate
    * clusters: one fused record per cluster — longest text elects the
    * canonical id, categorical fields (lang, source) fuse by
    * most-frequent-wins with smallest-value ties, n_chars sums
    * (graft.ops.Survivorship). The MDM merge step that follows
    * clustering: `q_dedup_best` elects a member ROW, this fuses
    * FIELDS across members. All-aggregation plan (struct-max +
    * count/max/min chains), no windows — a hot cluster partial-
    * aggregates instead of pinning one sort task.
    */
  def qSurvivor(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val clusters = Dedup.duplicateClusters(docs, "doc_id", "text")
    graft.ops.Survivorship.goldenRecords(
      docs.join(clusters, Seq("doc_id")),
      clusterCol = "cluster_id", idCol = "doc_id", textCol = "text",
      modalCols = Seq("lang", "source"), sumCols = Seq("n_chars"))
  }

  val qSurvivorSql: String = {
    def modal(cte: String, field: String) =
      s"""${cte}c AS (
         |  SELECT cluster_id, $field AS v, count(*) AS c FROM j
         |  WHERE $field IS NOT NULL GROUP BY 1, 2),
         |$cte AS (
         |  SELECT cluster_id, v FROM (
         |    SELECT cluster_id, v, row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY c DESC, v ASC) AS rn
         |    FROM ${cte}c) WHERE rn = 1)""".stripMargin
    s"""WITH j AS (
       |  SELECT c.cluster_id, d.doc_id, d.text, d.lang, d.source, d.n_chars
       |  FROM ($qDupClustersSql) c JOIN documents d ON c.doc_id = d.doc_id),
       |core AS (
       |  SELECT cluster_id, count(*) AS n_members,
       |    cast(sum(n_chars) as bigint) AS sum_n_chars
       |  FROM j GROUP BY 1),
       |canon AS (
       |  SELECT cluster_id, doc_id AS canonical_id,
       |    length(text) AS canonical_len,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY length(text) DESC, doc_id ASC) AS rn
       |  FROM j),
       |${modal("ml", "lang")},
       |${modal("ms", "source")}
       |SELECT core.cluster_id, core.n_members, cn.canonical_id,
       |  cn.canonical_len, core.sum_n_chars,
       |  ml.v AS modal_lang, ms.v AS modal_source
       |FROM core
       |JOIN (SELECT cluster_id, canonical_id, canonical_len
       |      FROM canon WHERE rn = 1) cn ON core.cluster_id = cn.cluster_id
       |LEFT JOIN ml ON core.cluster_id = ml.cluster_id
       |LEFT JOIN ms ON core.cluster_id = ms.cluster_id""".stripMargin
  }

  /** Quality-per-token Pareto frontier (graft.ops.Skyline.front2d):
    * documents no budget-constrained selection policy would skip —
    * maximize quality score, minimize token count, keep the
    * non-dominated set. The engine runs the level-sweep formulation
    * (per-level min + one window over DISTINCT quality levels + a
    * joined-back threshold — O(N) + a tiny sort); the oracle is the
    * quadratic NOT EXISTS textbook definition, so the algebraic
    * equivalence is what the hash match certifies.
    */
  def qPareto(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val scored = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    graft.ops.Skyline.front2d(scored, "quality", "n_tokens")
  }

  val qParetoSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks, text FROM documents),
       |w AS (SELECT doc_id, ${qualityExprSql("toks", "text")} AS quality,
       |        len(toks) AS n_tokens FROM t)
       |SELECT p.doc_id, p.quality, p.n_tokens FROM w p
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM w o
       |  WHERE o.quality >= p.quality AND o.n_tokens <= p.n_tokens
       |    AND (o.quality > p.quality OR o.n_tokens < p.n_tokens))""".stripMargin

  /** Join-cardinality estimation by CMS inner product
    * (graft.sketch.CountMin.joinSizeEstimate): |lineitem ⋈ σ(part)| on
    * partkey, estimated from two d×65536 counter tables (w sized so the collision term ‖fA‖₁‖fB‖₁/w sits well under the true size) built in one
    * narrow pass per side — the planner statistic that decides
    * broadcast-vs-shuffle (or predicts a skew blowup) BEFORE paying
    * the join. Emits per-depth estimates, the sketch min, and the
    * exact size so the one-sided error is visible in the result.
    */
  def qJoinCard(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d).filter(col("p_retailprice") > 975.0)
    val est = graft.sketch.CountMin.joinSizeEstimate(
      l, "l_partkey", p, "p_partkey", w = 65536)
    val exact = l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(count(lit(1)).as("exact_n"))
    est.crossJoin(broadcast(exact))
  }

  val qJoinCardSql: String =
    s"""WITH ka AS (SELECT l_partkey AS k FROM lineitem),
       |kb AS (SELECT p_partkey AS k FROM part WHERE p_retailprice > 975.0),
       |${graft.sketch.CountMin.joinSizeCtesSql(65536)},
       |ex AS (
       |  SELECT count(*) AS exact_n FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  WHERE p_retailprice > 975.0)
       |SELECT r.cm_row, r.row_est,
       |  (SELECT min(row_est) FROM rows_) AS est, ex.exact_n
       |FROM rows_ r CROSS JOIN ex""".stripMargin

  /** k-anonymity / l-diversity release audit with a local-recoding
    * generalization ladder (graft.ops.Privacy): quasi-identifiers
    * (nation, market segment, account-balance band), entity =
    * customer, sensitive = order priority. Classes with < 5 distinct
    * customers or < 2 distinct priorities coarsen their band 1000 →
    * 5000 → suppressed; residual failures flag `risky`. The privacy
    * gate a data-release pipeline runs before publishing per-group
    * aggregates.
    */
  def qKanon(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val base = c.join(o, col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("bigint").as("qi_nation"),
        col("c_mktsegment").as("qi_seg"),
        (floor(col("c_acctbal") / 1000) * 1000).cast("bigint").as("band_fine"),
        (floor(col("c_acctbal") / 5000) * 5000).cast("bigint").as("band_coarse"),
        col("c_custkey"), col("o_orderpriority"))
    graft.ops.Privacy.generalize(base, Seq("qi_nation", "qi_seg"),
      "band_fine", "band_coarse", "c_custkey", "o_orderpriority",
      k = 5, l = 2)
  }

  val qKanonSql: String = {
    val (kk, ll) = (5, 2)
    s"""WITH base AS (
       |  SELECT cast(c_nationkey as bigint) AS qi_nation,
       |    c_mktsegment AS qi_seg,
       |    cast(floor(c_acctbal / 1000) * 1000 as bigint) AS band_fine,
       |    cast(floor(c_acctbal / 5000) * 5000 as bigint) AS band_coarse,
       |    c_custkey, o_orderpriority
       |  FROM customer JOIN orders ON o_custkey = c_custkey),
       |g0 AS (
       |  SELECT qi_nation, qi_seg, band_fine,
       |    count(DISTINCT c_custkey) AS k_size,
       |    count(DISTINCT o_orderpriority) AS l_div
       |  FROM base GROUP BY 1, 2, 3),
       |rows1 AS (
       |  SELECT b.* FROM base b
       |  JOIN g0 ON b.qi_nation = g0.qi_nation AND b.qi_seg = g0.qi_seg
       |    AND b.band_fine = g0.band_fine
       |  WHERE g0.k_size < $kk OR g0.l_div < $ll),
       |g1 AS (
       |  SELECT qi_nation, qi_seg, band_coarse,
       |    count(DISTINCT c_custkey) AS k_size,
       |    count(DISTINCT o_orderpriority) AS l_div
       |  FROM rows1 GROUP BY 1, 2, 3),
       |rows2 AS (
       |  SELECT r.* FROM rows1 r
       |  JOIN g1 ON r.qi_nation = g1.qi_nation AND r.qi_seg = g1.qi_seg
       |    AND r.band_coarse = g1.band_coarse
       |  WHERE g1.k_size < $kk OR g1.l_div < $ll),
       |g2 AS (
       |  SELECT qi_nation, qi_seg,
       |    count(DISTINCT c_custkey) AS k_size,
       |    count(DISTINCT o_orderpriority) AS l_div
       |  FROM rows2 GROUP BY 1, 2)
       |SELECT qi_nation, qi_seg, band_fine AS attr, 0 AS level,
       |  k_size, l_div, false AS risky
       |FROM g0 WHERE k_size >= $kk AND l_div >= $ll
       |UNION ALL
       |SELECT qi_nation, qi_seg, band_coarse AS attr, 1 AS level,
       |  k_size, l_div, false AS risky
       |FROM g1 WHERE k_size >= $kk AND l_div >= $ll
       |UNION ALL
       |SELECT qi_nation, qi_seg, NULL AS attr, 2 AS level,
       |  k_size, l_div, (k_size < $kk OR l_div < $ll) AS risky
       |FROM g2""".stripMargin
  }

  /** Leakage-safe train/val/test split: split membership is a hash of
    * the near-duplicate CLUSTER id, not the document id — every
    * transitive near-dup lands in the same split, so no eval document
    * has a training-set twin (the contamination mode a per-document
    * split cannot prevent: ~5% of pairs straddle any 80/10/10 doc-id
    * split). Composes [[Dedup.duplicateClusters]] with
    * [[graft.ops.Sampling.deterministicSplit]]; the oracle replays the
    * full cluster closure and the same hash coordinate on cluster_id.
    */
  def qLeakSplit(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.deterministicSplit(
      Dedup.duplicateClusters(Tables.documents(s, d), "doc_id", "text"),
      "cluster_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"))

  val qLeakSplitSql: String = {
    val u = graft.ops.Sampling.coordinateSql("cluster_id")
    s"""SELECT split, count(*) AS n_docs,
       |  count(distinct cluster_id) AS n_clusters
       |FROM (
       |  SELECT cluster_id,
       |    CASE WHEN $u < 0.8 THEN 'train'
       |         WHEN $u < ${0.8 + 0.1} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM ($qDupClustersSql) c)
       |GROUP BY 1""".stripMargin
  }

  /** Contrastive negative sampling: every document paired with k=2
    * deterministic pseudo-random partners from a COUNT-capped
    * hash-selected pool (see [[graft.ops.Sampling.negativeSample]]) —
    * membership and picks are pure functions of the data, so the
    * oracle replays pool selection and slot assignment bit-for-bit
    * from the shared md5-hash formulas (pool = the 64 smallest
    * coordinates, slots in coordinate order).
    */
  def qNegSample(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.negativeSample(
      Tables.documents(s, d), "doc_id", k = 2, poolSize = 64)

  val qNegSampleSql: String = {
    val u = graft.ops.Sampling.coordinateSql("doc_id")
    val h = graft.ops.Sampling.hash60Sql(
      "cast(doc_id as varchar) || ':' || cast(neg_idx as varchar)")
    s"""WITH ids AS (SELECT DISTINCT doc_id FROM documents),
       |ranked AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY $u, doc_id) AS slot
       |  FROM ids),
       |pool AS (SELECT doc_id, slot FROM ranked WHERE slot <= 64),
       |m AS (SELECT count(*) AS mx FROM pool),
       |c AS (
       |  SELECT d.doc_id, i.neg_idx, $h % m.mx + 1 AS slot
       |  FROM ids d CROSS JOIN m
       |  CROSS JOIN (VALUES (1), (2)) AS i(neg_idx))
       |SELECT c.doc_id, cast(c.neg_idx as bigint) AS neg_idx,
       |  p.doc_id AS neg_doc_id
       |FROM c JOIN pool p USING (slot)
       |WHERE c.doc_id <> p.doc_id""".stripMargin
  }

  /** Deterministic training-order shuffle: every document mapped to a
    * (shard, shard_pos) coordinate by two independent keyed hashes
    * (see [[graft.ops.Sampling.shuffleShards]]) — the seekable
    * pseudo-random permutation a dataloader consumes. The oracle
    * replays both hashes and the per-shard dense numbering.
    */
  def qShuffleShards(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.shuffleShards(
      Tables.documents(s, d).select(col("doc_id")), "doc_id", numShards = 8)

  val qShuffleShardsSql: String = {
    val hs = graft.ops.Sampling.hash60Sql("'shard:' || cast(doc_id as varchar)")
    val ho = graft.ops.Sampling.hash60Sql("'ord:' || cast(doc_id as varchar)")
    s"""WITH t AS (
       |  SELECT doc_id, $hs % 8 AS shard, $ho AS ord FROM documents)
       |SELECT doc_id, cast(shard as int) AS shard,
       |  row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS shard_pos
       |FROM t""".stripMargin
  }

  /** Global dense ids 0..N-1 without a global sort
    * ([[graft.ops.Sampling.assignDenseIds]]): per-shard offsets +
    * within-shard dense positions. The oracle replays it as the ONE
    * global row_number the operator deliberately avoids.
    */
  def qDenseIds(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.assignDenseIds(
      Tables.documents(s, d).select(col("doc_id")), "doc_id", numShards = 8)

  val qDenseIdsSql: String = {
    val hs = graft.ops.Sampling.hash60Sql("'shard:' || cast(doc_id as varchar)")
    val ho = graft.ops.Sampling.hash60Sql("'ord:' || cast(doc_id as varchar)")
    s"""WITH t AS (
       |  SELECT doc_id, $hs % 8 AS shard, $ho AS ord FROM documents)
       |SELECT doc_id, cast(shard as int) AS shard,
       |  row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id)
       |    AS shard_pos,
       |  row_number() OVER (ORDER BY shard, ord, doc_id) - 1 AS dense_id
       |FROM t""".stripMargin
  }

  /** Rendezvous routing: every document assigned to the named shard
    * with the highest keyed weight (see
    * [[graft.ops.Sampling.rendezvousShard]]); the oracle replays the
    * per-(key, shard) weights and the (weight, shard)-max pick.
    */
  def qRendezvous(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.rendezvousShard(
      Tables.documents(s, d).select(col("doc_id")), "doc_id",
      Seq("ingest-a", "ingest-b", "ingest-c", "ingest-d"))

  val qRendezvousSql: String = {
    val w = graft.ops.Sampling.hash60Sql(
      "s.shard || ':' || cast(doc_id as varchar)")
    s"""WITH ks AS (SELECT doc_id FROM documents),
       |w AS (
       |  SELECT doc_id, s.shard, $w AS wt
       |  FROM ks CROSS JOIN (VALUES ('ingest-a'), ('ingest-b'),
       |    ('ingest-c'), ('ingest-d')) AS s(shard)),
       |r AS (
       |  SELECT doc_id, shard, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY wt DESC, shard DESC) AS rn
       |  FROM w)
       |SELECT doc_id, shard FROM r WHERE rn = 1""".stripMargin
  }

  /** Incremental dedup: the odd-id half of the corpus ingested AGAINST
    * the even-id half as the existing reference — survivors are
    * incoming docs with no exact or near duplicate in the reference
    * (in-batch duplicates deliberately kept).
    */
  def qDedupIncr(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Dedup.dropDuplicatesAgainst(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text")
      .select(col("doc_id"), col("source"))
  }

  val qDedupIncrSql: String = {
    s"""WITH t AS (SELECT doc_id, source, md5($normSql) AS fp, $toksSql AS toks
       |           FROM documents),
       |inc AS (SELECT * FROM t WHERE doc_id % 2 = 1),
       |ref AS (SELECT * FROM t WHERE doc_id % 2 = 0),
       |exsurv AS (
       |  -- NOT EXISTS, not NOT IN: the Spark side is a left_anti join,
       |  -- which KEEPS a null-fp incoming row (null matches nothing),
       |  -- while NOT IN over a subquery containing any NULL returns
       |  -- zero rows — the two diverge on corpora with null text.
       |  SELECT * FROM inc
       |  WHERE NOT EXISTS (SELECT 1 FROM ref WHERE ref.fp = inc.fp)),
       |increp AS (SELECT fp, min(doc_id) AS doc_id FROM exsurv GROUP BY 1),
       |refrep AS (SELECT fp, min(doc_id) AS doc_id FROM ref GROUP BY 1),
       |isg AS (
       |  SELECT e.fp, ${shinglesSql("e.toks")} AS grams
       |  FROM exsurv e JOIN increp USING (fp, doc_id)),
       |rsg AS (
       |  SELECT r.doc_id, ${shinglesSql("r.toks")} AS grams
       |  FROM ref r JOIN refrep USING (fp, doc_id)),
       |isigs AS (SELECT fp, ${minhashSql("grams")} AS sig FROM isg),
       |rsigs AS (SELECT doc_id, ${minhashSql("grams")} AS sig FROM rsg),
       |ibuckets AS (${bandSelectsSql("isigs", "fp")}),
       |rbuckets AS (${bandSelectsSql("rsigs", "doc_id")}),
       |dropfp AS (
       |  SELECT DISTINCT a.fp
       |  FROM ibuckets a JOIN rbuckets b ON a.bucket = b.bucket
       |  WHERE len(list_filter(range(1, ${Dedup.minhashCoeffs.size} + 1),
       |        i -> a.sig[i] = b.sig[i])) * 1.0 / ${Dedup.minhashCoeffs.size} >= 0.75)
       |SELECT doc_id, source FROM exsurv
       |WHERE NOT EXISTS (SELECT 1 FROM dropfp WHERE dropfp.fp = exsurv.fp)""".stripMargin
  }

  /** 60-bit SimHash fingerprints (native kernel). */
  def qSimhash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"), Dedup.simhash(col("text")).as("simhash"))

  /** DuckDB CTE computing (doc_id, simhash) — shared by the
    * fingerprint and candidate-pair oracles.
    */
  private[queries] val simhashCteSql: String = {
    val terms = (0 until Dedup.simhashBits).map { k =>
      s"""(CASE WHEN list_sum(list_transform(hs,
         |   h -> CASE WHEN (h >> $k) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         | THEN cast(${1L << k} as bigint) ELSE 0 END)""".stripMargin
    }.mkString(" +\n")
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |h AS (SELECT doc_id, list_transform(toks, tk -> ${hash60Sql("tk")}) AS hs FROM t),
       |sh AS (SELECT doc_id, $terms AS simhash FROM h)""".stripMargin
  }

  val qSimhashSql: String =
    s"""WITH $simhashCteSql
       |SELECT doc_id, simhash FROM sh""".stripMargin

  /** SimHash near-dup pairs (hamming ≤ 3) via the pigeonhole band
    * blocking — the pair-generation complement to q_simhash.
    */
  def qSimhashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.simhashCandidates(Tables.documents(s, d), "doc_id", "text",
      maxHamming = 3)

  val qSimhashPairsSql: String = {
    val bands = Dedup.simhashBandLayout(maxHamming = 3).zipWithIndex.map {
      case ((shift, width), b) =>
        s"""SELECT doc_id, simhash,
           |  '$b' || '_' || ((simhash >> $shift) & ${(1L << width) - 1})
           |    AS bucket FROM sh""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $simhashCteSql,
       |banded AS (
       |$bands)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.bucket = b.bucket AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
  }

  /** SimHash near-dup pairs through the compound PAIR-BAND blocking
    * ([[graft.dedup.Dedup.simhashCandidatesScaled]]: maxHamming+2
    * bands, C(5,2) 24-bit compound keys — occupancy ÷2^12 vs the
    * single-band layout, the corpus-scale path of the knob audit).
    * Output contract: EXACTLY the q_simhash_pairs set — pigeonhole
    * candidate generation is exact either way — so the oracle is the
    * INDEPENDENT single-band derivation: a blocking bug that drops a
    * candidate (the failure mode compound keys could introduce)
    * hash-mismatches instead of replaying consistently-wrong.
    */
  def qSimhashScaled(s: SparkSession, d: String): DataFrame =
    Dedup.simhashCandidatesScaled(Tables.documents(s, d), "doc_id", "text",
      maxHamming = 3)

  val qSimhashScaledSql: String = qSimhashPairsSql

  /** n-gram Jaccard near-dup pairs, blocked by (source, length bucket) —
    * the length bucket bounds pair count at scale (near-dups have
    * near-equal length).
    */
  def qNgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(
      Tables.documents(s, d)
        .withColumn("len_bucket", floor(col("n_chars") / 200)),
      "doc_id", "text", blockCols = Seq("source", "len_bucket"), threshold = 0.2)

  val qNgramJaccardSql: String =
    s"""WITH t AS (SELECT doc_id, source, cast(floor(n_chars / 200) as bigint) AS len_bucket,
       |           $toksSql AS toks FROM documents),
       |g AS (SELECT doc_id, source, len_bucket, ${shinglesSql("toks")} AS grams FROM t)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  round(len(list_intersect(a.grams, b.grams)) * 1.0 /
       |        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
       |        6) AS jaccard
       |FROM g a JOIN g b ON a.source = b.source AND a.len_bucket = b.len_bucket
       |  AND a.doc_id < b.doc_id
       |WHERE round(len(list_intersect(a.grams, b.grams)) * 1.0 /
       |        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
       |        6) >= 0.2""".stripMargin

  /** Exact all-pairs Jaccard ≥ 0.9 over distinct hashed whitespace
    * tokens via prefix filtering ([[graft.dedup.AllPairs]]) — the
    * no-false-negative dedup pass (vs q_minhash_pairs' probabilistic
    * recall). The oracle brute-forces candidates from the full token
    * postings; the engine's prefix filter must reproduce it exactly.
    * 0.9 is the production near-dup bar; on this synthetic corpus it
    * also keeps output quadratics at bay (the generator's shared
    * vocabulary puts >70% of ALL pairs above jaccard 0.5).
    */
  def qAllPairs(s: SparkSession, d: String): DataFrame =
    graft.dedup.AllPairs.pairs(Tables.documents(s, d), "doc_id", "text",
      threshold = 0.9)

  val qAllPairsSql: String =
    s"""WITH t AS (SELECT doc_id,
       |  list_distinct(list_transform($toksSql,
       |    tk -> ${hash60Sql("tk")} % 2147483647)) AS hs FROM documents),
       |e AS (SELECT doc_id, u.h FROM t, unnest(hs) AS u(h)),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id),
       |j AS (SELECT id_a, id_b,
       |    len(list_intersect(ta.hs, tb.hs)) * 1.0 /
       |      (len(ta.hs) + len(tb.hs) - len(list_intersect(ta.hs, tb.hs)))
       |      AS jac
       |  FROM cand JOIN t ta ON id_a = ta.doc_id
       |    JOIN t tb ON id_b = tb.doc_id)
       |SELECT id_a, id_b, round(jac, 6) AS jaccard FROM j
       |WHERE jac >= 0.9""".stripMargin

  /** Output-bounded all-pairs report: each doc's 3 strongest exact-
    * Jaccard neighbors ≥ 0.9 — the Θ(N·k) serving shape for the one
    * query family whose TRUE result set grows quadratically on
    * duplicate-dense corpora (`AllPairs.topKNeighbors` scaladoc). The
    * verified pair stream feeds a bounded TopKAgg heap: nothing
    * Θ(pairs) is shuffled in full or materialized.
    */
  def qAllPairsTopK(s: SparkSession, d: String): DataFrame =
    graft.dedup.AllPairs.topKNeighbors(Tables.documents(s, d), "doc_id",
      "text", threshold = 0.9, k = 3)

  // the pair CTE is referenced twice by the symmetric union — force it
  // MATERIALIZED or DuckDB 1.0 inlines the whole chain per reference
  // (the round-12 oracle lesson)
  val qAllPairsTopKSql: String =
    s"""WITH p AS MATERIALIZED ($qAllPairsSql),
       |sym AS (SELECT id_a AS id, id_b AS nbr, jaccard FROM p
       |  UNION ALL SELECT id_b AS id, id_a AS nbr, jaccard FROM p),
       |r AS (SELECT id, nbr, jaccard, row_number() OVER (
       |    PARTITION BY id
       |    ORDER BY CAST(round(jaccard * 1000000) AS BIGINT) DESC, nbr ASC)
       |    AS rk FROM sym)
       |SELECT id, CAST(rk AS INT) AS rank, nbr,
       |  CAST(round(jaccard * 1000000) AS BIGINT) / 1000000.0 AS jaccard
       |FROM r WHERE rk <= 3""".stripMargin

  /** Seeded-sample twin of [[qAllPairs]]: the exact neighbor list of
    * the 1/101 hash-sampled probe docs against the WHOLE corpus
    * ([[graft.dedup.AllPairs.neighborsFor]]). Purpose: an oracle
    * gate for the output-bound family at scale factors where the
    * full pair CTE is out of DuckDB's reach (sf1's ~9×10⁷ rows) —
    * the oracle's candidate join carries the sampled probe side
    * only, so its cost is corpus/101. Runs at every SF like any
    * other gate.
    */
  def qAllPairsSample(s: SparkSession, d: String): DataFrame =
    graft.dedup.AllPairs.neighborsFor(Tables.documents(s, d), "doc_id",
      "text", threshold = 0.9, probePred = _ % 101 === 0)

  val qAllPairsSampleSql: String =
    s"""WITH t AS (SELECT doc_id,
       |  list_distinct(list_transform($toksSql,
       |    tk -> ${hash60Sql("tk")} % 2147483647)) AS hs FROM documents),
       |e AS (SELECT doc_id, u.h FROM t, unnest(hs) AS u(h)),
       |cand AS (SELECT DISTINCT a.doc_id AS id, b.doc_id AS nbr
       |  FROM e a JOIN e b ON a.h = b.h AND a.doc_id <> b.doc_id
       |  WHERE a.doc_id % 101 = 0),
       |j AS (SELECT id, nbr,
       |    len(list_intersect(ta.hs, tb.hs)) * 1.0 /
       |      (len(ta.hs) + len(tb.hs) - len(list_intersect(ta.hs, tb.hs)))
       |      AS jac
       |  FROM cand JOIN t ta ON id = ta.doc_id
       |    JOIN t tb ON nbr = tb.doc_id)
       |SELECT id, nbr, round(jac, 6) AS jaccard FROM j
       |WHERE jac >= 0.9""".stripMargin

  /** Top-3 serving readout over the sampled probes — the bounded
    * oracle for [[qAllPairsTopK]]'s Θ(N·k) contract at sf1
    * ([[graft.dedup.AllPairs.topKNeighborsFor]]): per-probe top-k
    * against the whole corpus, verified row-for-row where the full
    * report's oracle cannot be replayed.
    */
  def qAllPairsTopKSample(s: SparkSession, d: String): DataFrame =
    graft.dedup.AllPairs.topKNeighborsFor(Tables.documents(s, d), "doc_id",
      "text", threshold = 0.9, k = 3, probePred = _ % 101 === 0)

  val qAllPairsTopKSampleSql: String =
    s"""WITH p AS MATERIALIZED ($qAllPairsSampleSql),
       |r AS (SELECT id, nbr, jaccard, row_number() OVER (
       |    PARTITION BY id
       |    ORDER BY CAST(round(jaccard * 1000000) AS BIGINT) DESC, nbr ASC)
       |    AS rk FROM p)
       |SELECT id, CAST(rk AS INT) AS rank, nbr,
       |  CAST(round(jaccard * 1000000) AS BIGINT) / 1000000.0 AS jaccard
       |FROM r WHERE rk <= 3""".stripMargin

  /** Count-min token-frequency estimates for the 20 most frequent
    * tokens (exact counts alongside; est ≥ exact by construction).
    * Deterministic cross-engine like the other sketches.
    */
  def qCmsTokens(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.CountMin
    val toks = Tables.documents(s, d)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok").asc).limit(20)
    CountMin.estimate(toks, exact.select(col("tok")), Seq.empty, "tok", w = 256)
      .join(exact, Seq("tok"))
      .select(col("tok"), col("n_exact"), col("est_count"))
  }

  val qCmsTokensSql: String =
    graft.sketch.CountMin.tokenOracleSql("documents", "text", w = 256, topN = 20)

  /** GROUPED count-min estimates: each of the 10 globally most
    * frequent tokens estimated against every source's own counter
    * table — the per-group sketch contract (absent counters → 0,
    * one-sided error per group, not across groups).
    */
  def qCmsGrouped(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.CountMin
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val items = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(10)
      .select(col("tok"))
    CountMin.estimate(toks, items, Seq("source"), "tok", w = 256)
      .select(col("tok"), col("source"), col("est_count"))
  }

  val qCmsGroupedSql: String =
    graft.sketch.CountMin.groupedTokenOracleSql(
      "documents", "text", "source", w = 256, topN = 10)

  /** TF-IDF cosine similar-pairs over a df-capped vocabulary:
    * fixed-point weights → exact decimal dots/norms → one rounded
    * double division per pair (see [[graft.sim.TfIdf]]).
    */
  def qTfidfPairs(s: SparkSession, d: String): DataFrame =
    graft.sim.TfIdf.similarPairs(Tables.documents(s, d), "doc_id", "text",
      threshold = 0.3, maxDf = 100)

  val qTfidfPairsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, u.tok FROM documents, unnest($toksSql) AS u(tok)),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
       |nd AS (SELECT count(*) AS n FROM documents),
       |vocab AS (
       |  SELECT tok, count(*) AS df_t FROM tf GROUP BY 1
       |  HAVING count(*) <= 100),
       |w AS (
       |  SELECT doc_id, tok,
       |    cast(floor(tf * round(ln((n + 1.0) / (df_t + 1.0)) + 1.0, 6)
       |      * ${graft.sim.TfIdf.Scale} + 0.5) as bigint) AS w
       |  FROM tf JOIN vocab USING (tok) CROSS JOIN nd),
       |nrm AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY 1),
       |dots AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
       |  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT id_a, id_b,
       |    round(cast(dot as double) /
       |      (sqrt(cast(na.n2 as double)) * sqrt(cast(nb.n2 as double))), 6)
       |      AS cos_sim
       |  FROM dots
       |  JOIN nrm na ON na.doc_id = id_a
       |  JOIN nrm nb ON nb.doc_id = id_b)
       |SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.3""".stripMargin
}
