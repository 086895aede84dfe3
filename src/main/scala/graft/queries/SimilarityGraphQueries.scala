package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Ann
import graft.text.{Bm25, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-similarity (ANN/IVF/PQ/SQ), clustering, and graph
  * analytics (PageRank, LPA, k-core, SSSP) queries.
  *
  * Part of the [[PipelineQueries]] linear trait chain: each trait
  * extends the previous one, so member initialization order and
  * visibility are IDENTICAL to the former single-object layout (the
  * chain is a file split, not an architecture: everything still
  * composes into the one PipelineQueries object).
  */
private[queries] trait SimilarityGraphQueries extends DedupQueries {
  // ---------------------------------------------------------- similarity

  /** Brute-force cosine top-3 for a small query set (vec_id < 8). */
  /** Per-dimension embedding statistics ([[graft.sim.VecStats]]) —
    * the quantizer-preprocessing pass: centering means, variances for
    * subspace balance, SQ dynamic ranges. One pass, dim-bounded
    * output; oracle replays the 6/9dp quantization + decimal sums.
    */
  def qDimStats(s: SparkSession, d: String): DataFrame =
    graft.sim.VecStats.dimStats(Tables.embeddings(s, d), "embedding")

  val qDimStatsSql: String =
    """WITH c AS (
      |  SELECT u.d AS dim, cast(u.x as double) AS x
      |  FROM (SELECT unnest(list_transform(range(1, len(embedding) + 1),
      |          i -> {'d': i - 1, 'x': embedding[i]})) AS u
      |        FROM embeddings)
      |  WHERE u.x IS NOT NULL),
      |g AS (
      |  SELECT dim, count(*) AS n,
      |    sum(cast(round(x, 6) as decimal(18,6))) AS s1,
      |    sum(cast(round(x * x, 9) as decimal(27,9))) AS s2,
      |    min(x) AS lo, max(x) AS hi
      |  FROM c GROUP BY 1),
      |m AS (SELECT dim, n, round(cast(s1 as double) / n, 6) AS mean,
      |        s2, lo, hi FROM g)
      |SELECT dim, n, mean,
      |  round(greatest(cast(s2 as double) / n - mean * mean, 0), 6)
      |    AS variance,
      |  lo, hi
      |FROM m""".stripMargin

  def qAnnTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  val qAnnTopKSql: String = {
    // dot products fold left-to-right via list_reduce to match Spark's
    // functions.aggregate exactly (bit-for-bit double math)
    def dot(a: String, b: String) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |  list_transform(range(1, len($a) + 1),
         |    i -> cast($a[i] as double) * cast($b[i] as double))),
         |  (acc, v) -> acc + v)""".stripMargin
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
       |sims AS (
       |  SELECT query_id, neighbor_id,
       |    CASE WHEN sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")}) > 0
       |      THEN ${dot("qv", "cv")} /
       |           (sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")}))
       |      ELSE 0.0 END AS sim_raw
       |  FROM c CROSS JOIN q
       |  WHERE neighbor_id <> query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_raw DESC, neighbor_id ASC) AS rank
       |  FROM sims)
       |SELECT query_id, neighbor_id, round(sim_raw, 6) AS sim, rank
       |FROM ranked WHERE rank <= 3""".stripMargin
  }

  /** LSH-bucketed approximate top-3 — the hyperplanes are deterministic
    * constants shared with the oracle SQL (inlined literal arrays), so
    * even the approximate path is hash-verified.
    */
  def qAnnLsh(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.lshBucketTopK(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  val qAnnLshSql: String = {
    // bucket key: sign bit per plane, matching Ann.lshKey's left-fold dot
    val keyExpr = lshKeySql("embedding", 8)
    def dot(a: String, b: String) = listDotSql(a, b)
    s"""WITH keyed AS (
       |  SELECT vec_id, embedding, $keyExpr AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket
       |      FROM keyed WHERE vec_id < 8),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM keyed),
       |sims AS (
       |  SELECT query_id, neighbor_id,
       |    CASE WHEN sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")}) > 0
       |      THEN ${dot("qv", "cv")} /
       |           (sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")}))
       |      ELSE 0.0 END AS sim_raw
       |  FROM c JOIN q USING (bucket)
       |  WHERE neighbor_id <> query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_raw DESC, neighbor_id ASC) AS rank
       |  FROM sims)
       |SELECT query_id, neighbor_id, round(sim_raw, 6) AS sim, rank
       |FROM ranked WHERE rank <= 3""".stripMargin
  }

  /** Multi-probe LSH approximate top-3: the query probes its own sign
    * bucket plus the 8 Hamming-1 buckets — the recall repair without
    * extra hash tables, hash-verified like the single-bucket path.
    */
  def qAnnMultiprobe(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.lshMultiProbeTopK(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  val qAnnMultiprobeSql: String = {
    val h = 8
    val keyExpr = lshKeySql("embedding", h)
    def dot(a: String, b: String) = listDotSql(a, b)
    s"""WITH keyed AS (
       |  SELECT vec_id, embedding, $keyExpr AS bucket FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS qv,
       |    unnest(list_distinct(list_prepend(bucket,
       |      list_transform(range(1, $h + 1), i ->
       |        substr(bucket, 1, cast(i - 1 as bigint)) ||
       |        (CASE WHEN substr(bucket, cast(i as bigint), 1) = '1'
       |          THEN '0' ELSE '1' END) ||
       |        substr(bucket, cast(i + 1 as bigint), $h))))) AS bucket
       |  FROM keyed WHERE vec_id < 8),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM keyed),
       |sims AS (
       |  SELECT query_id, neighbor_id,
       |    CASE WHEN sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")}) > 0
       |      THEN ${dot("qv", "cv")} /
       |           (sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")}))
       |      ELSE 0.0 END AS sim_raw
       |  FROM c JOIN q USING (bucket)
       |  WHERE neighbor_id <> query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_raw DESC, neighbor_id ASC) AS rank
       |  FROM sims)
       |SELECT query_id, neighbor_id, round(sim_raw, 6) AS sim, rank
       |FROM ranked WHERE rank <= 3""".stripMargin
  }

  /** Recall@k + reciprocal rank of the single-bucket LSH run against
    * the exact brute-force answer on the same 8 queries — the ANN
    * tuning loop as a first-class, hash-verified query.
    */
  def qAnnRecall(s: SparkSession, d: String): DataFrame =
    graft.sim.RetrievalEval.vsExact(qAnnTopK(s, d), qAnnLsh(s, d))

  // lazy: composes qAnnTopKSql/qAnnLshSql, and qAnnTopKSql is
  // declared later in the object
  lazy val qAnnRecallSql: String =
    s"""WITH ex AS (
       |$qAnnTopKSql),
       |ap AS (
       |$qAnnLshSql),
       |j AS (SELECT ex.query_id, ex.neighbor_id, ap.rank AS ap_rank
       |      FROM ex LEFT JOIN ap USING (query_id, neighbor_id))
       |SELECT query_id, count(*) AS n_exact,
       |  cast(sum(CASE WHEN ap_rank IS NOT NULL THEN 1 ELSE 0 END) as bigint)
       |    AS n_hit,
       |  round(cast(sum(CASE WHEN ap_rank IS NOT NULL THEN 1 ELSE 0 END)
       |      as double) / cast(count(*) as double), 6) AS recall,
       |  round(coalesce(1.0 / cast(min(ap_rank) as double), 0.0), 6) AS rr
       |FROM j GROUP BY 1""".stripMargin

  /** IVF-Flat approximate top-3: deterministic sampled centroids,
    * nprobe-cell search — the inverted-file scale path next to the LSH
    * one. Everything (assignment, probing, scoring) is left-fold dot
    * products, so even the cell partitioning is hash-verified.
    */
  def qAnnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.ivfTopK(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 3, nlist = 16, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  val qAnnIvfSql: String = {
    def dot(a: String, b: String) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |  list_transform(range(1, len($a) + 1),
         |    i -> cast($a[i] as double) * cast($b[i] as double))),
         |  (acc, v) -> acc + v)""".stripMargin
    def cos(a: String, b: String) =
      s"""CASE WHEN sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}) > 0
         |  THEN ${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))
         |  ELSE 0.0 END""".stripMargin
    s"""WITH cent AS (
       |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  ORDER BY cast(('0x' || substr(md5(cast(vec_id as varchar)), 1, 15)) as bigint),
       |           vec_id
       |  LIMIT 16),
       |asg AS (
       |  SELECT neighbor_id, cvec, cid FROM (
       |    SELECT e.vec_id AS neighbor_id, e.embedding AS cvec, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("e.embedding", "c.cv")} DESC, c.cid ASC) AS r
       |    FROM embeddings e CROSS JOIN cent c) WHERE r = 1),
       |probe AS (
       |  SELECT query_id, qvec, cid FROM (
       |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cos("q.embedding", "c.cv")} DESC, c.cid ASC) AS r
       |    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 8) WHERE r <= 4),
       |sims AS (
       |  SELECT query_id, neighbor_id, ${cos("qvec", "cvec")} AS sim_raw
       |  FROM probe JOIN asg USING (cid)
       |  WHERE neighbor_id <> query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_raw DESC, neighbor_id ASC) AS rank
       |  FROM sims)
       |SELECT query_id, neighbor_id, round(sim_raw, 6) AS sim, rank
       |FROM ranked WHERE rank <= 3""".stripMargin
  }

  /** Embedding-cosine near-dup pairs at the ADAPTIVE blocking config
    * (3 tables × count-derived sign planes, floor 12 = 4,096
    * buckets/table at bench SFs, one extra plane per corpus doubling
    * past 65k vectors — Dedup.embedPlanes), OR-amplified for recall,
    * rounded-cosine threshold — the semantic-dedup complement to the
    * shingle-based paths. The corpus has no true duplicates, so the
    * threshold sits at the top of the observed similarity range to
    * exercise a non-trivial result. The oracle derives the SAME plane
    * count from a scalar-subquery count and masks each table's full
    * EmbedMaxPlanes sign key down by string prefix — structurally
    * static SQL, occupancy-constant blocking at any SF (the knn-seed
    * masked-key discipline).
    */
  def qEmbedDup(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
      threshold = 0.35)

  val qEmbedDupSql: String = {
    val numTables = 3
    def planeLit(p: Seq[Double]) = p.mkString("[", ",", "]")
    def dotPlane(v: String, p: Seq[Double]) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |  list_transform(range(1, 65),
         |    i -> cast($v[i] as double) * (${planeLit(p)})[i])),
         |  (acc, x) -> acc + x)""".stripMargin
    // table t's bucket key: sign pattern over the first P planes of
    // the FIXED stride block [t*EmbedMaxPlanes, (t+1)*EmbedMaxPlanes)
    // — all EmbedMaxPlanes signs computed, substr-masked to the
    // derived P — prefixed with the table index; same layout as
    // Dedup.embeddingNearDupPairs
    def keyExpr(t: Int) = {
      val signs = (0 until Dedup.EmbedMaxPlanes).map { i =>
        val p = Ann.hyperplane(t * Dedup.EmbedMaxPlanes + i, 64)
        s"(CASE WHEN ${dotPlane("embedding", p)} >= 0 THEN '1' ELSE '0' END)"
      }.mkString(" || ")
      s"'$t' || '_' || substr(($signs), 1, (SELECT p FROM pe))"
    }
    val planeCase = {
      import graft.dedup.Dedup.{EmbedMinPlanes, EmbedMaxPlanes, EmbedTargetOccupancy}
      val whens = (EmbedMinPlanes until EmbedMaxPlanes)
        .map(p => s"WHEN cnt <= ${EmbedTargetOccupancy << p} THEN $p")
        .mkString(" ")
      s"CASE $whens ELSE $EmbedMaxPlanes END"
    }
    val tableSelects = (0 until numTables).map { t =>
      s"SELECT vec_id, embedding, ${keyExpr(t)} AS bucket FROM embeddings"
    }.mkString("\nUNION ALL\n")
    def dot(a: String, b: String) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |  list_transform(range(1, len($a) + 1),
         |    i -> cast($a[i] as double) * cast($b[i] as double))),
         |  (acc, v) -> acc + v)""".stripMargin
    def cos(a: String, b: String) =
      s"""CASE WHEN sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}) > 0
         |  THEN ${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))
         |  ELSE 0.0 END""".stripMargin
    s"""WITH pe AS MATERIALIZED (SELECT $planeCase AS p
       |  FROM (SELECT count(*) AS cnt FROM embeddings)),
       |keyed AS (
       |$tableSelects),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       |    round(${cos("a.embedding", "b.embedding")}, 6) AS cos_sim
       |  FROM keyed a JOIN keyed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.35""".stripMargin
  }

  /** Deterministic Lloyd's k-means over the embedding corpus — the
    * semantic-clustering stage (cluster first, pairwise within clusters
    * only). Even the ITERATIVE trainer is hash-verified against DuckDB:
    * the integer-quantized centroid update makes every iteration
    * order-independent, so three full Lloyd rounds replay exactly in
    * SQL.
    */
  def qKmeans(s: SparkSession, d: String): DataFrame =
    graft.sim.KMeans.fitAssign(Tables.embeddings(s, d), "vec_id", "embedding",
      k = 8, iters = 3)

  /** Unrolled-Lloyd CTE prologue shared by the k-means and SemDeDup
    * oracles: a complete `WITH` list ending at `asg{iters+1}`, the
    * final (vec_id, x, cluster, dist2) assignment. Callers append
    * either a bare `SELECT` or further `,`-separated CTEs.
    */
  /** `trainWhere`: optional vec_id predicate restricting the TRAINING
    * rows (init draw + every Lloyd round) to a deterministic
    * hash-sample, while the final assignment CTE still covers the full
    * corpus — the bounded-sample training contract quantizer training
    * uses at scale (see the q_pq_* scaladocs).
    */
  /** `kLimitSql`: optional SQL expression overriding the literal `k`
    * in the init draw's LIMIT — lets an oracle derive k from the data
    * (a scalar subquery) exactly as the engine does, so the SQL stays
    * correct at EVERY scale factor instead of baking in one SF's k.
    */
  private[queries] def kmeansCtes(k: Int, iters: Int,
      trainWhere: Option[String] = None,
      kLimitSql: Option[String] = None): String = {
    // left-fold dot of two 64-dim lists, matching graft.functions.DotFold
    def dot(a: String, b: String) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |      list_transform(range(1, 65),
         |        i -> cast($a[i] as double) * cast($b[i] as double))),
         |      (acc, v) -> acc + v)""".stripMargin
    // one Lloyd round: nearest-centroid assignment (ties to the lower
    // cluster id), then per-(cluster, dim) exact integer mean update;
    // clusters that attract no rows keep their previous centroid
    val tBase = if (trainWhere.isDefined) "tb" else "b"
    def asg(n: Int, cent: String, base: String) =
      s"""asg$n AS (
         |  SELECT vec_id, x, cluster, dist2 FROM (
         |    SELECT vec_id, x, cluster, dist2,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY dist2 ASC, cluster ASC) AS r
         |    FROM (SELECT b.vec_id, b.x, c.cluster,
         |            b.xx - 2 * ${dot("b.x", "c.cv")} + ${dot("c.cv", "c.cv")} AS dist2
         |          FROM $base b CROSS JOIN $cent c))
         |  WHERE r = 1)""".stripMargin
    def upd(n: Int) =
      s"""upd$n AS (
         |  SELECT cluster, d.i AS dim,
         |    sum(cast(round(cast(x[d.i] as double) * ${graft.sim.KMeans.Scale}) as bigint)) AS sq,
         |    count(*) AS cnt
         |  FROM asg$n, unnest(range(1, 65)) AS d(i)
         |  GROUP BY cluster, d.i),
         |cent$n AS (
         |  SELECT c.cluster,
         |    CASE WHEN min(u.dim) IS NULL THEN c.cv
         |         ELSE list(cast(u.sq as double) / u.cnt / ${graft.sim.KMeans.Scale}.0
         |                   ORDER BY u.dim) END AS cv
         |  FROM cent${n - 1} c LEFT JOIN upd$n u USING (cluster)
         |  GROUP BY c.cluster, c.cv)""".stripMargin
    val rounds = (1 to iters).map(n => s"${asg(n, s"cent${n - 1}", tBase)},\n${upd(n)}")
      .mkString(",\n")
    val tb = trainWhere
      .map(w => s"\ntb AS (SELECT * FROM b WHERE $w),").getOrElse("")
    s"""WITH b AS (
       |  SELECT vec_id, embedding AS x, ${dot("embedding", "embedding")} AS xx
       |  FROM embeddings),$tb
       |cent0 AS (
       |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cluster, x AS cv
       |  FROM (SELECT vec_id, x,
       |          cast(('0x' || substr(md5(cast(vec_id as varchar)), 1, 15)) as bigint) AS h
       |        FROM $tBase ORDER BY h, vec_id LIMIT ${kLimitSql.getOrElse(k.toString)})),
       |$rounds,
       |${asg(iters + 1, s"cent$iters", "b")}""".stripMargin
  }

  val qKmeansSql: String =
    s"""${kmeansCtes(8, 3)}
       |SELECT vec_id, cluster, round(greatest(dist2, 0.0), 6) AS dist2
       |FROM asg4""".stripMargin

  /** Clustering-quality eval: per-cluster label purity (majority-label
    * share against the embeddings' ground-truth label column) plus the
    * corpus-level purity — the MEASURED answer to "did k-means find
    * the label structure", the same close-the-loop discipline as
    * q_ann_recall/q_calibration. Majority pick is the integer
    * struct-max (count desc, label asc), purity one rounded division;
    * the oracle replays the full Lloyd training (kmeansCtes) and the
    * eval. Scale: the eval adds one broadcast label join and a
    * k-row aggregation on top of the assignment pass.
    */
  def qClusterPurity(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val asg = graft.sim.KMeans.fitAssign(emb, "vec_id", "embedding",
      k = 8, iters = 3).select(col("vec_id"), col("cluster"))
    val counts = asg
      .join(emb.select(col("vec_id"), col("label").cast("long").as("label")),
        Seq("vec_id"))
      .groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("c"))
    val per = counts.groupBy(col("cluster"))
      .agg(sum(col("c")).as("n"),
        max(struct(col("c"), (-col("label")).as("nl"))).as("w"))
      .select(col("cluster"), col("n"),
        (-col("w.nl")).as("major_label"), col("w.c").as("major_n"),
        round(col("w.c").cast("double") / col("n").cast("double"), 6)
          .as("purity"))
    val overall = per.agg(sum(col("major_n")).as("sm"), sum(col("n")).as("sn"))
      .select(round(col("sm").cast("double") / col("sn").cast("double"), 6)
        .as("overall_purity"))
    per.crossJoin(broadcast(overall))
  }

  val qClusterPuritySql: String =
    s"""${kmeansCtes(8, 3)},
       |lab AS (
       |  SELECT a.cluster, CAST(e.label AS BIGINT) AS label
       |  FROM asg4 a JOIN embeddings e USING (vec_id)),
       |cnt AS (SELECT cluster, label, count(*) AS c FROM lab GROUP BY 1, 2),
       |mj AS (SELECT cluster, label AS major_label, c AS major_n FROM (
       |  SELECT cluster, label, c, row_number() OVER (PARTITION BY cluster
       |    ORDER BY c DESC, label ASC) AS rn FROM cnt) WHERE rn = 1),
       |tot AS (SELECT cluster, CAST(sum(c) AS BIGINT) AS n
       |        FROM cnt GROUP BY 1),
       |ov AS (SELECT round(CAST(sum(major_n) AS DOUBLE) /
       |         CAST(sum(n) AS DOUBLE), 6) AS overall_purity
       |       FROM mj JOIN tot USING (cluster))
       |SELECT t.cluster, t.n, m.major_label, CAST(m.major_n AS BIGINT)
       |    AS major_n,
       |  round(CAST(m.major_n AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS purity,
       |  ov.overall_purity
       |FROM tot t JOIN mj m USING (cluster) CROSS JOIN ov""".stripMargin

  /** IVF index APPEND — the index-maintenance primitive a 100 TB
    * embedding store lives on: new vectors (the odd-vec_id delta) are
    * assigned into an index whose coarse centroids were trained on
    * the EXISTING corpus (the even-vec_id half) WITHOUT retraining —
    * training cost is paid once per index epoch, and a delta batch is
    * one narrow literal-centroid argmin pass over the delta alone (no
    * shuffle, no join, no touch of the existing corpus). The oracle
    * replays the even-half training and the odd-half assignment
    * bit-for-bit.
    */
  def qIvfAppend(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val m = graft.sim.KMeans.fit(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", k = 8, iters = 3)
    graft.sim.KMeans.assignDist(emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", m)
  }

  val qIvfAppendSql: String =
    s"""${kmeansCtes(8, 3, Some("vec_id % 2 = 0"))}
       |SELECT vec_id, cluster, round(greatest(dist2, 0.0), 6) AS dist2
       |FROM asg4 WHERE vec_id % 2 = 1""".stripMargin

  /** One SUBSPACE's unrolled-Lloyd CTE chain for the PQ oracle —
    * [[kmeansCtes]] generalized to a `[start, start+w)` slice of the
    * embedding and `p`-prefixed CTE names so m independent chains can
    * share one WITH list. Returns the chain WITHOUT the leading WITH;
    * the final assignment CTE is `${p}asg${iters + 1}`.
    */
  private[queries] def pqSubspaceCtes(p: String, start: Int, w: Int, k: Int,
      iters: Int, src: String = "embeddings", vec: String = "embedding",
      trainWhere: Option[String] = None): String = {
    def dot(a: String, b: String) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |      list_transform(range(1, ${w + 1}),
         |        i -> cast($a[i] as double) * cast($b[i] as double))),
         |      (acc, v) -> acc + v)""".stripMargin
    val tBase = if (trainWhere.isDefined) s"${p}tb" else s"${p}b"
    def asg(n: Int, cent: String, base: String) =
      s"""${p}asg$n AS (
         |  SELECT vec_id, x, cluster, dist2 FROM (
         |    SELECT vec_id, x, cluster, dist2,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY dist2 ASC, cluster ASC) AS r
         |    FROM (SELECT b.vec_id, b.x, c.cluster,
         |            b.xx - 2 * ${dot("b.x", "c.cv")} + ${dot("c.cv", "c.cv")} AS dist2
         |          FROM $base b CROSS JOIN $cent c))
         |  WHERE r = 1)""".stripMargin
    def upd(n: Int) =
      s"""${p}upd$n AS (
         |  SELECT cluster, d.i AS dim,
         |    sum(cast(round(cast(x[d.i] as double) * ${graft.sim.KMeans.Scale}) as bigint)) AS sq,
         |    count(*) AS cnt
         |  FROM ${p}asg$n, unnest(range(1, ${w + 1})) AS d(i)
         |  GROUP BY cluster, d.i),
         |${p}cent$n AS (
         |  SELECT c.cluster,
         |    CASE WHEN min(u.dim) IS NULL THEN c.cv
         |         ELSE list(cast(u.sq as double) / u.cnt / ${graft.sim.KMeans.Scale}.0
         |                   ORDER BY u.dim) END AS cv
         |  FROM ${p}cent${n - 1} c LEFT JOIN ${p}upd$n u USING (cluster)
         |  GROUP BY c.cluster, c.cv)""".stripMargin
    val rounds = (1 to iters)
      .map(n => s"${asg(n, s"${p}cent${n - 1}", tBase)},\n${upd(n)}")
      .mkString(",\n")
    val tb = trainWhere
      .map(w => s"\n${p}tb AS (SELECT * FROM ${p}b WHERE $w),").getOrElse("")
    s"""${p}b AS (
       |  SELECT vec_id, x, ${dot("x", "x")} AS xx
       |  FROM (SELECT vec_id,
       |          list_transform(range($start, ${start + w}),
       |            i -> cast($vec[i] as double)) AS x
       |        FROM $src)),$tb
       |${p}cent0 AS (
       |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cluster, x AS cv
       |  FROM (SELECT vec_id, x,
       |          cast(('0x' || substr(md5(cast(vec_id as varchar)), 1, 15)) as bigint) AS h
       |        FROM $tBase ORDER BY h, vec_id LIMIT $k)),
       |$rounds,
       |${asg(iters + 1, s"${p}cent$iters", s"${p}b")}""".stripMargin
  }

  /** Deterministic 1-in-4 hash-sample of embedding rows, used as the
    * TRAINING set by every quantizer query (coarse k-means and PQ
    * codebooks) while encode/search always cover the full corpus.
    * This is the contract quantizer training has at scale: Lloyd
    * iterations over 100 TB of embeddings per index build is the wrong
    * shape — production systems fit codebooks on a bounded sample and
    * only ASSIGN the full corpus (one narrow literal-centroid pass
    * here). The sample is the same subset-invariant hash-coordinate
    * draw as [[graft.ops.Sampling]], so it replays in the oracle.
    */
  private[queries] val pqTrainWhereSql: String =
    s"${graft.ops.Sampling.hash60Sql("cast(vec_id as varchar)")} % 4 < 1"

  private[queries] def pqTrainSample(df: DataFrame): DataFrame =
    df.filter(
      graft.text.TextAnalysis.hash60(col("vec_id").cast(StringType)) % 4 < 1)

  /** Product-quantization encoding: each 64-dim embedding compressed
    * to 4 centroid codes (4 subspaces × 16 dims, k=4 codebooks trained
    * by 2 deterministic Lloyd rounds each) plus the summed
    * quantization error — the vector-compression layer of an IVF-PQ
    * ANN index. Codebooks train on the deterministic 1-in-4 sample
    * ([[pqTrainWhereSql]]); the encode covers every row. The oracle
    * replays all four subspace trainings AND the encode bit-for-bit,
    * so codebook init, integer-quantized updates, and tie-breaking are
    * hash-pinned end to end.
    */
  def qPqEncode(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val model = graft.sim.ProductQuantizer.fit(pqTrainSample(emb),
      "vec_id", "embedding", dims = 64, m = 4, k = 4, iters = 2)
    graft.sim.ProductQuantizer.encode(emb, "vec_id", "embedding", model)
  }

  val qPqEncodeSql: String = {
    val m = 4
    val chains = (0 until m)
      .map(j => pqSubspaceCtes(s"s${j}_", j * 16 + 1, 16, 4, 2,
        trainWhere = Some(pqTrainWhereSql)))
      .mkString(",\n")
    val code = (0 until m).map(j => s"cast(a$j.cluster as varchar)")
      .mkString(" || '-' || ")
    val err = (0 until m).map(j => s"greatest(a$j.dist2, 0.0)")
      .mkString(" + ")
    val joins = (1 until m).map(j => s"JOIN s${j}_asg3 a$j USING (vec_id)")
      .mkString(" ")
    s"""WITH $chains
       |SELECT a0.vec_id, $code AS code, round($err, 6) AS err
       |FROM s0_asg3 a0 $joins""".stripMargin
  }

  /** PQ asymmetric-distance top-10 (the query side of IVF-PQ): the
    * corpus ranked by summed per-subspace lookup-table distances to
    * the lowest-id embedding. Codebook training, the driver-computed
    * ADC tables, AND the top-10 ordering all replay exactly in the
    * oracle — the distance-table arithmetic is the same left-fold
    * formula in both engines, so even the rank boundary is hash-pinned.
    */
  def qPqAdc(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    val model = graft.sim.ProductQuantizer.fit(pqTrainSample(emb),
      "vec_id", "embedding", dims = 64, m = 4, k = 4, iters = 2)
    graft.sim.ProductQuantizer.adcTopK(emb, "vec_id", "embedding",
      model, q, n = 10)
  }

  /** Shared fragments of the PQ ADC oracles (4 subspaces × 16 dims):
    * the 4 unrolled subspace-training chains, the per-subspace ADC
    * distance-table CTEs (query slice vs every cent2 centroid), and
    * the code/distance/join expressions over the final assignments.
    */
  private[queries] def pqChains: String = (0 until 4)
    .map(j => pqSubspaceCtes(s"s${j}_", j * 16 + 1, 16, 4, 2,
      trainWhere = Some(pqTrainWhereSql)))
    .mkString(",\n")

  private[queries] def pqDTables: String = (0 until 4).map { j =>
    val sl = s"list_transform(range(${j * 16 + 1}, ${j * 16 + 17}), i -> cast(embedding[i] as double))"
    s"""d$j AS (
       |  SELECT c.cluster,
       |    q.qq - 2 * ${dotSql("q.x", "c.cv")} + ${dotSql("c.cv", "c.cv")} AS dval
       |  FROM s${j}_cent2 c CROSS JOIN (
       |    SELECT x, ${dotSql("x", "x")} AS qq
       |    FROM (SELECT $sl AS x FROM embeddings
       |          WHERE vec_id = (SELECT min(vec_id) FROM embeddings))) q)""".stripMargin
  }.mkString(",\n")

  private[queries] def pqCodeExpr: String = (0 until 4)
    .map(j => s"cast(a$j.cluster as varchar)").mkString(" || '-' || ")

  private[queries] def pqAdistExpr: String =
    (0 until 4).map(j => s"d$j.dval").mkString(" + ")

  private[queries] def pqJoins: String =
    (1 until 4).map(j => s"JOIN s${j}_asg3 a$j USING (vec_id)")
      .mkString(" ") + " " +
      (0 until 4).map(j => s"JOIN d$j ON a$j.cluster = d$j.cluster")
        .mkString(" ")

  val qPqAdcSql: String =
    // top-10 cut on the UNROUNDED distance (inner ORDER BY + LIMIT),
    // mirroring adcTopK; the outer projection only formats — an outer
    // ORDER BY would bind to the rounded alias and could flip the
    // rank boundary
    s"""WITH $pqChains,
       |$pqDTables
       |SELECT vec_id, code, round(greatest(adist, 0.0), 6) AS adist
       |FROM (
       |  SELECT a0.vec_id, $pqCodeExpr AS code, $pqAdistExpr AS adist
       |  FROM s0_asg3 a0 $pqJoins
       |  ORDER BY adist, vec_id LIMIT 10)""".stripMargin

  /** IVF-ADC search (the composed IVF-PQ query path): a coarse k=8
    * k-means partitions the corpus into cells, the query probes its
    * nprobe=3 nearest cells, and only vectors in those cells are
    * ADC-ranked — at production scale the cell filter is partition
    * pruning that skips (1 − nprobe/nlist) of the corpus before any
    * per-row work. Simplification vs textbook IVF-PQ, documented:
    * codes quantize the raw vectors, not the cell residuals, so one
    * global codebook serves every cell (the residual variant would
    * need per-cell oracle training chains). Coarse training, cell
    * probing, PQ training, and the rank boundary all replay exactly.
    */
  def qPqIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    val coarse = graft.sim.KMeans.fit(pqTrainSample(emb), "vec_id",
      "embedding", k = 8, iters = 3)
    val model = graft.sim.ProductQuantizer.fit(pqTrainSample(emb),
      "vec_id", "embedding", dims = 64, m = 4, k = 4, iters = 2)
    graft.sim.ProductQuantizer.ivfAdcTopK(emb, "vec_id", "embedding",
      coarse, model, q, nprobe = 3, n = 10)
  }

  /** IVF-PQ served from a PERSISTED index table — the write-once /
    * query-many path `q_pq_ivf`'s train-per-query shape grows into at
    * production scale. The index is built (or reused, when layout
    * version + hyperparameters + corpus fingerprint all match) as a
    * cell-partitioned parquet table of PQ codes plus a bounded model
    * table; the probe then loads only the model, picks nprobe cells
    * driver-side, and scans ONLY those `cell=` directories — partition
    * pruning visible in the scan (AnnIndexSpec pins the scanned file
    * list to the probed cells), with no training and no raw vectors in
    * the serving plan. Hyperparameters match `q_pq_ivf` exactly, so
    * the persisted probe must reproduce its ranking bit-for-bit
    * (spec-pinned) and the same oracle replay gates both.
    */
  def qAnnPersisted(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    val params = graft.sim.AnnIndex.Params(dims = 64, coarseK = 8,
      coarseIters = 3, m = 4, k = 4, pqIters = 2, nprobeDefault = 3)
    val path = graft.sim.AnnIndex.defaultPath(d)
    val (models, _) = graft.sim.AnnIndex.ensure(emb, "vec_id", "embedding",
      pqTrainSample(emb), params, path)
    graft.sim.AnnIndex.probe(s, path, models, q, nprobe = 3, n = 10)
  }

  val qPqIvfSql: String =
    s"""${kmeansCtes(8, 3, Some(pqTrainWhereSql))},
       |$pqChains,
       |$pqDTables,
       |qv AS (
       |  SELECT x, ${dotSql("x", "x")} AS qq
       |  FROM (SELECT list_transform(range(1, 65),
       |          i -> cast(embedding[i] as double)) AS x
       |        FROM embeddings
       |        WHERE vec_id = (SELECT min(vec_id) FROM embeddings))),
       |probe AS (
       |  SELECT c.cluster
       |  FROM cent3 c CROSS JOIN qv q
       |  ORDER BY q.qq - 2 * ${dotSql("q.x", "c.cv")} + ${dotSql("c.cv", "c.cv")} ASC,
       |    c.cluster ASC
       |  LIMIT 3),
       |cand AS (
       |  SELECT vec_id FROM asg4
       |  WHERE cluster IN (SELECT cluster FROM probe))
       |SELECT vec_id, code, round(greatest(adist, 0.0), 6) AS adist
       |FROM (
       |  SELECT a0.vec_id, $pqCodeExpr AS code, $pqAdistExpr AS adist
       |  FROM s0_asg3 a0 $pqJoins
       |  WHERE a0.vec_id IN (SELECT vec_id FROM cand)
       |  ORDER BY adist, vec_id LIMIT 10)""".stripMargin

  /** Residual IVF-ADC search — textbook IVF-PQ (Jégou et al., PAMI
    * 2011): the PQ codebooks are trained on coarse-cell residuals
    * r = x − q1(x) instead of raw vectors, and the ADC tables are
    * built per probed cell from the query's own cell residual. Same
    * coarse/PQ hyperparameters as `q_pq_ivf`, so the two rankings
    * differ only by the residual refinement. The oracle replays the
    * ENTIRE pipeline — coarse training, residual computation, all
    * four residual-subspace trainings, the per-cell distance tables,
    * and the rank boundary — bit-for-bit.
    */
  def qPqResidual(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    val coarse = graft.sim.KMeans.fit(pqTrainSample(emb), "vec_id",
      "embedding", k = 8, iters = 3)
    val model = graft.sim.ProductQuantizer.fitResidual(pqTrainSample(emb),
      "vec_id", "embedding", coarse, dims = 64, m = 4, k = 4, iters = 2)
    graft.sim.ProductQuantizer.ivfAdcResidualTopK(emb, "vec_id", "embedding",
      coarse, model, q, nprobe = 3, n = 10)
  }

  val qPqResidualSql: String = {
    // residual-trained subspace chains, sourced from the `res` CTE
    val rChains = (0 until 4)
      .map(j => pqSubspaceCtes(s"r${j}_", j * 16 + 1, 16, 4, 2,
        src = "res", vec = "rx", trainWhere = Some(pqTrainWhereSql)))
      .mkString(",\n")
    // per-probed-cell ADC tables: query's cell residual vs every
    // residual-codebook centroid
    val rTables = (0 until 4).map { j =>
      s"""rd$j AS (
         |  SELECT s.cell, c.cluster,
         |    ${dotSql("s.x", "s.x")} - 2 * ${dotSql("s.x", "c.cv")} + ${dotSql("c.cv", "c.cv")} AS dval
         |  FROM r${j}_cent2 c CROSS JOIN (
         |    SELECT cell, list_transform(range(${j * 16 + 1}, ${j * 16 + 17}),
         |      i -> rx[i]) AS x
         |    FROM qres) s)""".stripMargin
    }.mkString(",\n")
    val code = (0 until 4).map(j => s"cast(a$j.cluster as varchar)")
      .mkString(" || '-' || ")
    val adist = (0 until 4).map(j => s"rd$j.dval").mkString(" + ")
    val joins = (1 until 4).map(j => s"JOIN r${j}_asg3 a$j USING (vec_id)")
      .mkString(" ") + " JOIN res ON a0.vec_id = res.vec_id " +
      (0 until 4).map(j =>
        s"JOIN rd$j ON res.cell = rd$j.cell AND a$j.cluster = rd$j.cluster")
        .mkString(" ")
    s"""${kmeansCtes(8, 3, Some(pqTrainWhereSql))},
       |res AS (
       |  SELECT a.vec_id,
       |    list_transform(range(1, 65), i -> cast(a.x[i] as double) - c.cv[i]) AS rx,
       |    a.cluster AS cell
       |  FROM asg4 a JOIN cent3 c USING (cluster)),
       |$rChains,
       |qv AS (
       |  SELECT x, ${dotSql("x", "x")} AS qq
       |  FROM (SELECT list_transform(range(1, 65),
       |          i -> cast(embedding[i] as double)) AS x
       |        FROM embeddings
       |        WHERE vec_id = (SELECT min(vec_id) FROM embeddings))),
       |probe AS (
       |  SELECT c.cluster
       |  FROM cent3 c CROSS JOIN qv q
       |  ORDER BY q.qq - 2 * ${dotSql("q.x", "c.cv")} + ${dotSql("c.cv", "c.cv")} ASC,
       |    c.cluster ASC
       |  LIMIT 3),
       |qres AS (
       |  SELECT c.cluster AS cell,
       |    list_transform(range(1, 65), i -> q.x[i] - c.cv[i]) AS rx
       |  FROM cent3 c CROSS JOIN qv q
       |  WHERE c.cluster IN (SELECT cluster FROM probe)),
       |$rTables
       |SELECT vec_id, code, round(greatest(adist, 0.0), 6) AS adist
       |FROM (
       |  SELECT a0.vec_id, $code AS code, $adist AS adist
       |  FROM r0_asg3 a0 $joins
       |  WHERE res.cell IN (SELECT cluster FROM probe)
       |  ORDER BY adist, vec_id LIMIT 10)""".stripMargin
  }

  /** Shared DuckDB staging for the SQ8 queries: casted vectors, the
    * per-vector scale (zero-vector guarded), and the half-up-rounded
    * int8 component list — the exact arithmetic of
    * [[graft.sim.ScalarQuantizer]].
    */
  private[queries] val sq8StageSql: String =
    s"""b AS (SELECT vec_id, list_transform(range(1, 65),
       |        i -> cast(embedding[i] as double)) AS x
       |      FROM embeddings),
       |e AS (SELECT vec_id, x,
       |        list_max(list_transform(x, v -> abs(v))) AS ma FROM b),
       |sc AS (SELECT vec_id, x,
       |         CASE WHEN ma = 0 THEN 1.0 ELSE ma / 127.0 END AS scale FROM e),
       |qz AS (SELECT vec_id, x, scale,
       |         list_transform(x, v -> cast(floor(v / scale + 0.5) as int)) AS qv
       |       FROM sc)""".stripMargin

  /** Int8 scalar quantization of every embedding (per-vector symmetric
    * scale, the FAISS-SQ8 shape): (vec_id, scale, code, err). One
    * narrow projection in Spark; the oracle replays scale, half-up
    * rounding, and the reconstruction error bit-for-bit.
    */
  def qSq8Encode(s: SparkSession, d: String): DataFrame =
    graft.sim.ScalarQuantizer.encode(Tables.embeddings(s, d),
      "vec_id", "embedding")

  val qSq8EncodeSql: String =
    s"""WITH $sq8StageSql,
       |d AS (SELECT vec_id, scale, qv,
       |        list_transform(range(1, 65), i -> x[i] - qv[i] * scale) AS diff
       |      FROM qz)
       |SELECT vec_id, scale,
       |  array_to_string(qv, ',') AS code,
       |  round(greatest(${dotSql("diff", "diff")}, 0.0), 6) AS err
       |FROM d""".stripMargin

  /** SQ8 re-rank search: top-10 by squared-L2 between the DEQUANTIZED
    * corpus vectors and the lowest-id query embedding — the precise
    * second stage a PQ candidate sweep hands off to. Encode + distance
    * fuse into one narrow pass; the rank boundary is hash-pinned in
    * the oracle.
    */
  def qSq8TopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    graft.sim.ScalarQuantizer.topK(emb, "vec_id", "embedding", q, n = 10)
  }

  val qSq8TopKSql: String =
    s"""WITH $sq8StageSql,
       |qv0 AS (SELECT list_transform(range(1, 65),
       |          i -> cast(embedding[i] as double)) AS qx
       |        FROM embeddings
       |        WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
       |d AS (SELECT vec_id,
       |        list_transform(range(1, 65), i -> qv[i] * scale - qx[i]) AS diff
       |      FROM qz CROSS JOIN qv0)
       |SELECT vec_id, round(greatest(dist, 0.0), 6) AS dist
       |FROM (
       |  SELECT vec_id, ${dotSql("diff", "diff")} AS dist
       |  FROM d
       |  ORDER BY dist, vec_id LIMIT 10)""".stripMargin

  /** MMR diverse top-10 (λ=0.7, pool=32) against the lowest-id query
    * embedding. The oracle replays the WHOLE selection in a recursive
    * CTE — relevance pass, pool boundary, pairwise sims, and all ten
    * greedy picks with their scores — so the diversity trade-off
    * itself is hash-pinned, not just the final id set. λ and 1−λ are
    * interpolated from the same Scala doubles the driver greedy uses,
    * keeping float literals bit-identical across engines.
    */
  def qMmr(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    graft.sim.Mmr.selectDiverse(emb, "vec_id", "embedding", q,
      k = 10, poolSize = 32, lambda = MmrLambda)
  }

  private[queries] val MmrLambda = 0.7

  val qMmrSql: String = {
    val lam = MmrLambda.toString
    val oneMinus = (1 - MmrLambda).toString
    s"""WITH RECURSIVE b AS (
       |  SELECT vec_id, list_transform(range(1, 65),
       |    i -> cast(embedding[i] as double)) AS x
       |  FROM embeddings),
       |n AS (SELECT vec_id, x, sqrt(${dotSql("x", "x")}) AS nrm FROM b),
       |qv AS (SELECT x AS qx, sqrt(${dotSql("x", "x")}) AS qn
       |       FROM b WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
       |r AS (SELECT vec_id, x, nrm,
       |        CASE WHEN nrm * qn > 0 THEN ${dotSql("x", "qx")} / (nrm * qn)
       |             ELSE 0.0 END AS rel
       |      FROM n CROSS JOIN qv),
       |pool AS (SELECT * FROM r ORDER BY rel DESC, vec_id LIMIT 32),
       |sims AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
       |           CASE WHEN a.nrm * b.nrm > 0
       |                THEN ${dotSql("a.x", "b.x")} / (a.nrm * b.nrm)
       |                ELSE 0.0 END AS sim
       |         FROM pool a JOIN pool b ON a.vec_id != b.vec_id),
       |sel AS (
       |  (SELECT 1 AS step, [p.vec_id] AS ids, p.vec_id AS picked,
       |          $lam * p.rel AS score
       |   FROM pool p ORDER BY p.rel DESC, p.vec_id LIMIT 1)
       |  UNION ALL
       |  SELECT sel.step + 1, list_append(sel.ids, w.vec_id), w.vec_id, w.sc
       |  FROM sel, LATERAL (
       |    SELECT c.vec_id,
       |      $lam * c.rel - $oneMinus * coalesce((SELECT max(s.sim) FROM sims s
       |        WHERE s.ai = c.vec_id AND list_contains(sel.ids, s.bi)), 0.0) AS sc
       |    FROM pool c
       |    WHERE NOT list_contains(sel.ids, c.vec_id)
       |    ORDER BY sc DESC, c.vec_id
       |    LIMIT 1) w
       |  WHERE sel.step < 10)
       |SELECT cast(step as bigint) AS sel_rank, picked AS vec_id,
       |  round(score, 6) AS score
       |FROM sel""".stripMargin
  }

  /** The composed two-tier ANN stack — coarse IVF cell pruning, a
    * PQ-ADC candidate sweep (top-50 by compressed distance), then an
    * SQ8 dequantized re-rank of the survivors (top-10) — the retrieval
    * architecture every production vector index converges on: cheap
    * codes shrink the candidate set, precise codes order what's left.
    * Training reuses the 1-in-4 sample; every stage boundary (cell
    * probe, candidate rank cut, re-rank order) replays exactly in the
    * oracle.
    */
  def qAnnRerank(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    val coarse = graft.sim.KMeans.fit(pqTrainSample(emb), "vec_id",
      "embedding", k = 8, iters = 3)
    val model = graft.sim.ProductQuantizer.fit(pqTrainSample(emb),
      "vec_id", "embedding", dims = 64, m = 4, k = 4, iters = 2)
    val cands = graft.sim.ProductQuantizer.ivfAdcTopK(emb, "vec_id",
      "embedding", coarse, model, q, nprobe = 3, n = 50)
      .select(col("vec_id"))
    graft.sim.ScalarQuantizer.topK(emb.join(cands, Seq("vec_id")),
      "vec_id", "embedding", q, n = 10)
  }

  val qAnnRerankSql: String =
    s"""${kmeansCtes(8, 3, Some(pqTrainWhereSql))},
       |$pqChains,
       |$pqDTables,
       |qv AS (
       |  SELECT x, ${dotSql("x", "x")} AS qq
       |  FROM (SELECT list_transform(range(1, 65),
       |          i -> cast(embedding[i] as double)) AS x
       |        FROM embeddings
       |        WHERE vec_id = (SELECT min(vec_id) FROM embeddings))),
       |probe AS (
       |  SELECT c.cluster
       |  FROM cent3 c CROSS JOIN qv q
       |  ORDER BY q.qq - 2 * ${dotSql("q.x", "c.cv")} + ${dotSql("c.cv", "c.cv")} ASC,
       |    c.cluster ASC
       |  LIMIT 3),
       |cand AS (
       |  SELECT vec_id FROM asg4
       |  WHERE cluster IN (SELECT cluster FROM probe)),
       |c50 AS (
       |  SELECT vec_id FROM (
       |    SELECT a0.vec_id, $pqAdistExpr AS adist
       |    FROM s0_asg3 a0 $pqJoins
       |    WHERE a0.vec_id IN (SELECT vec_id FROM cand)
       |    ORDER BY adist, a0.vec_id LIMIT 50)),
       |sb AS (SELECT vec_id, list_transform(range(1, 65),
       |         i -> cast(embedding[i] as double)) AS x
       |       FROM embeddings WHERE vec_id IN (SELECT vec_id FROM c50)),
       |se AS (SELECT vec_id, x,
       |         list_max(list_transform(x, v -> abs(v))) AS ma FROM sb),
       |ssc AS (SELECT vec_id, x,
       |          CASE WHEN ma = 0 THEN 1.0 ELSE ma / 127.0 END AS scale FROM se),
       |sqz AS (SELECT vec_id, x, scale,
       |          list_transform(x, v -> cast(floor(v / scale + 0.5) as int)) AS qv
       |        FROM ssc),
       |sd AS (SELECT vec_id,
       |         list_transform(range(1, 65), i -> qv[i] * scale - qx.x[i]) AS diff
       |       FROM sqz CROSS JOIN qv qx)
       |SELECT vec_id, round(greatest(dist, 0.0), 6) AS dist
       |FROM (
       |  SELECT vec_id, ${dotSql("diff", "diff")} AS dist
       |  FROM sd
       |  ORDER BY dist, vec_id LIMIT 10)""".stripMargin

  /** SemDeDup (cluster-then-pairwise semantic dedup): deterministic
    * k-means, then within each cluster drop every vector with a
    * lower-id neighbor at cosine ≥ τ. The full pipeline — three Lloyd
    * rounds AND the within-cluster prune — replays exactly in DuckDB
    * off the shared unrolled-Lloyd prologue.
    */
  def qSemdedup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // The paper's occupancy rule (SemDedup.scala scaladoc): size k so
    // expected cluster occupancy stays ~CONSTANT (k ≈ N/occupancy),
    // which keeps the within-cluster pairwise stage O(N·occupancy) —
    // linear in the corpus — instead of O(N²/k) at a pinned k. The
    // occupancy knob is 64 here so the synthetic corpus actually
    // exercises k growth at bench scale (sf0.1: N=2000 → k=32,
    // measured pairs stay ~linear; see SCALE.md round 9) rather than
    // riding the floor. The count is one metadata-cheap action
    // (bounded model state, like the centroids the fit collects). At
    // the correctness gate's sf0.01 (N=500 → ceil(500/64)=8) the
    // derived k is exactly the oracle's unrolled k=8, so the static
    // SQL below stays bit-for-bit right.
    val k = math.max(8, math.ceil(emb.count() / 64.0).toInt)
    graft.sim.SemDedup.semDedup(emb, "vec_id", "embedding",
      k = k, iters = 3, tau = SemDedupTau)
  }

  private[queries] val SemDedupTau = 0.3

  /** DuckDB left-fold dot product matching `graft.functions.DotFold`
    * bit-for-bit — the shared fragment for every cosine oracle.
    */
  private[queries] def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(cast(0 as double),
       |  list_transform(range(1, len($a) + 1),
       |    i -> cast($a[i] as double) * cast($b[i] as double))),
       |  (acc, v) -> acc + v)""".stripMargin

  /** DuckDB cosine over [[dotSql]], zero for zero-norm vectors —
    * operation order matches `Ann.cosinePre` exactly.
    */
  private[queries] def cosSql(a: String, b: String): String =
    s"""CASE WHEN sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}) > 0
       |  THEN ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))
       |  ELSE 0.0 END""".stripMargin

  /** The JL-projection CTE `pr` (vec_id, pvec): hyperplanes recomputed
    * from their integer formula, mirroring `Ann.project(_, outDim)` at
    * seed offset `so`. Shared by the projected-ANN and RRF oracles.
    */
  private[queries] def jlProjCte(outDim: Int, so: Int): String = {
    val s = math.sqrt(outDim.toDouble)
    s"""pr AS (
       |  SELECT vec_id, list_transform(range(0, $outDim), j ->
       |    list_reduce(list_prepend(cast(0 as double),
       |      list_transform(range(1, 65), i ->
       |        cast(embedding[i] as double) *
       |        (((($so + j) * 2654435761 + (i - 1) * 40503 + 17) % 1009)
       |          / 1009.0 * 2.0 - 1.0))),
       |      (acc, v) -> acc + v) / $s) AS pvec
       |  FROM embeddings)""".stripMargin
  }

  val qSemdedupSql: String = {
    def cos(a: String, b: String) = cosSql(a, b)
    // k derives from the corpus count IN SQL — the same
    // max(8, ceil(N/64)) occupancy rule qSemdedup applies — so this
    // oracle is exact at EVERY scale factor (sf0.1's k=32 included),
    // not just where the derived k happens to equal a baked-in 8
    val kSql = "(SELECT greatest(8, cast(ceil(count(*) / 64.0) as bigint)) " +
      "FROM embeddings)"
    s"""${kmeansCtes(8, 3, None, Some(kSql))},
       |sd_pairs AS (
       |  SELECT b2.vec_id, round(${cos("a.x", "b2.x")}, 6) AS cs
       |  FROM asg4 a JOIN asg4 b2
       |    ON a.cluster = b2.cluster AND a.vec_id < b2.vec_id),
       |sd_drop AS (
       |  SELECT vec_id, max(cs) AS max_dup_sim FROM sd_pairs
       |  WHERE cs >= $SemDedupTau GROUP BY vec_id)
       |SELECT k.vec_id, k.cluster, (d.vec_id IS NULL) AS kept, d.max_dup_sim
       |FROM asg4 k LEFT JOIN sd_drop d ON k.vec_id = d.vec_id""".stripMargin
  }

  /** Triangle participation counts over the co-purchase graph (parts
    * appearing in the same order) — the local clustering-density
    * signal complementing components (membership) and PageRank
    * (centrality). Spark runs degree-ordered compact-forward (each
    * triangle found once at its lowest-ordered vertex, wedge fan-out
    * bounded O(m^1.5)); the oracle brute-forces the same triangles
    * with a three-way self-join, so the counts pin the orientation
    * logic exactly.
    */
  def qTriangles(s: SparkSession, d: String): DataFrame = {
    // demo graph bounded to 1/4 of orders: the co-purchase graph's
    // wedge count grows ~quadratically in per-part order frequency
    // (Σ outdeg² ≈ 50M at sf0.1 unbounded — 20s of pure wedge fan-out
    // in EITHER engine); the filter keeps the bench query
    // representative while exercising the identical operator
    val l = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = l.alias("a").join(l.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    graft.ops.Triangles.perNode(edges)
      .select(col("id").as("part"), col("n_tri"))
  }

  val qTrianglesSql: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 4 = 0),
      |e AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |t AS (
      |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
      |  FROM e e1 JOIN e e2 ON e1.v = e2.u
      |    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      |n AS (SELECT x AS id FROM t UNION ALL
      |      SELECT y FROM t UNION ALL SELECT z FROM t)
      |SELECT id AS part, count(*) AS n_tri FROM n GROUP BY 1""".stripMargin

  /** Local clustering coefficient per part over the same ¼-bounded
    * co-purchase graph as [[qTriangles]]: 2·tri/(deg·(deg−1)) for every
    * node of degree ≥ 2 — the per-node community-density readout (a
    * high-coefficient part sits inside a tight co-purchase clique; a
    * hub with coefficient ≈ 0 bridges unrelated baskets). Spark runs
    * [[graft.ops.Triangles.clusteringCoefficient]] (degree-ordered
    * compact-forward counts + one degree aggregate + one node-keyed
    * left join — the wedge fan-out stays O(m^1.5)); the oracle
    * brute-forces the same triangles three-way and recomputes the same
    * double arithmetic, so both the counts AND the coefficient
    * rounding are pinned.
    */
  def qClusteringCoef(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = l.alias("a").join(l.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    graft.ops.Triangles.clusteringCoefficient(edges)
      .select(col("id").as("part"), col("deg"), col("n_tri"), col("coef"))
  }

  val qClusteringCoefSql: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 4 = 0),
      |e AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |deg AS (
      |  SELECT id, count(*) AS deg FROM (
      |    SELECT u AS id FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
      |t AS (
      |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
      |  FROM e e1 JOIN e e2 ON e1.v = e2.u
      |    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      |n AS (SELECT x AS id FROM t UNION ALL
      |      SELECT y FROM t UNION ALL SELECT z FROM t),
      |tc AS (SELECT id, count(*) AS n_tri FROM n GROUP BY 1)
      |SELECT d.id AS part, d.deg, coalesce(tc.n_tri, 0) AS n_tri,
      |  round(cast(coalesce(tc.n_tri, 0) as double) * 2.0 /
      |    (cast(d.deg as double) * (cast(d.deg as double) - 1.0)), 6) AS coef
      |FROM deg d LEFT JOIN tc USING (id) WHERE d.deg >= 2""".stripMargin

  /** Fuzzy self-join of part names within Levenshtein distance 2 via
    * deletion-neighborhood blocking (FastSS/SymSpell) — candidates
    * from an equi-join on shared ≤2-deletion variants, verified by
    * exact edit distance. The oracle brute-forces the all-pairs
    * distance, so any candidate the blocking missed would surface as
    * a row-count mismatch — the completeness property under test.
    */
  def qFuzzyJoin(s: SparkSession, d: String): DataFrame =
    graft.ops.FuzzyJoin.selfJoin(Tables.part(s, d), "p_name", maxEdits = 2)

  val qFuzzyJoinSql: String =
    """WITH p AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
      |SELECT a.p_name AS str_a, b.p_name AS str_b,
      |  cast(levenshtein(a.p_name, b.p_name) as bigint) AS dist
      |FROM p a JOIN p b ON a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin

  /** Corpus snapshot diff: a synthetic "previous crawl" is derived
    * deterministically from the current documents table (10%-sampled
    * deletions → `added`, planted text edits → `changed`, ghost rows
    * → `removed`), then every key is classified by content
    * fingerprint. The incremental-ingest audit — its `added|changed`
    * output is exactly the frame `Dedup.dropDuplicatesAgainst`
    * expects as the incoming side. The oracle replays the same
    * derivation and a FULL OUTER text compare, so the fingerprint
    * classification is hash-pinned end to end.
    */
  def qSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val cur = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val old = cur.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [stale]")))
          .otherwise(col("text")).as("text"))
      // ghost ids live OUTSIDE the doc_id domain (negative), so they
      // can never collide with a real key at any corpus size — a
      // collision would violate SnapshotDiff's unique-key-per-side
      // precondition and fan the full outer join out many-to-many
      .unionByName(cur.filter(col("doc_id") % 13 === 0)
        .select((-col("doc_id") - 1L).as("doc_id"),
          concat(lit("ghost "), col("doc_id").cast(StringType)).as("text")))
    graft.ops.SnapshotDiff.diff(old, cur, Seq("doc_id"), md5(col("text")))
  }

  val qSnapshotDiffSql: String =
    """WITH cur AS (SELECT doc_id, text FROM documents),
      |old AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN text || ' [stale]' ELSE text END
      |      AS text
      |  FROM cur WHERE doc_id % 10 <> 0
      |  UNION ALL
      |  SELECT -doc_id - 1, 'ghost ' || cast(doc_id as varchar)
      |  FROM cur WHERE doc_id % 13 = 0)
      |SELECT coalesce(o.doc_id, c.doc_id) AS doc_id,
      |  CASE WHEN o.doc_id IS NULL THEN 'added'
      |       WHEN c.doc_id IS NULL THEN 'removed'
      |       WHEN o.text = c.text THEN 'unchanged'
      |       ELSE 'changed' END AS status
      |FROM old o FULL OUTER JOIN cur c ON o.doc_id = c.doc_id""".stripMargin

  /** Salted skew join, correctness-gated: lineitem (big, salted 8
    * ways by the order key) joined to supplier (small, replicated) —
    * see [[graft.ops.SkewJoin.saltedJoin]] — then revenue per
    * supplier in exact integer cents. The oracle runs the PLAIN join:
    * passing the gate proves salting is a pure dataflow rewrite (the
    * operator previously had only a spec; this pins it cross-engine).
    */
  def qSaltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_suppkey"), col("l_orderkey"),
      round(col("l_extendedprice") * 100).cast(LongType).as("cents"))
    val supp = Tables.supplier(s, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    graft.ops.SkewJoin.saltedJoin(li, supp, Seq("l_suppkey"),
      saltBy = col("l_orderkey"), salts = 8)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("revenue_cents"))
  }

  val qSaltedJoinSql: String =
    """SELECT s_name, count(*) AS n_items,
      |  cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint)
      |    AS revenue_cents
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1""".stripMargin

  /** Bounded per-group top-k WITHOUT a window: top-3 orders by price
    * within each order priority via the [[graft.functions.TopKAgg]]
    * native aggregate — O(k) state per group, map-side partials, no
    * per-group sort of the full table (the `row_number() <= k` window
    * this replaces moves every row of a group through one reducer;
    * the aggregate moves at most k per partition). Prices quantized
    * to integer cents so cross-engine ordering is exact; the oracle
    * replays the same total order as a window, pinning rank
    * boundaries and tie-breaks.
    */
  def qTopkGroup(s: SparkSession, d: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast(LongType)
    Tables.orders(s, d)
      .select(col("o_orderpriority"), cents.as("cents"), col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.TopKAgg.top_k_by(col("cents"), col("o_orderkey"), 3)
        .as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("o_orderpriority"), (col("p") + 1).cast(LongType).as("rnk"),
        col("t.ord").as("price_cents"), col("t.payload").as("o_orderkey"))
  }

  val qTopkGroupSql: String =
    """WITH o AS (
      |  SELECT o_orderpriority,
      |    cast(round(o_totalprice * 100) as bigint) AS cents, o_orderkey
      |  FROM orders),
      |r AS (
      |  SELECT o_orderpriority, cents, o_orderkey,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY cents DESC, o_orderkey ASC) AS rnk
      |  FROM o)
      |SELECT o_orderpriority, cast(rnk as bigint) AS rnk,
      |  cents AS price_cents, o_orderkey
      |FROM r WHERE rnk <= 3""".stripMargin

  /** Corpus drift monitor: per-source total-variation distance of the
    * quality-score distribution between an "old" snapshot and a "new"
    * one over a 16-bin histogram — see
    * [[graft.ops.Drift.histogramDrift]]. The demo snapshots split the
    * corpus by the HASH coordinate (not id parity: the synthetic
    * source column is a function of doc_id mod, so parity would hand
    * each snapshot a disjoint source set and the both-sides join an
    * empty result). The oracle replays the split, the binning, both
    * histograms, and the decimal-summed TV exactly.
    */
  def qDrift(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(s, d).select(col("doc_id"), col("source"),
      TextAnalysis.qualityScore(col("text")).as("q"))
    val u = graft.ops.Sampling.coordinate(col("doc_id"))
    graft.ops.Drift.histogramDrift(
      scored.filter(u < 0.5),
      scored.filter(u >= 0.5),
      "source", "q", lo = 0.0, hi = 1.0, bins = 16)
  }

  val qDriftSql: String = {
    val u = graft.ops.Sampling.coordinateSql("doc_id")
    def hist(cond: String, cName: String) =
      s"""SELECT source,
         |  least(greatest(cast(floor((q - 0.0) / 0.0625) as int), 0), 15) AS bin,
         |  count(*) AS $cName
         |FROM sc WHERE $cond AND q IS NOT NULL GROUP BY 1, 2"""
        .stripMargin
    s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
       |sc AS (SELECT doc_id, source,
       |         ${qualityExprSql("toks", "text")} AS q FROM t),
       |ho AS (${hist(s"$u < 0.5", "c_old")}),
       |hn AS (${hist(s"$u >= 0.5", "c_new")}),
       |no AS (SELECT source, cast(sum(c_old) as bigint) AS n_old FROM ho GROUP BY 1),
       |nn AS (SELECT source, cast(sum(c_new) as bigint) AS n_new FROM hn GROUP BY 1),
       |j AS (
       |  -- explicit coalesce of the join keys: a bare `source` after
       |  -- FULL OUTER ... USING binds to the LEFT side (NULL on
       |  -- right-only rows) and silently drops them at the next join
       |  SELECT coalesce(o.source, n.source) AS source,
       |    coalesce(o.bin, n.bin) AS bin,
       |    coalesce(o.c_old, 0) AS c_old, coalesce(n.c_new, 0) AS c_new
       |  FROM ho o FULL OUTER JOIN hn n
       |    ON o.source = n.source AND o.bin = n.bin),
       |terms AS (
       |  SELECT source, n_old, n_new,
       |    cast(round(abs(cast(c_old as double) / cast(n_old as double) -
       |      cast(c_new as double) / cast(n_new as double)), 9)
       |      as decimal(20,9)) AS term
       |  FROM j JOIN no USING (source) JOIN nn USING (source))
       |SELECT source, n_old, n_new,
       |  round(cast(sum(term) as double) / 2.0, 6) AS tv
       |FROM terms GROUP BY 1, 2, 3""".stripMargin
  }

  /** PageRank centrality over the customer↔supplier purchase graph
    * (both directions of every distinct trading pair): the
    * graph-centrality weight of a curation pipeline, with the FULL
    * five-iteration damped power method replayed exactly in SQL thanks
    * to the quantized-integer rank units.
    */
  def qPagerank(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    // namespace the bipartite ids into one long space: cust → 2k, supp → 2k+1.
    // PERSISTED: the join+distinct is the query's most expensive stage
    // and is otherwise re-evaluated by both union branches times both
    // downstream materializations (edge cache + vertex cache)
    val ed = graft.CacheRegistry.register(
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val edges = ed.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(ed.select(col("b").as("src"), col("a").as("dst")))
    val nodes = edges.select(col("src").as("id")).distinct()
    graft.ops.PageRank.run(nodes, edges, damping = 0.85, iters = 5)
      .select(
        when(col("id") % 2 === 0, "cust").otherwise("supp").as("kind"),
        expr("id div 2").as("node_key"),
        col("rank"))
  }

  val qPagerankSql: String = {
    val sc = graft.ops.PageRank.Scale
    val d = 0.85
    val base = Math.round((1.0 - d) * sc)
    def iter(n: Int) =
      s"""r$n AS (
         |  SELECT n.id,
         |    cast($base + cast(round($d * cast(coalesce(s.s, 0) as double)) as bigint)
         |         as bigint) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum(r.r // e.outdeg) AS s
         |    FROM e JOIN r${n - 1} r ON e.src = r.id GROUP BY e.dst) s
         |    ON n.id = s.dst)""".stripMargin
    s"""WITH ed AS (
       |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |edges AS (SELECT a AS src, b AS dst FROM ed
       |          UNION ALL SELECT b AS src, a AS dst FROM ed),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |e AS (SELECT edges.src, edges.dst, deg.outdeg
       |      FROM edges JOIN deg USING (src)),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |r0 AS (SELECT id, cast($sc as bigint) AS r FROM nodes),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT CASE WHEN id % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind,
       |  id // 2 AS node_key,
       |  round(cast(r as double) / $sc, 6) AS rank
       |FROM r5""".stripMargin
  }

  /** The cust–supp bipartite interaction graph shared by the LPA and
    * k-core queries (same construction as `qPagerank`): customer and
    * supplier keys namespaced into one id space (cust → 2k,
    * supp → 2k+1), symmetrized, deduplicated. The join+distinct is the
    * expensive stage and feeds every downstream consumer, so it is
    * persisted via the CacheRegistry.
    */
  private[queries] def bipartiteEdges(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    val ed = graft.CacheRegistry.register(
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    ed.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(ed.select(col("b").as("src"), col("a").as("dst")))
  }

  private[queries] val bipartiteEdgesSql: String =
    """ed AS MATERIALIZED (
      |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |edges AS MATERIALIZED (SELECT a AS src, b AS dst FROM ed
      |          UNION ALL SELECT b AS src, a AS dst FROM ed),
      |nodes AS (SELECT DISTINCT src AS id FROM edges)""".stripMargin

  /** The co-purchase part graph shared by the LPA and modularity
    * queries (same construction as `qTriangles`, same 1/4-of-orders
    * bound): parts sharing an order, symmetrized, multi-edges KEPT —
    * multiplicity is the co-purchase weight, so votes and modularity
    * are frequency-weighted. Chosen over the bipartite cust–supp
    * graph deliberately: synchronous LPA's fixpoint on a bipartite
    * graph is the 2-coloring (each side's neighbor majority is the
    * other side — a degenerate, if deterministic, answer), while the
    * unipartite projection carries actual clustering.
    */
  private[queries] def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = graft.CacheRegistry.register(
      li.alias("a").join(li.alias("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("s"), col("b.l_partkey").as("t"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    pairs.select(col("s").as("src"), col("t").as("dst"))
      .unionAll(pairs.select(col("t").as("src"), col("s").as("dst")))
  }

  private[queries] val coPurchaseEdgesSql: String =
    """li AS (SELECT l_orderkey, l_partkey FROM lineitem
      |       WHERE l_orderkey % 4 = 0),
      |pairs AS (
      |  SELECT a.l_partkey AS s, b.l_partkey AS t FROM li a
      |  JOIN li b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey),
      |edges AS (SELECT s AS src, t AS dst FROM pairs
      |          UNION ALL SELECT t, s FROM pairs),
      |nodes AS (SELECT DISTINCT src AS id FROM edges)""".stripMargin

  /** Ensure-and-read of the persisted co-purchase adjacency — the
    * SHARED serve path of the graph family (q_sssp_persisted,
    * q_label_prop, q_modularity, q_trustrank): the projection
    * self-join runs once per corpus version, the stored edges arrive
    * pre-hashed at every iteration round's join, and — the
    * knnGraphServe economics — the staleness guard fingerprints the
    * SOURCE lineitem slice (the projection is a pure function of it),
    * so a warm ensure costs one narrow source scan and zero join
    * work. q_sssp keeps the fresh in-query build as the graph
    * family's own measurement. Rows are identical to
    * [[coPurchaseEdges]] by construction (same build thunk), so every
    * consumer's oracle is unchanged.
    */
  private[queries] def coPurchaseServed(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val table = "graft_copurchase_edges_" + d.replaceAll("[^A-Za-z0-9]", "_")
    graft.ops.GraphStore.ensureEdgesFor(li, "l_orderkey", "l_partkey",
      table, nBuckets = 8)(coPurchaseEdges(s, d))
    s.table(table)
  }

  /** Synchronous label-propagation communities on the co-purchase
    * part graph: 4 fixed voting rounds, self vote included, ties to
    * the smallest label (graft.ops.LabelPropagation — all-integer
    * votes, so the oracle's unrolled rounds replay exactly). Output:
    * every part with its community label and community size — the
    * per-community grouping key a curation pipeline caps/samples on,
    * analogous to the eTLD+1 domain key but structure-derived
    * (sf0.01: 83 communities, largest 230, modularity +0.17).
    */
  def qLabelProp(s: SparkSession, d: String): DataFrame = {
    val edges = coPurchaseServed(s, d)
    val nodes = edges.select(col("src").as("id")).distinct()
    graft.ops.LabelPropagation.withSizes(nodes, edges, rounds = 4)
      .select(col("id").as("part"), col("community"), col("csize"))
  }

  /** Unrolled synchronous-LPA rounds (CTEs `l0`..`l<rounds>` over the
    * prepended `edges`/`nodes`) shared by the LPA and modularity
    * oracles. */
  private[queries] def lpaRoundsSql(rounds: Int): String = {
    def round(n: Int) =
      s"""c$n AS (
         |  SELECT vid, lbl, count(*) AS c FROM (
         |    SELECT id AS vid, lbl FROM l${n - 1}
         |    UNION ALL
         |    SELECT e.dst AS vid, p.lbl FROM edges e
         |    JOIN l${n - 1} p ON e.src = p.id)
         |  GROUP BY 1, 2),
         |p$n AS (
         |  SELECT vid, lbl, row_number() OVER (PARTITION BY vid
         |    ORDER BY c DESC, lbl ASC) AS rn
         |  FROM c$n),
         |l$n AS (SELECT vid AS id, lbl FROM p$n WHERE rn = 1)""".stripMargin
    s"""l0 AS (SELECT id, id AS lbl FROM nodes),
       |${(1 to rounds).map(round).mkString(",\n")}""".stripMargin
  }

  val qLabelPropSql: String = {
    s"""WITH $coPurchaseEdgesSql,
       |${lpaRoundsSql(4)},
       |sz AS (SELECT lbl, count(*) AS csize FROM l4 GROUP BY 1)
       |SELECT l4.id AS part, l4.lbl AS community, sz.csize
       |FROM l4 JOIN sz ON l4.lbl = sz.lbl""".stripMargin
  }

  /** Newman modularity of the LPA communities — the quality metric
    * that closes the community-detection loop: Q_c = L_c/m −
    * (d_c/2m)², computed from the DIRECTED symmetric edge list as
    * Q_c = (intra2·E − deg²)/E² with E = directed edge count, all
    * integer until one final double division+round (the PageRank
    * quantization discipline — cross-engine exact). One extra
    * aggregation pass over the labeled edges computes intra-edge and
    * degree sums together. Emits per-community contributions plus the
    * corpus total.
    */
  def qModularity(s: SparkSession, d: String): DataFrame = {
    val edges = coPurchaseServed(s, d)
    val nodes = edges.select(col("src").as("id")).distinct()
    val labels = graft.ops.LabelPropagation.run(nodes, edges, rounds = 4)
    val le = edges
      .join(labels.select(col("id"), col("community").as("csrc")),
        edges("src") === col("id")).drop("id")
      .join(labels.select(col("id").as("did"), col("community").as("cdst")),
        col("dst") === col("did")).drop("did")
    val c = le.groupBy(col("csrc").as("community"))
      .agg(count(lit(1)).as("deg_sum"),
        sum(when(col("csrc") === col("cdst"), 1L).otherwise(0L)).as("intra2"))
    val ed = edges.agg(count(lit(1)).as("e_d"))
    val c2 = c.crossJoin(broadcast(ed))
      .withColumn("q_num",
        col("intra2") * col("e_d") - col("deg_sum") * col("deg_sum"))
    val tot = c2.agg(sum(col("q_num")).as("sum_num"),
      max(col("e_d")).as("e_max"))
      .select((round(col("sum_num").cast("double") /
        (col("e_max").cast("double") * col("e_max").cast("double")), 6)
        + lit(0.0)).as("q_total")) // + 0.0 folds IEEE -0.0 to +0.0
    c2.select(col("community"), col("intra2"), col("deg_sum"),
        (round(col("q_num").cast("double") /
          (col("e_d").cast("double") * col("e_d").cast("double")), 6)
          + lit(0.0)).as("q_contrib")) // -0.0 → +0.0, mirrored in the oracle
      .crossJoin(broadcast(tot))
  }

  val qModularitySql: String =
    s"""WITH $coPurchaseEdgesSql,
       |${lpaRoundsSql(4)},
       |le AS (
       |  SELECT e.src, e.dst, a.lbl AS csrc, b.lbl AS cdst
       |  FROM edges e JOIN l4 a ON e.src = a.id JOIN l4 b ON e.dst = b.id),
       |ecnt AS (SELECT count(*) AS e_d FROM edges),
       |mc AS (
       |  SELECT csrc AS community, count(*) AS deg_sum,
       |    cast(sum(CASE WHEN csrc = cdst THEN 1 ELSE 0 END) as bigint) AS intra2
       |  FROM le GROUP BY 1),
       |mc2 AS (
       |  SELECT mc.*, ecnt.e_d,
       |    cast(intra2 * e_d - deg_sum * deg_sum as bigint) AS q_num
       |  FROM mc CROSS JOIN ecnt),
       |tot AS (
       |  SELECT round(cast(sum(q_num) as double) /
       |    (cast(max(e_d) as double) * cast(max(e_d) as double)), 6) + 0.0 AS q_total
       |  FROM mc2)
       |SELECT community, intra2, deg_sum,
       |  round(cast(q_num as double) /
       |    (cast(e_d as double) * cast(e_d as double)), 6) + 0.0 AS q_contrib,
       |  tot.q_total
       |FROM mc2 CROSS JOIN tot""".stripMargin

  /** Multi-source BFS hop distance (graft.ops.Bfs, 4 synchronous
    * relaxation rounds) from the seed set {parts ≡ 0 mod 101} on the
    * co-purchase graph: the link-distance quality prior — "how many
    * hops from a trusted seed is this item" — plus bounded-radius
    * neighborhood extraction. Unit weights + fixed rounds ⇒ round-r
    * distance IS the shortest path for everything reached, and the
    * all-integer min-relaxation unrolls exactly in the oracle.
    */
  def qSssp(s: SparkSession, d: String): DataFrame = {
    val edges = coPurchaseEdges(s, d)
    val nodes = edges.select(col("src").as("id")).distinct()
    val seeds = nodes.filter(col("id") % 101 === 0)
    graft.ops.Bfs.run(seeds, edges, rounds = 4)
      .select(col("id").as("part"), col("dist"))
  }

  val qSsspSql: String = {
    def relax(n: Int) =
      s"""r$n AS (
         |  SELECT id, min(dist) AS dist FROM (
         |    SELECT id, dist FROM r${n - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, r${n - 1}.dist + 1 AS dist
         |    FROM edges e JOIN r${n - 1} ON e.src = r${n - 1}.id)
         |  GROUP BY 1)""".stripMargin
    s"""WITH $coPurchaseEdgesSql,
       |r0 AS (SELECT id, CAST(0 AS BIGINT) AS dist FROM nodes
       |       WHERE id % 101 = 0),
       |${(1 to 4).map(relax).mkString(",\n")}
       |SELECT id AS part, dist FROM r4""".stripMargin
  }

  /** Association rules (a-priori, support/confidence/lift) over order
    * baskets: the classic co-occurrence miner, reframed for curation —
    * "token/domain A implies B" rules are how a pipeline spots template
    * boilerplate and spam clusters. Scale shape: the a-priori
    * FREQUENT-ITEM PREFILTER runs before any pairing, so the basket
    * self-join only ever pairs items that individually clear minsup —
    * the pair blowup is bounded by (frequent items per basket)², and
    * the frequent-item set is by definition small enough to broadcast
    * (AQE does). The frequency threshold is the corpus's own MEAN
    * item support (greatest(2, basket-rows div distinct-items)) — a
    * DENSITY-relative bar, stable whether the corpus grows by
    * repeating the same items more often or by adding new items (an
    * absolute N-derived bar empties out under the latter, which the
    * sf1 replication probe caught). All counts integer;
    * confidence/lift are one final round(·,6) double division each,
    * replayed operation-for-operation in the oracle.
    */
  def qAssoc(s: SparkSession, d: String): DataFrame = {
    // basket table deduped ON a pinned hash(o) exchange: hash(o)
    // satisfies the (o, i) distinct's clustering and the persisted
    // layout is the basket self-join's key, so the pairing below runs
    // exchange-free over the cache (one build exchange total)
    val b = graft.CacheRegistry.register(
      graft.ops.Parallelism.hashBy(
        Tables.lineitem(s, d)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("i")),
        col("o"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = b.agg(countDistinct(col("o")).as("n"),
      count(lit(1)).as("nb"), countDistinct(col("i")).as("ni"))
    val si = b.groupBy(col("i")).agg(count(lit(1)).as("s"))
    val f = si.crossJoin(broadcast(n))
      .filter(col("s") >= greatest(lit(2L), expr("nb div ni")))
      .select(col("i"), col("s"))
    // semi-join the basket rows against the frequent set BEFORE the
    // self-join: Spark won't reorder inner joins without CBO, so a
    // pair-then-filter formulation would run the quadratic fan-out
    // over ALL items first — the exact blowup a-priori exists to avoid
    val bf = b.join(broadcast(f.select(col("i"))), Seq("i"), "left_semi")
    val pairs = bf.alias("a")
      .join(bf.alias("c"), col("a.o") === col("c.o") && col("a.i") < col("c.i"))
      .join(f.select(col("i").as("ia2"), col("s").as("sup_a")),
        col("a.i") === col("ia2"))
      .join(f.select(col("i").as("ib2"), col("s").as("sup_b")),
        col("c.i") === col("ib2"))
      .groupBy(col("a.i").as("part_a"), col("c.i").as("part_b"),
        col("sup_a"), col("sup_b"))
      .agg(count(lit(1)).as("sup_pair"))
      .filter(col("sup_pair") >= 2)
    pairs.crossJoin(broadcast(n)).select(
      col("part_a"), col("part_b"), col("sup_pair"),
      col("sup_a"), col("sup_b"),
      round(col("sup_pair").cast("double") / col("sup_a").cast("double"), 6)
        .as("conf_ab"),
      round(col("sup_pair").cast("double") / col("sup_b").cast("double"), 6)
        .as("conf_ba"),
      round(col("sup_pair").cast("double") * col("n").cast("double") /
        (col("sup_a").cast("double") * col("sup_b").cast("double")), 6)
        .as("lift"))
  }

  val qAssocSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
      |           FROM lineitem),
      |n AS (SELECT count(DISTINCT o) AS n, count(*) AS nb,
      |        count(DISTINCT i) AS ni FROM b),
      |si AS (SELECT i, count(*) AS s FROM b GROUP BY 1),
      |f AS (SELECT i, s FROM si, n WHERE s >= greatest(2, nb // ni)),
      |p AS (
      |  SELECT a.i AS part_a, c.i AS part_b, fa.s AS sup_a, fb.s AS sup_b,
      |    count(*) AS sup_pair
      |  FROM b a JOIN b c ON a.o = c.o AND a.i < c.i
      |  JOIN f fa ON a.i = fa.i JOIN f fb ON c.i = fb.i
      |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2)
      |SELECT part_a, part_b, sup_pair, sup_a, sup_b,
      |  round(CAST(sup_pair AS DOUBLE) / CAST(sup_a AS DOUBLE), 6) AS conf_ab,
      |  round(CAST(sup_pair AS DOUBLE) / CAST(sup_b AS DOUBLE), 6) AS conf_ba,
      |  round(CAST(sup_pair AS DOUBLE) * CAST(n AS DOUBLE) /
      |    (CAST(sup_a AS DOUBLE) * CAST(sup_b AS DOUBLE)), 6) AS lift
      |FROM p, n""".stripMargin

  /** Item-item collaborative filtering: binary-basket cosine
    * sim(a,b) = co / sqrt(s_a · s_b), top-3 neighbors per item — the
    * "related items" / nearest-corpus-peers primitive, structurally
    * the sparse analogue of q_ann_topk (co-occurrence replaces the
    * dot product; the inverted basket index replaces the broadcast
    * scan). Scale shape: pair generation is keyed by basket id and
    * pruned to co ≥ 2 BEFORE the ranking window, and the window
    * partitions by item (never a global sort). sqrt of an integer
    * product is deterministic IEEE in both engines; one final
    * round(·,6).
    */
  def qItemCf(s: SparkSession, d: String): DataFrame = {
    // same layout as qAssoc: dedup on a pinned hash(o) exchange so the
    // co-occurrence self-join consumes the cache in place
    val b = graft.CacheRegistry.register(
      graft.ops.Parallelism.hashBy(
        Tables.lineitem(s, d)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("i")),
        col("o"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val si = b.groupBy(col("i")).agg(count(lit(1)).as("s"))
    val co = b.alias("a")
      .join(b.alias("c"), col("a.o") === col("c.o") && col("a.i") < col("c.i"))
      .groupBy(col("a.i").as("ia"), col("c.i").as("ib"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2)
    // symmetrize so every item ranks ALL its neighbors
    val sym = co.unionByName(
      co.select(col("ib").as("ia"), col("ia").as("ib"), col("co")))
    val scored = sym
      .join(si.select(col("i").as("ia"), col("s").as("s_item")), Seq("ia"))
      .join(si.select(col("i").as("ib"), col("s").as("s_nbr")), Seq("ib"))
      .withColumn("sim", round(col("co").cast("double") /
        sqrt((col("s_item") * col("s_nbr")).cast("double")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ia"))
      .orderBy(col("sim").desc, col("ib").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("ia").as("item"), col("ib").as("neighbor"),
        col("co"), col("s_item"), col("s_nbr"), col("sim"), col("rank"))
  }

  val qItemCfSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
      |           FROM lineitem),
      |si AS (SELECT i, count(*) AS s FROM b GROUP BY 1),
      |co AS (
      |  SELECT a.i AS ia, c.i AS ib, count(*) AS co
      |  FROM b a JOIN b c ON a.o = c.o AND a.i < c.i
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |sym AS (SELECT ia, ib, co FROM co
      |        UNION ALL SELECT ib, ia, co FROM co),
      |sc AS (
      |  SELECT sym.ia, sym.ib, sym.co, sa.s AS s_item, sb.s AS s_nbr,
      |    round(CAST(sym.co AS DOUBLE) /
      |      sqrt(CAST(sa.s * sb.s AS DOUBLE)), 6) AS sim
      |  FROM sym JOIN si sa ON sym.ia = sa.i JOIN si sb ON sym.ib = sb.i),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY ia
      |    ORDER BY sim DESC, ib ASC) AS rank FROM sc)
      |SELECT ia AS item, ib AS neighbor, co, s_item, s_nbr, sim, rank
      |FROM r WHERE rank <= 3""".stripMargin

  /** q_sssp served FROM the persisted src-bucketed adjacency
    * (graft.ops.GraphStore): the edge list lands pre-hashed at every
    * relaxation round's join, so only the vertex-sized distance frame
    * exchanges — the iteration substrate a 100 TB graph job reuses
    * across every algorithm and every run. Same oracle as q_sssp BY
    * DESIGN: the persisted probe must reproduce the in-query BFS
    * bit-for-bit.
    */
  def qSsspPersisted(s: SparkSession, d: String): DataFrame = {
    val edges = coPurchaseServed(s, d)
    val nodes = edges.select(col("src").as("id")).distinct()
    val seeds = nodes.filter(col("id") % 101 === 0)
    graft.ops.Bfs.run(seeds, edges, rounds = 4, persistEdges = false)
      .select(col("id").as("part"), col("dist"))
  }

  /** TrustRank (personalized PageRank) from the SAME seed set as
    * q_sssp on the SAME co-purchase graph: where BFS answers "how many
    * hops from a trusted seed", trust rank answers "how much damped
    * trust flows there" — the classic web-curation pair (seed a few
    * audited domains, propagate; the two signals disagree exactly
    * where link MASS and link DISTANCE disagree). graft.ops.PageRank
    * .personalized: all teleport mass on the seeds, quantized-integer
    * iteration, unreachable vertices at exactly 0.
    */
  def qTrustrank(s: SparkSession, d: String): DataFrame = {
    val edges = coPurchaseServed(s, d)
    val nodes = edges.select(col("src").as("id")).distinct()
    val seeds = nodes.filter(col("id") % 101 === 0)
    graft.ops.PageRank.personalized(nodes, seeds, edges,
      damping = 0.85, iters = 5)
      .select(col("id").as("part"), col("trust"))
  }

  val qTrustrankSql: String = {
    val sc = graft.ops.PageRank.Scale
    val dmp = 0.85
    val base = Math.round((1.0 - dmp) * sc)
    val num = Math.round(dmp * 100)
    // exact integer damping: (num·s + 50) // 100 — no float multiply,
    // no .5-boundary ambiguity between engines (see PageRank.personalized)
    def iter(n: Int) =
      s"""r$n AS (
         |  SELECT n.id,
         |    cast(n.is_seed * $base +
         |      (($num * cast(coalesce(s.s, 0) as bigint)) + 50) // 100
         |      as bigint) AS r
         |  FROM v n LEFT JOIN (
         |    SELECT e2.dst, sum(r.r // e2.outdeg) AS s
         |    FROM e2 JOIN r${n - 1} r ON e2.src = r.id GROUP BY e2.dst) s
         |    ON n.id = s.dst)""".stripMargin
    s"""WITH $coPurchaseEdgesSql,
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |e2 AS (SELECT edges.src, edges.dst, deg.outdeg
       |       FROM edges JOIN deg USING (src)),
       |v AS (SELECT id, CASE WHEN id % 101 = 0 THEN 1 ELSE 0 END AS is_seed
       |      FROM nodes),
       |r0 AS (SELECT id, cast(is_seed * $sc as bigint) AS r FROM v),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT id AS part, cast(r // 1000 as double) / 1000000.0 AS trust
       |FROM r5""".stripMargin
  }

  /** Fixed-round k-core peeling (k=12, 4 rounds) on the bipartite
    * cust–supp graph (NOT the co-purchase projection the LPA/
    * modularity/BFS queries use — peeling has no 2-coloring
    * degeneracy, so the bipartite structure is fine here):
    * the density gate — vertices whose degree survives repeated
    * removal of sub-k vertices, with residual degree and a
    * self-reported convergence flag (graft.ops.KCore). k sits at the
    * customer-side median degree, so the peel cascades non-trivially
    * at every scale factor.
    */
  def qKcore(s: SparkSession, d: String): DataFrame = {
    val edges = bipartiteEdges(s, d)
    val nodes = edges.select(col("src").as("id")).distinct()
    graft.ops.KCore.run(nodes, edges, k = 12, rounds = 4)
      .select(
        when(col("id") % 2 === 0, "cust").otherwise("supp").as("kind"),
        expr("id div 2").as("node_key"),
        col("deg"),
        col("converged"))
  }

  val qKcoreSql: String = {
    val k = 12
    // every a_n is referenced twice by the next peel (src AND dst
    // side) and a3/a4 three more times in the finalize: without
    // MATERIALIZED, DuckDB 1.x inlines the whole chain per reference —
    // 2^rounds copies of the edge join. At sf0.1 that merely wastes
    // time; at sf1 it spilled >78 GB of temp and died. The same
    // round-12 lesson as the knn CTE chain, applied here.
    def peel(n: Int) =
      s"""d$n AS (
         |  SELECT e.src AS id, count(*) AS c FROM edges e
         |  JOIN a${n - 1} s ON e.src = s.id
         |  JOIN a${n - 1} t ON e.dst = t.id
         |  GROUP BY 1),
         |a$n AS MATERIALIZED (SELECT id FROM d$n WHERE c >= $k)""".stripMargin
    s"""WITH $bipartiteEdgesSql,
       |a0 AS MATERIALIZED (SELECT id FROM nodes),
       |${(1 to 4).map(peel).mkString(",\n")},
       |fd AS (
       |  SELECT a.id, coalesce(d.c, 0) AS deg
       |  FROM a4 a LEFT JOIN (
       |    SELECT e.src AS id, count(*) AS c FROM edges e
       |    JOIN a4 s ON e.src = s.id
       |    JOIN a4 t ON e.dst = t.id
       |    GROUP BY 1) d ON a.id = d.id)
       |SELECT CASE WHEN id % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind,
       |  id // 2 AS node_key, deg,
       |  (SELECT count(*) FROM a4) = (SELECT count(*) FROM a3) AS converged
       |FROM fd""".stripMargin
  }

  /** Brute-force cosine top-3 in Johnson-Lindenstrauss PROJECTED space
    * (64 → 16 dims): the dimensionality-reduction preprocessing for
    * corpus-scale similarity. The oracle recomputes the deterministic
    * hyperplanes from their integer formula inside SQL, so projection
    * and search both hash-replay.
    */
  def qAnnRp(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val proj = emb.select(col("vec_id"),
      Ann.project(col("embedding"), outDim = 16).as("pvec"))
    Ann.bruteForceTopK(proj, proj.filter(col("vec_id") < 8),
      "vec_id", "pvec", k = 3)
  }

  val qAnnRpSql: String = {
    def cos(a: String, b: String) = cosSql(a, b)
    s"""WITH ${jlProjCte(16, 4096)},
       |sims AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${cos("q.pvec", "c.pvec")} AS sim_raw
       |  FROM pr q JOIN pr c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 8),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_raw DESC, neighbor_id ASC) AS rank
       |  FROM sims)
       |SELECT query_id, neighbor_id, round(sim_raw, 6) AS sim, rank
       |FROM ranked WHERE rank <= 3""".stripMargin
  }

  /** Hybrid-retrieval fusion: reciprocal-rank fusion of the EXACT
    * full-space cosine top-10 and the JL-projected-space top-10 —
    * integer-quantized contributions make the fused score an exact
    * sum, so even the combination of two float-heavy retrievers
    * hash-replays.
    */
  def qRrf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 8)
    val full = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
    val proj = emb.select(col("vec_id"),
      Ann.project(col("embedding"), outDim = 16).as("pvec"))
    val projected = Ann.bruteForceTopK(proj, proj.filter(col("vec_id") < 8),
      "vec_id", "pvec", k = 10)
      .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
    graft.sim.Rrf.fuse(Seq(full, projected), k0 = 60, k = 5)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("rrf_score"), col("n_lists"), col("rank"))
  }

  val qRrfSql: String = {
    def cos(a: String, b: String) = cosSql(a, b)
    s"""WITH ${jlProjCte(16, 4096)},
       |full_r AS (
       |  SELECT query_id, id, rank FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cos("q.embedding", "c.embedding")} DESC,
       |                 c.vec_id ASC) AS rank
       |    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 8) WHERE rank <= 10),
       |proj_r AS (
       |  SELECT query_id, id, rank FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cos("q.pvec", "c.pvec")} DESC,
       |                 c.vec_id ASC) AS rank
       |    FROM pr q JOIN pr c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 8) WHERE rank <= 10),
       |u AS (SELECT * FROM full_r UNION ALL SELECT * FROM proj_r),
       |sc AS (
       |  SELECT query_id, id,
       |    cast(sum(1000000000 // (60 + rank)) as bigint) AS rrf_score,
       |    count(*) AS n_lists
       |  FROM u GROUP BY query_id, id)
       |SELECT query_id, id AS neighbor_id, rrf_score, n_lists, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_score DESC, id ASC) AS rank
       |  FROM sc) WHERE rank <= 5""".stripMargin
  }

  /** Distributed BPE vocabulary training, four merge rounds on the
    * document corpus — the ITERATIVE trainer (pair-count argmax +
    * corpus-wide merge rewrite per round) hash-replays exactly in
    * DuckDB via unrolled CTEs, the k-means discipline applied to
    * subword learning.
    */
  def qBpe(s: SparkSession, d: String): DataFrame =
    graft.text.Bpe.merges(s, Tables.documents(s, d), "text", steps = 4)

  /** Unrolled-BPE CTE prologue shared by the trainer and encoder
    * oracles: ends with `s{steps}`, the (w, cnt, sym) table of every
    * distinct word segmented under all learned merges, plus `m1..m`
    * holding each round's winning pair.
    */
  private[queries] def bpeCtes(steps: Int): String = {
    def round(r: Int) =
      s"""p$r AS (
         |  SELECT sym[i] AS a, sym[i+1] AS b, cnt
         |  FROM s${r - 1}, unnest(range(1, len(sym))) AS t(i)),
         |m$r AS (
         |  SELECT a, b, cast(sum(cnt) as bigint) AS w
         |  FROM p$r GROUP BY a, b ORDER BY w DESC, a ASC, b ASC LIMIT 1),
         |s$r AS (
         |  -- LEFT JOIN ON true, not CROSS JOIN: an exhausted round
         |  -- (empty m) must leave the word table unchanged, matching
         |  -- the trainer's early stop, not wipe it
         |  SELECT s.w, s.cnt,
         |    CASE WHEN m.a IS NULL THEN s.sym
         |    ELSE list_reduce(list_transform(s.sym, c -> [c]),
         |      (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.a AND x[1] = m.b
         |                  THEN list_append(acc[:-2], m.a || m.b)
         |                  ELSE list_concat(acc, x) END) END AS sym
         |  FROM s${r - 1} s LEFT JOIN m$r m ON true)""".stripMargin
    s"""WITH w0 AS (
       |  SELECT w, count(*) AS cnt FROM (
       |    SELECT unnest($toksSql) AS w FROM documents) GROUP BY w),
       |s0 AS (SELECT w, cnt, list_transform(range(1, len(w) + 1), i -> w[i]) AS sym
       |       FROM w0),
       |${(1 to steps).map(round).mkString(",\n")}""".stripMargin
  }

  val qBpeSql: String =
    s"""${bpeCtes(4)}
       |${(1 to 4).map(r =>
            s"SELECT $r AS step, a AS lhs, b AS rhs, w AS weight FROM m$r")
          .mkString("\nUNION ALL\n")}""".stripMargin

  /** BPE encoding under the learned merges: per-document whitespace
    * token and subword counts — the vocabulary-compression report.
    * The merge chain folds over the DISTINCT-word table only; the
    * corpus joins against that map.
    */
  def qBpeEncode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val m = graft.text.Bpe.train(docs, "text", steps = 4)
    graft.text.Bpe.encode(docs, "doc_id", "text", m)
  }

  val qBpeEncodeSql: String =
    s"""${bpeCtes(4)},
       |enc AS (SELECT w, len(sym) AS n_sub FROM s4),
       |toks AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
       |p AS (SELECT t.doc_id, count(*) AS n_tokens,
       |        cast(sum(e.n_sub) as bigint) AS n_subwords
       |      FROM toks t JOIN enc e USING (w) GROUP BY t.doc_id)
       |SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
       |  coalesce(p.n_subwords, 0) AS n_subwords
       |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin

  /** BM25 keyword retrieval: top-10 documents for three literal
    * keyword queries — the lexical complement to the ANN family, with
    * per-(term, doc) contributions quantized so the float-heavy score
    * hash-replays in DuckDB. One query term ('watermark') is absent
    * from the corpus, pinning the missing-postings path.
    */
  private[queries] val Bm25Queries = Seq(
    ("q1", "slow hash join"),
    ("q2", "stream window watermark"),
    ("q3", "customer order data"))

  def qBm25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Bm25.topK(Tables.documents(s, d), "doc_id", "text",
      Bm25Queries.toDF("query_id", "qtext"), k = 10)
  }

  /** BM25 served FROM the persisted inverted index
    * (graft.text.Bm25Index) — the lexical serving path: postings
    * bucketed by term, corpus scalars as table-property literals,
    * probe = broadcast query terms into the postings scan. Same
    * oracle as `q_bm25` BY DESIGN: the persisted probe must
    * reproduce the in-query operator's ranking bit-for-bit.
    */
  def qBm25Persisted(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val table = "graft_bm25_idx_" + d.replaceAll("[^A-Za-z0-9]", "_")
    graft.text.Bm25Index.ensure(docs, "doc_id", "text", table, 8)
    graft.text.Bm25Index.topK(s, table,
      Bm25Queries.toDF("query_id", "qtext"), "doc_id", k = 10)
  }

  /** BM25 with MAXSCORE pruning over the same persisted index — the
    * query-time complement of the serving store: EXACT top-k (same
    * oracle as `q_bm25`/`q_bm25_persisted` BY DESIGN, tie-breaks
    * included) while only documents holding at least one ESSENTIAL
    * query term enter the score-aggregation shuffle. The pruning
    * math (per-term upper bounds, kth-single-contribution θ, strict
    * ascending-ΣU prefix) lives in
    * [[graft.text.Bm25Index.topKMaxScore]].
    */
  def qBm25MaxScore(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val table = "graft_bm25_idx_" + d.replaceAll("[^A-Za-z0-9]", "_")
    graft.text.Bm25Index.ensure(docs, "doc_id", "text", table, 8)
    graft.text.Bm25Index.topKMaxScore(s, table,
      Bm25Queries.toDF("query_id", "qtext"), "doc_id", k = 10)
  }

  val qBm25Sql: String = {
    val sc = Bm25.Scale
    val k1 = 1.2
    val b = 0.75
    val qtoksSql = toksSql.replace("trim(text)", "trim(qtext)")
    val values = Bm25Queries.map { case (id, t) => s"('$id', '$t')" }
      .mkString(", ")
    s"""WITH q AS (SELECT * FROM (VALUES $values) AS v(query_id, qtext)),
       |toks AS (SELECT doc_id AS id, unnest($toksSql) AS tok FROM documents),
       |tf AS (SELECT id, tok, count(*) AS tf FROM toks GROUP BY id, tok),
       |dl AS (SELECT id, count(*) AS dl FROM toks GROUP BY id),
       |stats AS (SELECT cast(count(*) as bigint) AS n_docs,
       |                 cast(sum(dl) as bigint) AS n_toks FROM dl),
       |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       |qt AS (SELECT query_id, unnest(list_distinct($qtoksSql)) AS tok FROM q),
       |c AS (
       |  SELECT qt.query_id, tf.id,
       |    cast(round(
       |      ln((cast(n_docs as double) - cast(df as double) + 0.5) /
       |         (cast(df as double) + 0.5) + 1.0) *
       |      (cast(tf as double) * ${k1 + 1.0} /
       |       (cast(tf as double) + $k1 * (${1.0 - b} +
       |        $b * cast(dl as double) /
       |        (cast(n_toks as double) / cast(n_docs as double))))) *
       |      $sc) as bigint) AS c
       |  FROM qt JOIN tf USING (tok) JOIN dfq USING (tok)
       |  JOIN dl ON tf.id = dl.id CROSS JOIN stats),
       |s2 AS (SELECT query_id, id, cast(sum(c) as bigint) AS sc
       |       FROM c GROUP BY query_id, id),
       |r AS (SELECT query_id, id, sc, row_number() OVER (
       |        PARTITION BY query_id ORDER BY sc DESC, id ASC) AS rank
       |      FROM s2)
       |SELECT query_id, id AS doc_id,
       |  round(cast(sc as double) / $sc.0, 6) AS score, rank
       |FROM r WHERE rank <= 10""".stripMargin
  }

  /** CDC changelog application: fold the back half of the event stream
    * (as a changelog with 'error' rows as tombstones) into the
    * snapshot materialized from the front half — the incremental
    * corpus-refresh primitive, one max_by shuffle per stage, no
    * window sort.
    */
  def qCdcUpsert(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    val ev = Tables.events(s, d)
    val cut = lit("2024-01-16 00:00:00").cast(TimestampType)
    val isDel = col("event_type") === "error"
    val before = ev.filter(col("ts") < cut)
    val base = graft.ops.Upsert.applyChangelog(before.limit(0), before,
      Seq("user_id"), Seq("ts", "event_id"), isDel)
    graft.ops.Upsert.applyChangelog(base, ev.filter(col("ts") >= cut),
      Seq("user_id"), Seq("ts", "event_id"), isDel)
  }

  val qCdcUpsertSql: String =
    """WITH snap AS (
      |  SELECT user_id, event_id, ts, event_type, value, props FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00')
      |  WHERE rn = 1 AND event_type <> 'error'),
      |u AS (
      |  SELECT user_id, event_id, ts, event_type, value, props,
      |    false AS del FROM snap
      |  UNION ALL
      |  SELECT user_id, event_id, ts, event_type, value, props,
      |    (event_type = 'error') AS del
      |  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00')
      |SELECT user_id, event_id, ts, event_type, value, props FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn FROM u)
      |WHERE rn = 1 AND NOT del""".stripMargin
}
