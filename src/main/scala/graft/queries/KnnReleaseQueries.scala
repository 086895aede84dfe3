package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Ann
import graft.text.{Bm25, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** k-NN graph family (NN-Descent build/serve, recall, mutual-kNN,
  * bitext mining) and corpus-release queries (data card, diversity).
  *
  * Part of the [[PipelineQueries]] linear trait chain: each trait
  * extends the previous one, so member initialization order and
  * visibility are IDENTICAL to the former single-object layout (the
  * chain is a file split, not an architecture: everything still
  * composes into the one PipelineQueries object).
  */
private[queries] trait KnnReleaseQueries extends ExperimentStoreQueries {
  /** k-NN GRAPH construction via LSH-seeded NN-Descent
    * (graft.sim.KnnGraph): every node's top-3 cosine neighbors over a
    * hash-thinned node set (vec_id % 4 — tracks every SF), seeded by
    * sign-LSH blocking with a COUNT-DERIVED plane count
    * (KnnGraph.seedPlanes — occupancy held ~constant at any SF; the
    * static numPlanes=4 this replaces was the r15 sf10 probe's one
    * measured scale-killer) and refined by two neighbor-of-my-neighbor
    * rounds. The per-query ANN paths answer "neighbors of these few
    * rows"; this is the all-nodes graph that SemDedup clustering,
    * graph dedup, and hard-negative mining consume. The oracle replays
    * the ENTIRE trajectory — the derived plane count (a scalar
    * subquery over the same node count), seed buckets, both expansion
    * rounds, every top-k cut — so the hash matches only if the full
    * NN-Descent run is bit-identical (left-fold dots, (sim desc, dst
    * asc) tie order).
    */
  def qKnnGraph(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.embeddings(s, d).filter(col("vec_id") % 4 === 0)
    graft.sim.KnnGraph.build(nodes, "vec_id", "embedding",
      k = 3, rounds = 2)
  }

  private[queries] def knnCosSql(a: String, b: String, an: String, bn: String) =
    s"""CASE WHEN $an * $bn > 0
       |  THEN ${listDotSql(a, b)} / ($an * $bn)
       |  ELSE 0.0 END""".stripMargin

  /** The shared NN-Descent CTE prefix (nodes → pk → n → seed → g0 → …
    * → s2/g2) replaying graft.sim.KnnGraph.build(k=3, rounds=2,
    * derived planes) over the vec_id % 4 node set — single-sourced
    * for `q_knn_graph` (the graph itself) and `q_knn_recall` (the
    * measured seed-repair readout). The plane count is NOT a literal:
    * `pk` derives it from count(*) with the same integer CASE chain
    * the engine clamps with (knnPlanesSql), and the bucket keys mask
    * the full SeedMaxPlanes-bit sign key down by string prefix
    * (lshKeyMaskedSql) — the SQL stays structurally static while
    * occupancy stays constant at every scale factor.
    */
  private[queries] lazy val knnGraphCtesSql: String = {
    // one refinement round: undirected expand + keep-current, dedup,
    // exact re-score, top-3 per src — the KnnGraph.build loop body
    def round(gIn: String, uOut: String, cOut: String, sOut: String,
        gOut: String) =
      s"""$uOut AS MATERIALIZED (SELECT src, dst FROM $gIn
         |  UNION ALL SELECT dst AS src, src AS dst FROM $gIn),
         |$cOut AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |  SELECT a.src AS src, b.dst AS dst
         |  FROM $uOut a JOIN $uOut b ON a.dst = b.src
         |  WHERE a.src <> b.dst
         |  UNION ALL SELECT src, dst FROM $gIn)),
         |$sOut AS MATERIALIZED (SELECT c.src, c.dst,
         |    ${knnCosSql("sa.vec", "sb.vec", "sa.nrm", "sb.nrm")} AS sim
         |  FROM $cOut c JOIN n sa ON c.src = sa.id
         |               JOIN n sb ON c.dst = sb.id),
         |$gOut AS MATERIALIZED (SELECT src, dst, sim FROM (
         |  SELECT src, dst, sim, row_number() OVER (PARTITION BY src
         |    ORDER BY sim DESC, dst ASC) AS rk FROM $sOut) WHERE rk <= 3)""".stripMargin
    s"""nodes AS (SELECT vec_id AS id, embedding AS vec
       |  FROM embeddings WHERE vec_id % 4 = 0),
       |pk AS MATERIALIZED (SELECT ${knnPlanesSql("cnt")} AS p
       |  FROM (SELECT count(*) AS cnt FROM nodes)),
       |n AS MATERIALIZED (SELECT id, vec, sqrt(${listDotSql("vec", "vec")}) AS nrm,
       |  ${lshKeyMaskedSql("vec", "SELECT p FROM pk")} AS b1,
       |  ${lshKeyMaskedSql("vec", "SELECT p FROM pk",
             offset = graft.sim.KnnGraph.SeedTableOffset)}
       |    AS b2 FROM nodes),
       |sc AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT a.id AS src, b.id AS dst FROM n a JOIN n b
       |    ON a.b1 = b.b1 AND a.id <> b.id
       |  UNION ALL
       |  SELECT a.id AS src, b.id AS dst FROM n a JOIN n b
       |    ON a.b2 = b.b2 AND a.id <> b.id)),
       |seed AS (SELECT c.src, c.dst,
       |    ${knnCosSql("sa.vec", "sb.vec", "sa.nrm", "sb.nrm")} AS sim
       |  FROM sc c JOIN n sa ON c.src = sa.id
       |            JOIN n sb ON c.dst = sb.id),
       |g0 AS MATERIALIZED (SELECT src, dst, sim FROM (
       |  SELECT src, dst, sim, row_number() OVER (PARTITION BY src
       |    ORDER BY sim DESC, dst ASC) AS rk FROM seed) WHERE rk <= 3),
       |${round("g0", "u1", "c1", "s1", "g1")},
       |${round("g1", "u2", "c2", "s2", "g2")}""".stripMargin
  }

  lazy val qKnnGraphSql: String =
    s"""WITH $knnGraphCtesSql
       |SELECT src, dst, round(sim, 6) AS sim, rank FROM (
       |  SELECT src, dst, sim, row_number() OVER (PARTITION BY src
       |    ORDER BY sim DESC, dst ASC) AS rank FROM s2) WHERE rank <= 3""".stripMargin

  /** Measured NN-Descent recall readout: seed graph (rounds = 0) vs
    * refined graph (rounds = 2) against the EXACT top-3 graph, as an
    * oracle-verified metric — the "measure, don't claim" discipline
    * (q_minhash_recall, the Hilbert footer-skip table) applied to the
    * graph builder. The spec asserts improvement; this query makes
    * the exact numbers themselves hash-gated at every SF.
    *
    * The exact side is computed over a BOUNDED probe set — the
    * [[KnnRecallProbes]] nodes with the smallest (hash60(id), id), the
    * same deterministic hash-ordered draw as ivfTopK's centroid sample
    * and the q_ann_* few-row probe discipline — so the readout's cost
    * is probes×N (one corpus scan against a broadcast probe side),
    * not N²: recall estimated on a fixed uniform sample stays honest
    * while the plan stays linear in corpus size. (The former
    * all-nodes exact graph was the suite's one quadratic plan — fine
    * at sf ≤ 1, the first thing to die at 100×.)
    */
  val KnnRecallProbes = 64

  def qKnnRecall(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.embeddings(s, d).filter(col("vec_id") % 4 === 0)
    // hash-ordered bounded probe draw: plans as TakeOrderedAndProject
    // (no full sort), broadcast into bruteForceTopK's query side
    val probes = nodes.orderBy(
        TextAnalysis.hash60(col("vec_id").cast(StringType)).asc,
        col("vec_id").asc)
      .limit(KnnRecallProbes)
    val exact = Ann.bruteForceTopK(nodes, probes, "vec_id", "embedding", 3)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
    def readout(g: DataFrame, name: String) = {
      val hit = exact.join(g.select(col("src"), col("dst")),
        Seq("src", "dst"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(lit(name).as("variant"), col("n_exact"), col("n_hit"),
          round(col("n_hit").cast(DoubleType) /
            col("n_exact").cast(DoubleType), 6).as("recall"))
    }
    val seed = graft.sim.KnnGraph.build(nodes, "vec_id", "embedding",
      k = 3, rounds = 0)
    // the refined (rounds = 2) graph is exactly what the persisted
    // store holds — serve it instead of paying a second descent
    val refined = knnGraphServe(s, d)
    readout(seed, "seed").union(readout(refined, "refined"))
  }

  lazy val qKnnRecallSql: String =
    s"""WITH $knnGraphCtesSql,
       |pr AS MATERIALIZED (SELECT id, vec, nrm FROM n
       |  ORDER BY ${hash60Sql("cast(id as varchar)")} ASC, id ASC
       |  LIMIT $KnnRecallProbes),
       |ex AS (SELECT src, dst FROM (
       |  SELECT a.id AS src, b.id AS dst, row_number() OVER (
       |      PARTITION BY a.id ORDER BY
       |        ${knnCosSql("a.vec", "b.vec", "a.nrm", "b.nrm")} DESC,
       |        b.id ASC) AS rk
       |  FROM pr a JOIN n b ON a.id <> b.id) WHERE rk <= 3),
       |hit0 AS (SELECT count(*) AS n_hit FROM ex JOIN g0 USING (src, dst)),
       |hit2 AS (SELECT count(*) AS n_hit FROM ex JOIN g2 USING (src, dst)),
       |tot AS (SELECT count(*) AS n_exact FROM ex)
       |SELECT 'seed' AS variant, n_exact, n_hit,
       |  round(cast(n_hit as double) / cast(n_exact as double), 6) AS recall
       |FROM tot CROSS JOIN hit0
       |UNION ALL
       |SELECT 'refined' AS variant, n_exact, n_hit,
       |  round(cast(n_hit as double) / cast(n_exact as double), 6) AS recall
       |FROM tot CROSS JOIN hit2""".stripMargin

  /** Margin-based bitext mining (graft.sim.BitextMine — the
    * LASER/CCMatrix parallel-corpus recipe): the even-id and odd-id
    * embedding halves stand in for source/target sentence
    * collections; forward and backward top-4 cosine neighbors feed
    * the ratio margin cos/((avgF+avgB)/2), and each source keeps its
    * best-margin pair with the ≥1.05 accept verdict. The oracle
    * replays the whole pipeline — both k-NN directions, the
    * DECIMAL-exact neighbor averages, the margin rank — so hub
    * deflation itself is hash-verified.
    */
  def qBitextMargin(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    graft.sim.BitextMine.mine(
      emb.filter(col("vec_id") % 4 === 0),
      emb.filter(col("vec_id") % 4 === 1),
      "vec_id", "embedding", k = 4)
  }

  lazy val qBitextMarginSql: String =
    s"""WITH xs AS (SELECT vec_id AS id, embedding AS vec
       |  FROM embeddings WHERE vec_id % 4 = 0),
       |ys AS (SELECT vec_id AS id, embedding AS vec
       |  FROM embeddings WHERE vec_id % 4 = 1),
       |nx AS (SELECT id, vec, sqrt(${listDotSql("vec", "vec")}) AS nrm FROM xs),
       |ny AS (SELECT id, vec, sqrt(${listDotSql("vec", "vec")}) AS nrm FROM ys),
       |sims AS (SELECT x.id AS xid, y.id AS yid,
       |    CASE WHEN x.nrm * y.nrm > 0
       |      THEN ${listDotSql("x.vec", "y.vec")} / (x.nrm * y.nrm)
       |      ELSE 0.0 END AS sim_raw
       |  FROM nx x CROSS JOIN ny y),
       |fwd AS (SELECT xid, yid, round(sim_raw, 6) AS sim FROM (
       |  SELECT xid, yid, sim_raw, row_number() OVER (PARTITION BY xid
       |    ORDER BY sim_raw DESC, yid ASC) AS rk FROM sims) WHERE rk <= 4),
       |bwd AS (SELECT xid, yid, round(sim_raw, 6) AS sim FROM (
       |  SELECT xid, yid, sim_raw, row_number() OVER (PARTITION BY yid
       |    ORDER BY sim_raw DESC, xid ASC) AS rk FROM sims) WHERE rk <= 4),
       |af AS (SELECT xid, cast(sum(cast(sim as decimal(18,6))) as double)
       |    / count(*) AS avg_f FROM fwd GROUP BY 1),
       |ab AS (SELECT yid, cast(sum(cast(sim as decimal(18,6))) as double)
       |    / count(*) AS avg_b FROM bwd GROUP BY 1),
       |cand AS (SELECT DISTINCT src, tgt, sim FROM (
       |  SELECT xid AS src, yid AS tgt, sim FROM fwd
       |  UNION ALL SELECT xid AS src, yid AS tgt, sim FROM bwd)),
       |m AS (SELECT c.src, c.tgt, c.sim,
       |    c.sim / ((af.avg_f + ab.avg_b) / 2.0) AS margin
       |  FROM cand c JOIN af ON c.src = af.xid JOIN ab ON c.tgt = ab.yid
       |  WHERE (af.avg_f + ab.avg_b) / 2.0 > 0)
       |SELECT src, tgt, sim, round(margin, 6) AS margin,
       |  margin >= ${graft.sim.BitextMine.AcceptMargin} AS accepted
       |FROM (SELECT src, tgt, sim, margin, row_number() OVER (
       |  PARTITION BY src ORDER BY margin DESC, tgt ASC) AS rk FROM m)
       |WHERE rk = 1""".stripMargin

  /** URL canonicalization → exact-URL dedup (graft.text.UrlOps
    * .canonicalize): a deterministic recrawl zoo — six messy variants
    * per page (uppercase scheme/host, default ports, fragments,
    * www-prefix, utm_ and gclid tracking params, shuffled param order,
    * trailing slash) — collapses onto canonical keys; the http
    * variant stays a separate key (scheme is preserved, not folded).
    * Per canonical URL: docs folded, distinct raw spellings, owning
    * doc, and the eTLD+1 the canonical key feeds into per-domain
    * policy. Canonicalize + group-on-key is THE first dedup a crawl
    * corpus runs — cheaper than any content hash because it needs no
    * document bytes at all.
    */
  def qUrlCanon(s: SparkSession, d: String): DataFrame = {
    import graft.text.{UrlOps => U}
    val docs = Tables.documents(s, d)
    val v = TextAnalysis.hash60(col("doc_id").cast(StringType)) % 6
    val p = pmod(col("doc_id"), lit(50)).cast(StringType)
    val url =
      when(v === 0, concat(lit("https://"), col("source"), lit(".com/page/"),
        p, lit("?a=1&b=2")))
      .when(v === 1, concat(lit("HTTPS://"), upper(col("source")),
        lit(".com:443/page/"), p, lit("?b=2&a=1#frag")))
      .when(v === 2, concat(lit("https://www."), col("source"),
        lit(".com/page/"), p, lit("/?a=1&b=2&utm_source=x")))
      .when(v === 3, concat(lit("https://"), col("source"),
        lit(".com:443/page/"), p, lit("?b=2&utm_campaign=y&a=1")))
      .when(v === 4, concat(lit("https://"), col("source"),
        lit(".com/page/"), p, lit("/?gclid=abc123&a=1&b=2")))
      .otherwise(concat(lit("http://"), col("source"), lit(".com:80/page/"),
        p, lit("?a=1&b=2")))
    docs.withColumn("url", url)
      .withColumn("canon", U.canonicalize(col("url")))
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_raw"),
        min(col("doc_id")).as("owner_doc"))
      .withColumn("domain", U.etld1(U.host(col("canon"))))
  }

  lazy val qUrlCanonSql: String = {
    import graft.text.{UrlOps => U}
    val h = s"${hash60Sql("cast(doc_id as varchar)")} % 6"
    s"""WITH u AS (SELECT doc_id,
       |  CASE WHEN $h = 0 THEN 'https://' || source || '.com/page/' || (doc_id % 50) || '?a=1&b=2'
       |       WHEN $h = 1 THEN 'HTTPS://' || upper(source) || '.com:443/page/' || (doc_id % 50) || '?b=2&a=1#frag'
       |       WHEN $h = 2 THEN 'https://www.' || source || '.com/page/' || (doc_id % 50) || '/?a=1&b=2&utm_source=x'
       |       WHEN $h = 3 THEN 'https://' || source || '.com:443/page/' || (doc_id % 50) || '?b=2&utm_campaign=y&a=1'
       |       WHEN $h = 4 THEN 'https://' || source || '.com/page/' || (doc_id % 50) || '/?gclid=abc123&a=1&b=2'
       |       ELSE 'http://' || source || '.com:80/page/' || (doc_id % 50) || '?a=1&b=2' END AS url
       |FROM documents),
       |c AS (SELECT doc_id, url, ${U.canonicalizeSql("url")} AS canon FROM u),
       |g AS (SELECT canon, count(*) AS n_docs,
       |    count(distinct url) AS n_raw, min(doc_id) AS owner_doc
       |  FROM c GROUP BY 1),
       |d AS (SELECT canon, n_docs, n_raw, owner_doc,
       |  string_split(${U.hostSql("canon")}, '.') AS ls FROM g)
       |SELECT canon, n_docs, n_raw, owner_doc, ${U.etld1Sql("ls")} AS domain
       |FROM d""".stripMargin
  }

  /** Interpolated Kneser–Ney bigram scoring
    * (graft.text.BigramLm.scoreKneserNey): the smoothed sibling of
    * `q_bigram_lm` — absolute discount 0.75, backoff mass routed
    * through CONTINUATION counts (how many distinct left contexts a
    * word follows), the standard fix for MLE's "San Francisco makes
    * Francisco look fluent everywhere" artifact. The oracle replays
    * the discounting, both fanout tables, the continuation total, and
    * the quantized per-doc sums.
    */
  def qKnBigram(s: SparkSession, d: String): DataFrame =
    graft.text.BigramLm.scoreKneserNey(Tables.documents(s, d),
      "doc_id", "text")

  val qKnBigramSql: String = {
    val sc = graft.text.BigramLm.Scale
    val dd = graft.text.BigramLm.Discount
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |u AS (SELECT doc_id,
       |        unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
       |          i -> toks[i] || ' ' || toks[i+1])) AS bg
       |      FROM t),
       |cb AS (SELECT bg, count(*) AS cb FROM u GROUP BY bg),
       |lft AS (SELECT split_part(bg, ' ', 1) AS w1,
       |        cast(sum(cb) as bigint) AS cl, count(*) AS n1l
       |        FROM cb GROUP BY 1),
       |rgt AS (SELECT split_part(bg, ' ', 2) AS w2, count(*) AS n1r
       |        FROM cb GROUP BY 1),
       |tot AS (SELECT count(*) AS n1t FROM cb),
       |q AS (SELECT bg, cast(round(ln(
       |        greatest(cast(cb as double) - $dd, 0.0) / cast(cl as double)
       |        + (($dd * cast(n1l as double)) / cast(cl as double))
       |          * (cast(n1r as double) / cast(n1t as double))) * $sc)
       |        as bigint) AS lp
       |      FROM cb JOIN lft ON split_part(cb.bg, ' ', 1) = lft.w1
       |              JOIN rgt ON split_part(cb.bg, ' ', 2) = rgt.w2
       |              CROSS JOIN tot),
       |p AS (SELECT u.doc_id, count(*) AS n_bigrams,
       |        cast(sum(q.lp) as bigint) AS slp
       |      FROM u JOIN q USING (bg) GROUP BY u.doc_id)
       |SELECT d.doc_id,
       |  coalesce(p.n_bigrams, 0) AS n_bigrams,
       |  round(CASE WHEN p.n_bigrams > 0
       |        THEN cast(p.slp as double) / p.n_bigrams / $sc.0
       |        ELSE 0.0 END, 6) AS avg_logp
       |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin
  }

  /** Stride-scheduled training order (graft.ops.Curriculum): the
    * global interleaved ordering a data loader streams, with each
    * source appearing in any prefix proportionally to its temperature
    * weight √n (T=2 mixing) — the deterministic last mile after
    * q_mix_opt decides the proportions. The oracle replays the
    * within-domain hash-shuffled ranks, the virtual times, and the
    * global (vtime, domain, id) order; the engine computes both ranks
    * range-sharded (never a per-domain or single-reducer window), and
    * the hash matching the oracle's textbook windows is exactly the
    * sharded-rank ≡ global-window law.
    */
  def qCurriculum(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val weights = docs.groupBy(col("source"))
      .agg(sqrt(count(lit(1)).cast(DoubleType)).as("weight"))
    graft.ops.Curriculum.order(docs, "doc_id", "source", weights)
      .select(col("position"), col("id").as("doc_id"),
        col("domain").as("source"), col("domain_rank"), col("vtime"))
  }

  val qCurriculumSql: String =
    s"""WITH k AS (SELECT doc_id, source,
       |  ${hash60Sql("cast(doc_id as varchar)")} AS shuf FROM documents),
       |r AS (SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY shuf, doc_id) - 1
       |      AS dr
       |  FROM k),
       |w AS (SELECT source, sqrt(cast(count(*) as double)) AS wt
       |  FROM documents GROUP BY 1),
       |v AS (SELECT r.doc_id, r.source, r.dr,
       |    (cast(r.dr as double) + 1.0) / w.wt AS vtime
       |  FROM r JOIN w USING (source))
       |SELECT row_number() OVER (ORDER BY vtime, source, doc_id) - 1
       |    AS position,
       |  doc_id, source, dr AS domain_rank, round(vtime, 6) AS vtime
       |FROM v""".stripMargin

  /** Exactly-8-per-source WEIGHTED sample without replacement
    * (graft.ops.Sampling.weightedSampleK — Efraimidis–Spirakis
    * priorities, quality-clamped weights): the principled weighted
    * eval-carving draw. The engine runs the bounded TopKAgg heap (no
    * per-group window); the oracle replays the quantized ln(u)/w
    * priorities with the textbook row_number window — the
    * aggregate ≡ window law, hash-gated.
    */
  def qWeightedK(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      least(lit(1.0), greatest(lit(0.05),
        TextAnalysis.qualityScore(col("text")))).as("w"))
    graft.ops.Sampling.weightedSampleK(docs, "doc_id", Seq("source"),
      "w", n = 8)
  }

  val qWeightedKSql: String =
    s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
       |w AS (SELECT doc_id, source,
       |    least(1.0, greatest(0.05, ${qualityExprSql("toks", "text")})) AS w
       |  FROM t),
       |p AS (SELECT doc_id, source,
       |    cast(round(ln(${graft.ops.Sampling.coordinateSql("doc_id")})
       |      / w * 1000000000.0) as bigint) AS pr
       |  FROM w),
       |r AS (SELECT source, doc_id, row_number() OVER (
       |    PARTITION BY source ORDER BY pr DESC, doc_id ASC) AS rnk
       |  FROM p)
       |SELECT source, rnk, doc_id FROM r WHERE rnk <= 8""".stripMargin

  /** SoftDedup per-source readout (graft.dedup.Dedup
    * .softDedupWeights): duplicates are REWEIGHTED (1/cluster-size),
    * not dropped, and the per-source effective token mass — what the
    * training loss actually sees in expectation — is an exact
    * integer-micro sum. The oracle composes the full q_dup_clusters
    * recursive-CC replay, the cluster sizes, the per-doc quantized
    * effective mass, and the per-source rollup.
    */
  def qSoftDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val w = Dedup.softDedupWeights(docs, "doc_id", "text")
    docs.select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_toks"))
      .join(w, Seq("doc_id"))
      .withColumn("eff_micro",
        round(col("n_toks").cast(DoubleType) * 1e6d /
          col("csize").cast(DoubleType)).cast(LongType))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"),
        sum(col("n_toks")).as("raw_tokens"),
        round(sum(col("eff_micro")).cast(DoubleType) / 1e6d, 6)
          .as("eff_tokens"))
      .withColumn("kept_frac",
        round(col("eff_tokens") / col("raw_tokens").cast(DoubleType), 6))
  }

  lazy val qSoftDedupSql: String =
    s"""WITH cl AS (
       |$qDupClustersSql),
       |cs AS (SELECT cluster_id, count(*) AS csize FROM cl GROUP BY 1),
       |tk AS (SELECT doc_id, source, len($toksSql) AS n_toks FROM documents),
       |p AS (SELECT tk.source, cl.cluster_id, tk.n_toks,
       |    cast(round((cast(tk.n_toks as double) * 1000000.0)
       |      / cast(cs.csize as double)) as bigint) AS eff_micro
       |  FROM tk JOIN cl USING (doc_id) JOIN cs USING (cluster_id)),
       |g AS (SELECT source, count(*) AS n_docs,
       |    count(distinct cluster_id) AS n_clusters,
       |    cast(sum(n_toks) as bigint) AS raw_tokens,
       |    round(cast(sum(eff_micro) as double) / 1000000.0, 6)
       |      AS eff_tokens
       |  FROM p GROUP BY 1)
       |SELECT source, n_docs, n_clusters, raw_tokens, eff_tokens,
       |  round(eff_tokens / cast(raw_tokens as double), 6) AS kept_frac
       |FROM g""".stripMargin

  /** Embedding-space benchmark decontamination
    * (graft.sim.SemanticDecontam): the semantic complement of
    * `q_decontam`'s verbatim n-gram scrub — paraphrased eval leakage
    * has no shared 5-grams but lands at cosine ≈ 1. Eval set = the
    * vec_id % 13 slice; corpus = the complement PLUS planted
    * near-copies (first component shifted +0.125 — cross-engine-exact
    * float arithmetic) that must all be flagged at τ = 0.9 while the
    * natural corpus (max cos ≈ 0.5 against eval) stays clean. One
    * broadcast of the bounded eval side, one narrow corpus pass, one
    * argmax struct aggregate — replayed in the oracle with the
    * textbook window.
    */
  def qSemDecontam(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val evalSet = emb.filter(col("vec_id") % 13 === 0)
      .select(col("vec_id"), col("embedding"))
    val planted = evalSet.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      concat(
        array((element_at(col("embedding"), 1) + lit(0.125f)).cast(FloatType)),
        slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = emb.filter(col("vec_id") % 13 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .union(planted)
    graft.sim.SemanticDecontam.report(corpus, evalSet,
      "vec_id", "embedding", tau = 0.9)
  }

  lazy val qSemDecontamSql: String =
    s"""WITH ev AS (SELECT vec_id AS eval_id, embedding AS evec
       |  FROM embeddings WHERE vec_id % 13 = 0),
       |en AS (SELECT eval_id, evec,
       |  sqrt(${listDotSql("evec", "evec")}) AS en FROM ev),
       |pl AS (SELECT vec_id + 1000000 AS id,
       |    list_prepend(cast(embedding[1] + 0.125 as float),
       |      embedding[2:len(embedding)]) AS cvec
       |  FROM embeddings WHERE vec_id % 13 = 0),
       |co AS (SELECT vec_id AS id, embedding AS cvec
       |  FROM embeddings WHERE vec_id % 13 <> 0
       |  UNION ALL SELECT id, cvec FROM pl),
       |cn AS (SELECT id, cvec,
       |  sqrt(${listDotSql("cvec", "cvec")}) AS cn FROM co),
       |s AS (SELECT cn.id, en.eval_id,
       |    CASE WHEN cn.cn * en.en > 0
       |      THEN ${listDotSql("cn.cvec", "en.evec")} / (cn.cn * en.en)
       |      ELSE 0.0 END AS sim
       |  FROM cn CROSS JOIN en),
       |r AS (SELECT id, sim, eval_id, row_number() OVER (
       |    PARTITION BY id ORDER BY sim DESC, eval_id DESC) AS rk FROM s)
       |SELECT id, round(sim, 6) AS max_sim, eval_id AS nearest_eval,
       |  sim >= 0.9 AS contaminated
       |FROM r WHERE rk = 1""".stripMargin

  /** Per-source lexical diversity: distinct-n/total-n ratios for
    * n = 1, 2, 3 (corpus-level type-token ratios — the Self-BLEU-class
    * health metric; template farms and synthetic spam collapse these
    * ratios relative to varied prose, with the n = 2/3 orders the
    * sharper signal because frame bigrams repeat verbatim) plus
    * per-doc token mass. One explode + grouped distinct count per
    * order; everything partial-aggregates map-side; output is
    * source-sized.
    */
  def qDiversity(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    def stats(n: Int) = docs
      .select(col("source"),
        explode(TextAnalysis.wordNgrams(col("text"), n)).as("g"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as(s"total_$n"),
        countDistinct(col("g")).as(s"distinct_$n"))
    val base = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    Seq(1, 2, 3).map(stats).foldLeft(base)(_.join(_, Seq("source")))
      .select(col("source"), col("n_docs"), col("total_1").as("n_tokens"),
        round(col("distinct_1").cast(DoubleType) /
          col("total_1").cast(DoubleType), 6).as("ttr1"),
        round(col("distinct_2").cast(DoubleType) /
          col("total_2").cast(DoubleType), 6).as("ttr2"),
        round(col("distinct_3").cast(DoubleType) /
          col("total_3").cast(DoubleType), 6).as("ttr3"))
  }

  lazy val qDiversitySql: String = {
    def ngramsSql(n: Int) =
      if (n == 1) "toks"
      else {
        val joined = (0 until n).map(o => s"toks[i+$o]").mkString(" || ' ' || ")
        s"""list_transform(range(1, greatest(len(toks) - ${n - 1}, 0) + 1),
           |  i -> $joined)""".stripMargin
      }
    def statsCte(n: Int) =
      s"""s$n AS (SELECT source, count(*) AS total_$n,
         |    count(distinct g) AS distinct_$n
         |  FROM (SELECT source, unnest(${ngramsSql(n)}) AS g FROM t)
         |  GROUP BY 1)""".stripMargin
    s"""WITH t AS (SELECT source, $toksSql AS toks FROM documents),
       |b AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
       |${statsCte(1)}, ${statsCte(2)}, ${statsCte(3)}
       |SELECT source, n_docs, cast(total_1 as bigint) AS n_tokens,
       |  round(cast(distinct_1 as double) / cast(total_1 as double), 6) AS ttr1,
       |  round(cast(distinct_2 as double) / cast(total_2 as double), 6) AS ttr2,
       |  round(cast(distinct_3 as double) / cast(total_3 as double), 6) AS ttr3
       |FROM b JOIN s1 USING (source) JOIN s2 USING (source)
       |       JOIN s3 USING (source)""".stripMargin
  }

  /** Per-source Zipf slope — the vocabulary health check: natural
    * language's token frequencies follow rank^s with s ≈ −1; template
    * farms and synthetic spam bend the curve (flat head or cliff
    * tail). The fit is OLS of ln(count) on ln(rank) over the BOUNDED
    * top-64 tokens per source (graft.functions.TopKAgg — map-side
    * partials, no per-source sort), with the log points quantized to
    * integer nano-nats and every OLS sum accumulated EXACTLY
    * (decimal(38) products — a 64-point sum of ~1e20 cross terms
    * overflows a long), so the slope is one double divide over exact
    * integers, hash-replayable.
    */
  def qZipf(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val tops = counts.groupBy(col("source"))
      .agg(graft.functions.TopKAgg.top_k_by(col("cnt"),
        TextAnalysis.hash60(col("tok")), 64).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("source"), (col("p") + 1).cast(LongType).as("rank"),
        col("t.ord").as("cnt"))
    val pts = tops.select(col("source"), col("rank"), col("cnt"),
      round(log(col("rank").cast(DoubleType)) * 1e9d).cast(LongType).as("xq"),
      round(log(col("cnt").cast(DoubleType)) * 1e9d).cast(LongType).as("yq"))
    val dec = DecimalType(38, 0)
    val agg = pts.groupBy(col("source")).agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("xq").cast(dec)).as("sx"),
      sum(col("yq").cast(dec)).as("sy"),
      sum((col("xq").cast(dec) * col("yq").cast(dec))).as("sxy"),
      sum((col("xq").cast(dec) * col("xq").cast(dec))).as("sxx"),
      max(col("cnt")).as("top1_count"))
    agg.select(col("source"), col("n").cast(LongType).as("n_points"),
      col("top1_count"),
      round((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType) /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType), 6)
        .as("zipf_slope"))
  }

  lazy val qZipfSql: String = {
    val h = hash60Sql("tok")
    s"""WITH c AS (SELECT source, tok, count(*) AS cnt
       |  FROM (SELECT source, unnest($toksSql) AS tok FROM documents)
       |  GROUP BY 1, 2),
       |r AS (SELECT source, cnt, row_number() OVER (PARTITION BY source
       |    ORDER BY cnt DESC, $h ASC) AS rank FROM c),
       |p AS (SELECT source, rank, cnt,
       |    cast(round(ln(cast(rank as double)) * 1000000000.0) as bigint) AS xq,
       |    cast(round(ln(cast(cnt as double)) * 1000000000.0) as bigint) AS yq
       |  FROM r WHERE rank <= 64),
       |a AS (SELECT source, cast(count(*) as hugeint) AS n,
       |    sum(cast(xq as hugeint)) AS sx,
       |    sum(cast(yq as hugeint)) AS sy,
       |    sum(cast(xq as hugeint) * yq) AS sxy,
       |    sum(cast(xq as hugeint) * xq) AS sxx,
       |    max(cnt) AS top1_count
       |  FROM p GROUP BY 1)
       |SELECT source, cast(n as bigint) AS n_points,
       |  cast(top1_count as bigint) AS top1_count,
       |  round(cast(n * sxy - sx * sy as double) /
       |        cast(n * sxx - sx * sx as double), 6) AS zipf_slope
       |FROM a""".stripMargin
  }

  /** Unicode-normalized fingerprinting
    * (graft.functions.UnicodeNorm — native NFC kernel): every doc
    * spawns a composed-form and a decomposed-form variant (é vs
    * e + U+0301), byte-level fingerprints see 2 distinct spellings,
    * NFC fingerprints collapse them to 1 — the dedup-evasion fix,
    * hash-gated against DuckDB's nfc_normalize over the whole corpus
    * (every document's text flows through both md5 paths).
    */
  def qNfcDedup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.UnicodeNorm.unicode_normalize
    val docs = Tables.documents(s, d)
    val composed = docs.select((col("doc_id") * 2).as("id"),
      concat(col("text"), lit(" café résumé")).as("t"))
    val decomposed = docs.select((col("doc_id") * 2 + 1).as("id"),
      concat(col("text"), lit(" café résumé")).as("t"))
    composed.union(decomposed)
      .select(col("id"), col("t"), md5(col("t")).as("raw_fp"),
        md5(unicode_normalize(col("t"), "NFC")).as("nfc_fp"))
      .groupBy(col("nfc_fp"))
      .agg(min(col("id")).as("owner_id"),
        count(lit(1)).as("n_variants"),
        countDistinct(col("raw_fp")).as("n_raw_fps"))
  }

  lazy val qNfcDedupSql: String = {
    val comp = "' caf' || chr(233) || ' r' || chr(233) || 'sum' || chr(233)"
    val decomp =
      "' cafe' || chr(769) || ' re' || chr(769) || 'sume' || chr(769)"
    s"""WITH v AS (
       |  SELECT doc_id * 2 AS id, text || $comp AS t FROM documents
       |  UNION ALL
       |  SELECT doc_id * 2 + 1 AS id, text || $decomp AS t FROM documents)
       |SELECT md5(nfc_normalize(t)) AS nfc_fp, min(id) AS owner_id,
       |  count(*) AS n_variants, count(distinct md5(t)) AS n_raw_fps
       |FROM v GROUP BY 1""".stripMargin
  }

  /** Per-source DATA CARD — the one-row-per-source summary a dataset
    * release publishes, composed from this engine's already-verified
    * operators: volume (docs, tokens), lexical diversity (bigram
    * TTR), vocabulary health (Zipf slope), duplication (clusters +
    * SoftDedup kept fraction), decimal-exact mean quality, and the
    * dominant language with its share. Pure composition — every
    * column's math is the oracle-verified operator it came from, and
    * the oracle composes those queries' full replays (including
    * SoftDedup's recursive CC) as CTEs.
    */
  def qDataCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val div = qDiversity(s, d)
      .select(col("source"), col("n_docs"), col("n_tokens"), col("ttr2"))
    val zp = qZipf(s, d).select(col("source"), col("zipf_slope"))
    val sd = qSoftDedup(s, d)
      .select(col("source"), col("n_clusters"), col("kept_frac"))
    val qq = docs.groupBy(col("source"))
      .agg(round(sum(TextAnalysis.qualityScore(col("text"))
        .cast(DecimalType(18, 6))).cast(DoubleType) / count(lit(1)), 6)
        .as("mean_quality"))
    val lc = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("c").desc, col("lang").asc)
    val lt = lc.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("c"))
    div.join(zp, Seq("source")).join(sd, Seq("source"))
      .join(qq, Seq("source")).join(lt, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("ttr2"),
        col("zipf_slope"), col("n_clusters"), col("kept_frac"),
        col("mean_quality"), col("top_lang"),
        round(col("c").cast(DoubleType) /
          col("n_docs").cast(DoubleType), 6).as("top_lang_share"))
  }

  lazy val qDataCardSql: String =
    s"""WITH dv AS (
       |$qDiversitySql),
       |zp AS (
       |$qZipfSql),
       |sd AS (
       |$qSoftDedupSql),
       |tq AS (SELECT source, text, $toksSql AS toks FROM documents),
       |qq AS (SELECT source,
       |    round(cast(sum(cast(${qualityExprSql("toks", "text")}
       |      as decimal(18,6))) as double) / count(*), 6) AS mean_quality
       |  FROM tq GROUP BY 1),
       |lc AS (SELECT source, lang, count(*) AS c FROM documents
       |  GROUP BY 1, 2),
       |lt AS (SELECT source, lang AS top_lang, c FROM (
       |  SELECT source, lang, c, row_number() OVER (PARTITION BY source
       |    ORDER BY c DESC, lang ASC) AS rn FROM lc) WHERE rn = 1)
       |SELECT dv.source, dv.n_docs, dv.n_tokens, dv.ttr2,
       |  zp.zipf_slope, sd.n_clusters, sd.kept_frac, qq.mean_quality,
       |  lt.top_lang,
       |  round(cast(lt.c as double) / cast(dv.n_docs as double), 6)
       |    AS top_lang_share
       |FROM dv JOIN zp USING (source) JOIN sd USING (source)
       |        JOIN qq USING (source) JOIN lt USING (source)""".stripMargin

  /** Mutual-kNN semantic clusters: reciprocal-nearest-neighbor
    * filtering (keep edge (a,b) only when a lists b AND b lists a —
    * the standard asymmetry filter that kills hub edges, used by
    * image/embedding dedup stacks) over the NN-Descent graph, then
    * connected components → cluster census. Scale shape: the mutual
    * join is an equi-join of the k-edge-per-node graph with itself
    * (≤ Nk rows a side), CC runs pointer-jumping on the filtered
    * edge list (O(log d) rounds), and the census is
    * component-keyed. The oracle replays the graph trajectory, the
    * reciprocity join, and the transitive closure.
    */
  def qMutualKnn(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.embeddings(s, d).filter(col("vec_id") % 4 === 0)
    // served from the persisted k-NN graph store (bit-equal to the
    // fresh build — see knnGraphServe): the reciprocity join + CC are
    // this query's own work; the descent is paid once per corpus
    // version across the whole suite, not once per consumer
    val g = knnGraphServe(s, d).select(col("src"), col("dst"))
    val mutual = g.as("a").join(g.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
      .filter(col("a.src") < col("a.dst"))
      .select(col("a.src").as("src"), col("a.dst").as("dst"))
    val comps = graft.ops.ConnectedComponents.run(
      nodes.select(col("vec_id").as("id")), mutual)
    comps.groupBy(col("component").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
  }

  lazy val qMutualKnnSql: String =
    s"""WITH RECURSIVE $knnGraphCtesSql,
       |mu AS (SELECT a.src AS src, a.dst AS dst FROM g2 a JOIN g2 b
       |  ON a.src = b.dst AND a.dst = b.src WHERE a.src < a.dst),
       |sym AS (SELECT src, dst FROM mu UNION SELECT dst, src FROM mu),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM sym
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON s.src = r.dst),
       |comp AS (SELECT src AS id, least(src, min(dst)) AS component
       |  FROM reach GROUP BY src),
       |allc AS (SELECT n.id, coalesce(c.component, n.id) AS component
       |  FROM n LEFT JOIN comp c ON c.id = n.id)
       |SELECT component AS cluster_id, count(*) AS n_members
       |FROM allc GROUP BY 1""".stripMargin

  /** k-NN graph served FROM the persisted src-bucketed store: the
    * graph is built once (NN-Descent), persisted bucketed by src with
    * the corpus-fingerprint staleness guard
    * (graft.dedup.IncrementalDedup discipline — the BUILD is a
    * by-name thunk, so a fresh store costs one fingerprint scan and
    * zero graph work), and "neighbors of these nodes" probes read
    * pre-hashed buckets — the serve path semantic dedup and
    * hard-negative mining hit many times per training run without
    * re-descending. Same oracle fragment as q_knn_graph BY DESIGN
    * (filtered to the probe set): the served rows must reproduce the
    * in-query graph bit-for-bit.
    */
  /** Ensure-and-read of the session's persisted k-NN graph store —
    * the SHARED serve path: q_knn_persisted, q_mutual_knn and
    * q_knn_recall's refined side all read this table, so a suite pays
    * ONE NN-Descent build (amortized behind the corpus-fingerprint
    * staleness guard) instead of one per consumer; q_knn_graph keeps
    * the fresh in-query build as the descent's own measurement. The
    * store's rows are bit-equal to the fresh build by construction
    * (same build thunk), which q_knn_persisted's oracle — the
    * q_knn_graph fragment filtered to the probe set — hash-verifies.
    *
    * Point-probe note (PlanShapeSpec pin): src-equality probes prune
    * to ONE of the 8 buckets only while the bucketed scan is active —
    * Spark's DisableUnnecessaryBucketedScan turns it off for a bare
    * filter read, so a point-lookup serving session sets
    * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false`;
    * src-keyed joins/aggregations keep the bucketing automatically.
    */
  private[queries] def knnGraphServe(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.embeddings(s, d).filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding"))
    val table = "graft_knn_graph_" + d.replaceAll("[^A-Za-z0-9]", "_")
    // logicV 2: the r16 adaptive seed plane count changes the graph a
    // store holds for node counts past the P=4 band without changing
    // the source fingerprint — stale stores must rebuild
    graft.dedup.IncrementalDedup.ensureBucketedState(
      nodes.select(col("vec_id"),
        col("embedding").cast(StringType).as("sig")),
      "vec_id", "sig", table, nBuckets = 8,
      bucketCols = Seq("src"), sortCols = Seq("src"), logicV = 2)(
      graft.sim.KnnGraph.build(nodes, "vec_id", "embedding",
        k = 3, rounds = 2))
    s.table(table)
  }

  def qKnnPersisted(s: SparkSession, d: String): DataFrame =
    knnGraphServe(s, d).filter(col("src") % 20 === 0)

  lazy val qKnnPersistedSql: String =
    s"""WITH $knnGraphCtesSql
       |SELECT src, dst, round(sim, 6) AS sim, rank FROM (
       |  SELECT src, dst, sim, row_number() OVER (PARTITION BY src
       |    ORDER BY sim DESC, dst ASC) AS rank FROM s2)
       |WHERE rank <= 3 AND src % 20 = 0""".stripMargin
}
