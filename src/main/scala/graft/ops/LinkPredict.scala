package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph link prediction from local neighborhood structure —
  * Adamic–Adar (2003), resource allocation (Zhou et al. 2009), and
  * neighbor-set Jaccard — scored for NON-adjacent candidate pairs
  * that share at least one neighbor, the "which edge appears next"
  * readout recommender and graph-completion pipelines run.
  *
  * Scale shape: candidates enumerate as WEDGES (u–w–v through a
  * common neighbor w) — the [[Triangles]] join discipline: cost
  * Σ_w deg(w)², bounded by capping hub degree upstream, never an
  * all-pairs product. Scores aggregate per pair with map-side
  * combine; the published report is top-k via TakeOrdered, so output
  * is O(k) however dense the candidate set.
  *
  * Determinism: common-neighbor and degree counts are exact
  * integers; the AA wedge term 1/log2(deg w) quantizes to integer
  * nano-units per wedge (one libm log2 whose last-bit variance is
  * ~10⁻⁷ nano-units — far below the 0.5 rounding boundary, the
  * q_bm25/linkage precedent), the RA term 1e9/deg is a rounded IEEE
  * division, and the integer sums finalize with one division each.
  */
object LinkPredict {

  /** Top-`k` non-adjacent pairs by Adamic–Adar: (id_a, id_b, common,
    * aa_score, ra_score, jaccard) ranked by (aa_nano DESC, id_a,
    * id_b). `edges` must be symmetric (src, dst); pairs report with
    * id_a < id_b.
    *
    * The cited definitions are over SIMPLE graphs — deg = |Γ(x)| and
    * common = |Γ(a)∩Γ(b)| count distinct NEIGHBORS — so multi-edges
    * are collapsed here before any counting. Feeding the raw
    * multigraph (co-purchase emits one (s,t) row per co-occurring
    * order) would weight both deg and common by edge multiplicity:
    * AA/RA drift off their definitions and the Jaccard denominator
    * deg_a + deg_b − common can even go non-positive (two multiplicity-5
    * parallel edges through one wedge give jaccard = −1.67), publishing
    * values outside [0,1] — an engine/oracle-consistent semantic error
    * the hash gate cannot see (ADVICE r15).
    */
  def adamicAdar(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    // The simple-graph frame is built ON a pinned hash(src) exchange
    // (Parallelism.hashBy) and cached: hash(src) satisfies the
    // distinct's (src, dst) clustering, so the dedup itself pays no
    // extra exchange, the degree count and the e2 wedge side consume
    // the layout in place, and — the actual fix — the wedge self-join
    // fans out at full shuffle width. Unpinned, AQE sizes the
    // partitions by the edge list's INPUT bytes (~10 MB → 1-2
    // partitions) while the join OUTPUT is Σ_w deg(w)² wedges, so the
    // enumeration ran ~35 s of CPU on two cores (measured at sf0.1:
    // 92 tasks, 4.0 s wall); pinned, the same CPU spreads across the
    // session's shuffle width. The cache also stops the distinct
    // being recomputed per consumer (deg, both wedge sides, the
    // anti-join, deg_a, deg_b — six references).
    val simple = graft.CacheRegistry.register(
      Parallelism.hashBy(edges.select(col("src"), col("dst")), col("src"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val deg = simple.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e1 = simple.alias("e1")
    val e2 = simple.alias("e2")
    // wedges u–w–v, u < v; w's degree ≥ 2 by construction (it touches
    // both u and v), so log2(deg) ≥ 1 and the AA term is finite
    val wedges = e1
      .join(e2, col("e1.dst") === col("e2.src") &&
        col("e1.src") < col("e2.dst"))
      .select(col("e1.src").as("id_a"), col("e2.dst").as("id_b"),
        col("e1.dst").as("w"))
      .join(deg.select(col("src").as("w"), col("deg")), Seq("w"))
    val scored = wedges
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"),
        sum(round(lit(1000000000.0) / log2(col("deg").cast(DoubleType)))
          .cast(LongType)).as("aa_nano"),
        sum(round(lit(1000000000.0) / col("deg").cast(DoubleType))
          .cast(LongType)).as("ra_nano"))
    // drop EXISTING edges (we predict absent ones) — left_anti on the
    // symmetric edge list, one direction suffices because id_a < id_b
    // and the list is symmetric
    val absent = scored.join(
      simple.select(col("src").as("id_a"), col("dst").as("id_b")),
      Seq("id_a", "id_b"), "left_anti")
    val degA = deg.select(col("src").as("id_a"), col("deg").as("deg_a"))
    val degB = deg.select(col("src").as("id_b"), col("deg").as("deg_b"))
    absent
      .join(degA, Seq("id_a")).join(degB, Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("common"),
        round(col("aa_nano").cast(DoubleType) / 1000000000.0, 6)
          .as("aa_score"),
        round(col("ra_nano").cast(DoubleType) / 1000000000.0, 6)
          .as("ra_score"),
        round(col("common").cast(DoubleType) /
          (col("deg_a") + col("deg_b") - col("common")).cast(DoubleType), 6)
          .as("jaccard"),
        col("aa_nano"))
      .orderBy(col("aa_nano").desc, col("id_a").asc, col("id_b").asc)
      .limit(k)
      .drop("aa_nano")
  }

  /** DuckDB mirror of [[adamicAdar]] — expects `edges(src, dst)`
    * upstream; CTE chain ending in `linkpred` (top-k included).
    * Collapses multi-edges first (`sedges`), mirroring the engine's
    * simple-graph semantics.
    */
  def adamicAdarOracleSql(k: Int): String =
    s"""sedges AS (SELECT DISTINCT src, dst FROM edges),
       |degt AS (SELECT src, count(*) AS deg FROM sedges GROUP BY 1),
       |wedges AS (
       |  SELECT e1.src AS id_a, e2.dst AS id_b, e1.dst AS w
       |  FROM sedges e1 JOIN sedges e2
       |    ON e1.dst = e2.src AND e1.src < e2.dst),
       |scoredw AS (
       |  SELECT id_a, id_b, count(*) AS common,
       |    sum(cast(round(1000000000.0 /
       |      log2(cast(deg as double))) as bigint)) AS aa_nano,
       |    sum(cast(round(1000000000.0 /
       |      cast(deg as double)) as bigint)) AS ra_nano
       |  FROM wedges JOIN degt ON wedges.w = degt.src
       |  GROUP BY 1, 2),
       |absent AS (
       |  SELECT s.* FROM scoredw s
       |  WHERE NOT EXISTS (SELECT 1 FROM sedges e
       |    WHERE e.src = s.id_a AND e.dst = s.id_b)),
       |linkpred AS (
       |  SELECT id_a, id_b, cast(common as bigint) AS common,
       |    round(cast(aa_nano as double) / 1000000000.0, 6) AS aa_score,
       |    round(cast(ra_nano as double) / 1000000000.0, 6) AS ra_score,
       |    round(cast(common as double) /
       |      cast(da.deg + db.deg - common as double), 6) AS jaccard
       |  FROM absent
       |  JOIN degt da ON absent.id_a = da.src
       |  JOIN degt db ON absent.id_b = db.src
       |  ORDER BY aa_nano DESC, id_a ASC, id_b ASC LIMIT $k)""".stripMargin
}
