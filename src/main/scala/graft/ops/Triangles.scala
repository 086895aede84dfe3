package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected edge list — the local
  * clustering signal that complements [[ConnectedComponents]]
  * (membership) and [[PageRank]] (centrality) in the graph family: a
  * node's triangle count over its degree is its clustering
  * coefficient, the standard community-density / spam-farm signal on
  * co-occurrence graphs.
  *
  * Algorithm: compact-forward (degree-ordered node-iterator). Every
  * edge is oriented from its lower-(degree, id) endpoint to the
  * higher; wedges are pairs of out-edges of one node; a wedge closes
  * into a triangle iff its far endpoints are themselves an oriented
  * edge. Each triangle is found EXACTLY once (its lowest-ordered
  * vertex owns it), so no final dedup or /3 fixup is needed.
  *
  * Scale shape: the degree ordering is the whole story — out-degree
  * after orientation is bounded by O(√m) on any graph (a node of
  * degree d only keeps out-edges to nodes of degree ≥ d, and there
  * are at most 2m/d of those), so the wedge self-join fans out to
  * O(m^1.5) candidates worst-case — the provably optimal bound —
  * instead of Σdeg² of the naive node-iterator, which a single hub
  * node makes quadratic. Three shuffles: degree agg, wedge
  * self-join on the pivot, closure equi-join on (far, far) pairs.
  *
  * Reference semantics: standard triangle count; see e.g. Latapy,
  * "Main-memory triangle computations for very large (sparse
  * (power-law)) graphs", TCS 2008.
  */
object Triangles {

  /** Per-node triangle participation counts: (id, n_tri), one row per
    * node that closes at least one triangle. Input edges (src, dst)
    * are canonicalized (undirected, self-loops dropped, duplicates
    * collapsed) before counting.
    */
  def perNode(edges: DataFrame): DataFrame = {
    val canon = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = canon.select(col("u").as("id"))
      .unionAll(canon.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // total order: (deg, id) packed into one sortable struct column
    val withOrd = canon
      .join(deg.withColumnRenamed("id", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("id", "v").withColumnRenamed("deg", "dv"), "v")
    val uFirst = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    // NOT persisted although consumed three times (both wedge sides +
    // the closure probe): the three consumers sit downstream of the
    // same Exchanges, so ReusedExchange already shares the shuffle
    // files. A/B'd twice at sf0.1 — 25% slower with a MEMORY_AND_DISK
    // cache on the round-6 files, parity (±1%) on the regenerated
    // single-row-group round-8 files — so the cache never wins and
    // costs suite-wide memory pressure.
    val oriented = withOrd.select(
      when(uFirst, col("u")).otherwise(col("v")).as("a"),
      when(uFirst, col("v")).otherwise(col("u")).as("b"),
      // far endpoint's order key, for deterministic wedge orientation
      // (b1 < b2 under the same (deg, id) total order)
      when(uFirst, struct(col("dv").as("d"), col("v").as("i")))
        .otherwise(struct(col("du").as("d"), col("u").as("i")))
        .as("bord"))
    // The wedge self-join runs over a PINNED hash(a) exchange
    // (Parallelism.hashBy, shared by both sides via ReusedExchange):
    // AQE otherwise coalesces the pivot exchange by the oriented edge
    // list's input bytes (small) while the join OUTPUT is the
    // O(m^1.5) wedge fan-out — measured at sf0.1 the whole
    // enumeration sat on a handful of tasks (68 tasks, 12 s CPU,
    // 2.5 s wall). The pin spreads the fan-out across the session's
    // shuffle width; at scale it is the same exchange the join needed
    // anyway.
    val orientedWide = Parallelism.hashBy(oriented, col("a"))
    val e1 = orientedWide.select(col("a"), col("b").as("b1"), col("bord").as("o1"))
    val e2 = orientedWide.select(col("a"), col("b").as("b2"), col("bord").as("o2"))
    val wedges = e1.join(e2, Seq("a")).filter(col("o1") < col("o2"))
    val closure = oriented.select(col("a").as("b1"), col("b").as("b2"))
    val tris = wedges.join(closure, Seq("b1", "b2"))
      .select(col("a"), col("b1"), col("b2"))
    tris.select(explode(array(col("a"), col("b1"), col("b2"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
  }

  /** Local clustering coefficient per node: 2·tri(v) / (deg(v)·(deg(v)−1))
    * over the canonicalized simple graph — the per-node community-density
    * readout built on [[perNode]]'s triangle counts. Emits every node of
    * degree ≥ 2 (where the coefficient is defined), with nodes that close
    * no triangle at coefficient 0 — so the output is the full denominator
    * population, not just the triangle-dense survivors.
    *
    * Scale shape: adds ONE degree aggregate and one left join to
    * [[perNode]]'s O(m^1.5)-bounded count; the join key is the node id,
    * so it shuffles node-cardinality frames only (the wedge fan-out never
    * re-materializes). The coefficient arithmetic is
    * (2·n_tri) / (deg·(deg−1)) in doubles, rounded to 6 dp — the exact
    * operation order the DuckDB oracle mirrors.
    */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val canon = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val deg = canon.select(col("u").as("id"))
      .unionAll(canon.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val nt = coalesce(col("n_tri"), lit(0L))
    deg.filter(col("deg") >= 2)
      .join(perNode(edges), Seq("id"), "left_outer")
      .select(col("id"), col("deg"), nt.as("n_tri"),
        round(nt.cast("double") * 2.0d /
          (col("deg").cast("double") * (col("deg").cast("double") - 1.0d)),
          6).as("coef"))
  }
}
