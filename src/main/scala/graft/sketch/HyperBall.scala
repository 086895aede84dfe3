package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HyperBall (Boldi, Rosa & Vigna 2011): the neighborhood function
  * N(r) — how many node pairs are within distance ≤ r — estimated for
  * EVERY node simultaneously by iterating HLL register max-merges
  * along edges. The exact computation is an all-pairs BFS (Θ(N·M));
  * HyperBall is Θ(r·M·m) with m registers per node — the only known
  * way to get hop plots / effective diameters on web-scale graphs,
  * and the algorithm behind the "four degrees of separation"
  * measurement.
  *
  * Round r:  regs_r(v) = max-merge( regs_{r−1}(v),
  *                                  regs_{r−1}(u) ∀ (u→v) ∈ E )
  * seeded with regs_0(v) = sketch({v}). After round r, node v's
  * estimate reads |ball(v, r)|.
  *
  * Engine-portability: registers are [[Hll]]'s md5-derived
  * deterministic sketch, merged with integer MAX — every register
  * table is EXACTLY reproducible in SQL, so the oracle replays the
  * full propagation and the per-node estimates hash-match. Per-node
  * estimates are one double division each (never summed as raw
  * doubles); cross-node totals aggregate round(n_est) — the same
  * integral double in both engines — as exact integers.
  *
  * Scale shape: each round is ONE join edges ⋈ regs (both sides hash
  * on node id; with the adjacency pre-bucketed the probe side arrives
  * shuffle-free) + one (node, reg_idx) max-aggregate with map-side
  * combine. State is ≤ m rows per node — b is the knob that trades
  * accuracy (1.04/√m) for join fan-out; hop plots want aggregate
  * accuracy, so small b (64 registers) is the 100 TB setting, NOT the
  * cardinality-grade b=12.
  */
object HyperBall {

  /** Per-(node, r) ball-size estimates for r = 0..rounds: columns
    * (id, r, harmonic_scaled, zero_regs, n_est). `edges` must carry
    * (src, dst); propagation follows src→dst.
    *
    * The seeded node set is `nodes ∪ edges.dst`: on an asymmetric edge
    * list a dst-only node would otherwise enter the register table
    * from round 1 WITHOUT its own seed — its balls would exclude
    * itself, hopPlot's n_nodes would vary by r, and harmonicCentrality
    * would read NULL est0. The union is a no-op when nodes ⊇ dst (the
    * symmetric co-purchase graph), and makes the directed case
    * well-defined. The oracle seeds from the identical union.
    */
  def ballSizes(nodes: DataFrame, edges: DataFrame, rounds: Int,
      b: Int): DataFrame = {
    require(rounds >= 0 && rounds <= 8, "bounded iteration only")
    val seeded = nodes.select(col("id"))
      .unionAll(edges.select(col("dst").as("id"))).distinct()
    // every round's register table stays persisted until the consuming
    // action finishes (CacheRegistry releases them post-query): the
    // output reads ALL rounds, so an eager unpersist-the-parent loop
    // would silently re-run round r's join chain once per later round
    var regs = graft.CacheRegistry.register(
      Hll.registers(seeded, Seq("id"), "id", b)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var out = Hll.estimateFromRegisters(regs, Seq("id"), b)
      .withColumn("r", lit(0))
    for (r <- 1 to rounds) {
      val pushed = regs.alias("rg")
        .join(edges.alias("eg"), col("rg.id") === col("eg.src"))
        .select(col("eg.dst").as("id"), col("rg.reg_idx"), col("rg.reg_rank"))
      val next = graft.CacheRegistry.register(
        regs.select(col("id"), col("reg_idx"), col("reg_rank"))
          .unionAll(pushed)
          .groupBy(col("id"), col("reg_idx"))
          .agg(max(col("reg_rank")).as("reg_rank"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      // materialize so later rounds join the CACHED table, not a
      // re-derived lineage chain
      next.count()
      regs = next
      out = out.unionAll(
        Hll.estimateFromRegisters(regs, Seq("id"), b).withColumn("r", lit(r)))
    }
    out
  }

  /** Small-range (linear-counting) correction table: lc(V) =
    * m·ln(m/V) for V = 1..m−1, each value rounded to 6 decimals at
    * GENERATION time and emitted as the same literal into both the
    * Column expression and the oracle SQL — the correction input
    * (zero_regs) is an exact integer in both engines and the table is
    * shared text, so no libm ln() enters either runtime. (V = m never
    * occurs: every seeded node sets at least its own register.)
    */
  private[sketch] def lcLiterals(b: Int): IndexedSeq[String] = {
    val m = 1 << b
    (1 until m).map { v =>
      BigDecimal(m.toDouble * math.log(m.toDouble / v))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toString
    }
  }

  /** [[ballSizes]] quantized to the exact-integer per-node estimates
    * (id, r, est_i) — the all-integer form the persisted store keeps
    * and every downstream readout (hop plot, harmonic centrality)
    * derives from. est_i applies the standard HLL small-range
    * correction (Flajolet et al. 2007): when n_est < 2.5·m and some
    * registers are still zero, the linear-counting estimate
    * m·ln(m/zero_regs) replaces the raw harmonic estimate — this is
    * what makes r ≤ 1 balls read ≈ their true handful size instead of
    * the raw formula's ~0.7·m floor. Both branches are deterministic
    * cross-engine: n_est is one division of exact integers, and the
    * correction value comes from [[lcLiterals]]'s shared table.
    * (Near the correction→raw crossover the estimate is no longer
    * strictly non-decreasing in r; a shell diff can read slightly
    * negative — identically in both engines.)
    */
  def ballEstimatesInt(nodes: DataFrame, edges: DataFrame, rounds: Int,
      b: Int): DataFrame = {
    val m = 1 << b
    val lcArr = array(lcLiterals(b).map(s => lit(s.toDouble)): _*)
    val corrected = when(
      col("n_est") < lit(2.5 * m) && col("zero_regs") > 0L,
      element_at(lcArr, col("zero_regs").cast(IntegerType)))
      .otherwise(col("n_est"))
    ballSizes(nodes, edges, rounds, b)
      .select(col("id"), col("r"),
        round(corrected).cast(LongType).as("est_i"))
  }

  /** Aggregate hop plot from a (id, r, est_i) ball-estimate table:
    * per r, the node count, the exact-integer reach total, and the
    * mean ball size — the neighborhood-function curve.
    */
  def hopPlot(ballEstimates: DataFrame): DataFrame =
    ballEstimates
      .groupBy(col("r"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("est_i")).as("total_reach"))
      .select(col("r"), col("n_nodes"), col("total_reach"),
        round(col("total_reach").cast(DoubleType) /
          col("n_nodes").cast(DoubleType), 6).as("avg_reach"))

  /** Harmonic centrality from a (id, r, est_i) ball-estimate table
    * (Boldi & Vigna 2014): ĉ(v) = Σ_{r=1..R} (|ball(v,r)| −
    * |ball(v,r−1)|) / r — each shell counted at its distance — for
    * every node at once, read off the SAME register propagation the
    * hop plot used. Per-shell diffs are exact integers (max-merge
    * only grows registers, so est is non-decreasing in r); the score
    * is a sum of `rounds` single divisions, round(·,6)-ed once.
    * Output: top-`k` (id, est per r, centrality), ties broken by id —
    * a TakeOrdered-bounded readout, never a global sort.
    */
  def harmonicCentrality(ballEstimates: DataFrame, rounds: Int,
      k: Int): DataFrame = {
    val perR = (0 to rounds).map(r =>
      max(when(col("r") === r, col("est_i"))).as(s"est$r"))
    val wide = ballEstimates.groupBy(col("id")).agg(perR.head, perR.tail: _*)
    val score = (1 to rounds).map(r =>
      (col(s"est$r") - col(s"est${r - 1}")).cast(DoubleType) / lit(r.toDouble))
      .reduce(_ + _)
    wide.withColumn("centrality", round(score, 6))
      .orderBy(col("centrality").desc, col("id").asc)
      .limit(k)
  }

  /** EXACT per-seed ball sizes for a SAMPLED seed set — the
    * ANF-style validation counterpart of [[ballSizes]]: a (seed,
    * node) pair frontier expanded `rounds` times with a distinct per
    * round. Cost Θ(|seeds|·reach) — linear in seeds, which is why it
    * is the measurement harness (run on a hash-sampled 1/k of nodes)
    * and HyperBall is the production path (all nodes, no pair
    * materialization). Output: (seed, r, n_exact).
    */
  def exactBallSizes(seeds: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 0 && rounds <= 8, "bounded iteration only")
    var ball = graft.CacheRegistry.register(
      seeds.select(col("id").as("seed"), col("id").as("node"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var out = ball.groupBy(col("seed")).agg(count(lit(1)).as("n_exact"))
      .withColumn("r", lit(0))
    for (r <- 1 to rounds) {
      val next = graft.CacheRegistry.register(
        ball.alias("bl")
          .join(edges.alias("eg"), col("bl.node") === col("eg.src"))
          .select(col("bl.seed"), col("eg.dst").as("node"))
          .unionAll(ball.select(col("seed"), col("node")))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      next.count()
      ball = next
      out = out.unionAll(ball.groupBy(col("seed"))
        .agg(count(lit(1)).as("n_exact")).withColumn("r", lit(r)))
    }
    out.select(col("seed"), col("r"), col("n_exact"))
  }

  /** DuckDB mirror of [[exactBallSizes]]: CTE chain `ball0..ballN`
    * (seed, node) + per-r counts union `exact(seed, r, n_exact)`.
    * Expects `seeds(id)` and `edges(src, dst)` CTEs upstream.
    */
  def exactBallSizesOracleSql(rounds: Int): String = {
    val prop = (1 to rounds).map { r =>
      s"""ball$r AS MATERIALIZED (
         |  SELECT DISTINCT seed, node FROM (
         |    SELECT seed, node FROM ball${r - 1}
         |    UNION ALL
         |    SELECT b.seed, e.dst AS node
         |    FROM ball${r - 1} b JOIN edges e ON b.node = e.src))"""
        .stripMargin
    }.mkString(",\n")
    val counts = (0 to rounds).map(r =>
      s"SELECT seed, $r AS r, count(*) AS n_exact FROM ball$r GROUP BY 1")
      .mkString(" UNION ALL ")
    s"""ball0 AS (SELECT id AS seed, id AS node FROM seeds),
       |$prop,
       |exact AS ($counts)""".stripMargin
  }

  /** DuckDB CTE chain replaying seed + `rounds` max-merge
    * propagations into per-round integer ball estimates `est0..estN`
    * plus their union `allr(id, r, est_i)`. Expects CTEs `nodes(id)`
    * and `edges(src, dst)` already defined upstream.
    */
  def ballEstimatesOracleSql(rounds: Int, b: Int): String = {
    val m = 1 << b
    val rmax = Hll.rankMax(b)
    val wWidth = Hll.width(b)
    val h = s"cast(('0x' || substr(md5(cast(id as varchar)), 1, 15)) as bigint)"
    val prop = (1 to rounds).map { r =>
      s"""regs$r AS MATERIALIZED (
         |  SELECT id, reg_idx, max(reg_rank) AS reg_rank FROM (
         |    SELECT id, reg_idx, reg_rank FROM regs${r - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, p.reg_idx, p.reg_rank
         |    FROM regs${r - 1} p JOIN edges e ON p.id = e.src)
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    // the same small-range correction table ballEstimatesInt embeds —
    // shared literal text, indexed by the exact integer zero_regs
    val lcList = lcLiterals(b).mkString("[", ", ", "]")
    val estPerR = (0 to rounds).map { r =>
      s"""est$r AS (
         |  SELECT id, $r AS r,
         |    cast(round(CASE WHEN n_est < ${2.5 * m} AND zero_regs > 0
         |      THEN ($lcList)[zero_regs] ELSE n_est END) as bigint) AS est_i
         |  FROM (
         |    SELECT id,
         |      ${Hll.alphaM2Scaled(b)} / cast(
         |        sum(cast(1::BIGINT << ($rmax - reg_rank) as decimal(38,0))) +
         |        cast($m - count(*) as decimal(38,0)) *
         |          cast(1::BIGINT << $rmax as decimal(38,0)) as double) AS n_est,
         |      $m - count(*) AS zero_regs
         |    FROM regs$r GROUP BY 1))""".stripMargin
    }.mkString(",\n")
    val unions = (0 to rounds).map(r => s"SELECT * FROM est$r")
      .mkString(" UNION ALL ")
    s"""seeded AS (SELECT id FROM nodes UNION SELECT dst AS id FROM edges),
       |regs0 AS MATERIALIZED (
       |  SELECT id, $h % $m AS reg_idx,
       |    CASE WHEN $h // $m = 0 THEN $rmax
       |      ELSE ${wWidth + 1} - length(bin($h // $m)) END AS reg_rank
       |  FROM seeded),
       |$prop,
       |$estPerR,
       |allr AS ($unions)""".stripMargin
  }

  /** [[ballEstimatesOracleSql]] + the hop-plot aggregate CTE `hop`. */
  def hopPlotOracleSql(rounds: Int, b: Int): String =
    s"""${ballEstimatesOracleSql(rounds, b)},
       |hop AS (
       |  SELECT r, cast(count(*) as bigint) AS n_nodes,
       |    cast(sum(est_i) as bigint) AS total_reach,
       |    round(cast(sum(est_i) as double) / cast(count(*) as double), 6)
       |      AS avg_reach
       |  FROM allr GROUP BY 1)""".stripMargin

  /** [[ballEstimatesOracleSql]] + the top-k harmonic-centrality CTE
    * `central` (mirrors [[harmonicCentrality]]).
    */
  def harmonicCentralityOracleSql(rounds: Int, b: Int, k: Int): String = {
    val joins = (1 to rounds)
      .map(r => s"JOIN est$r e$r USING (id)").mkString(" ")
    val ests = (0 to rounds).map(r => s"e$r.est_i AS est$r").mkString(", ")
    val score = (1 to rounds)
      .map(r => s"cast(e$r.est_i - e${r - 1}.est_i as double) / $r.0")
      .mkString(" + ")
    s"""${ballEstimatesOracleSql(rounds, b)},
       |central AS (
       |  SELECT id, $ests, round($score, 6) AS centrality
       |  FROM est0 e0 $joins
       |  ORDER BY centrality DESC, id ASC LIMIT $k)""".stripMargin
  }
}
