package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Isotonic regression by Pool-Adjacent-Violators (Ayer et al. 1955;
  * Barlow & Brunk 1972) over pre-aggregated score bins — the
  * standard probability-calibration fit (Zadrozny & Elkan 2002)
  * one step up from reliability diagrams: replace each bin's raw
  * positive rate with the closest NON-DECREASING sequence in
  * weighted L².
  *
  * Determinism (the whole point of this formulation): the fit runs
  * ENTIRELY in integer arithmetic. Pool state is (lo, w, s) with
  * integer weight/label sums in DECIMAL(38,0); the violation test
  * mean(a) > mean(b) is the cross-multiplication s_a·w_b > s_b·w_a
  * (never a float division); each round merges exactly the FIRST
  * violating adjacent pair, so `maxBins − 1` rounds reach the unique
  * PAV fixpoint. The only float is the final fitted mean, one
  * round(·,6) division per pool — an SQL oracle replays the rounds
  * as unrolled CTEs with identical integer tests.
  *
  * Scale shape: PAV runs on the BINNED frame (≤ maxBins rows), never
  * the corpus — binning is the caller's one map-side-combined
  * aggregate, after which every round here is constant-size work
  * (each round materialized; the lineage stays flat). The classic
  * streaming-PAV over raw points is inherently sequential; binning
  * first is how production calibrators sidestep that at any scale.
  */
object Isotonic {

  /** PAV over a GLOBAL bin table `bins(binCol, wCol, sCol)` (integer
    * weight = row count, integer s = positive count), bins ordered by
    * `binCol` ascending. Returns one row per INPUT bin: (bin, w, s,
    * pool_lo, iso_rate) where pool_lo identifies the pool the bin
    * landed in and iso_rate is its fitted non-decreasing rate.
    */
  def pavBins(bins: DataFrame, binCol: String, wCol: String, sCol: String,
      maxBins: Int): DataFrame = {
    require(maxBins >= 1 && maxBins <= 64, "bounded unroll only")
    val dec = DecimalType(38, 0)
    val base = bins.select(col(binCol).cast(LongType).as("lo"),
      col(wCol).cast(dec).as("w"), col(sCol).cast(dec).as("s"))
      .localCheckpoint(false)
    // PAV runs ON THE DRIVER over the collected bin table — the frame
    // is ≤ maxBins (≤ 64) rows BY CONTRACT, i.e. model-sized, the same
    // class as the k-means centroid collects. The former in-engine
    // loop ran each merge round as 3-5 Spark jobs over a ≤64-row frame
    // (a next-pool self join, a violation scan, a crossJoin rebuild,
    // a checkpoint count) — ~25-30 sequential driver round-trips of
    // pure scheduling latency per query (measured 3.1 s wall at sf0.1
    // against < 3 ms of actual arithmetic). Semantics are unchanged
    // and exactly the oracle's unrolled rounds: integer pool state
    // (BigInt ≡ decimal(38,0) sums), violation by cross-multiplication
    // (never a float division), merge the FIRST violating adjacent
    // pair per round, at most maxBins − 1 rounds to the unique PAV
    // fixpoint. The final iso_rate division + round(·,6) stays a
    // Spark expression below, so the published float is computed by
    // the same engine path as before.
    val collected = base.collect() // materializes the checkpoint too
      .map(r => (r.getLong(0),
        BigInt(r.getDecimal(1).toBigInteger),
        BigInt(r.getDecimal(2).toBigInteger)))
      .sortBy(_._1)
    // enforce the "model-sized by contract" invariant the collect
    // leans on: an oversized bin frame must fail loudly here, not
    // return an under-merged (non-isotonic) fit from a loop capped at
    // maxBins − 1 merges (ADVICE r16)
    require(collected.length <= maxBins,
      s"pavBins got ${collected.length} bins > maxBins=$maxBins")
    val pbuf = scala.collection.mutable.ArrayBuffer(collected: _*)
    var converged = false
    for (_ <- 1 until maxBins if !converged) {
      // first violating adjacent pair under (lo asc): mean(a) > mean(b)
      // as s_a·w_b > s_b·w_a — exact integer test
      val j = (0 until pbuf.length - 1).find { i =>
        pbuf(i)._3 * pbuf(i + 1)._2 > pbuf(i + 1)._3 * pbuf(i)._2
      }
      j match {
        case Some(i) =>
          val (lo, w, s) = pbuf(i)
          val (_, nw, ns) = pbuf(i + 1)
          pbuf(i) = (lo, w + nw, s + ns)
          pbuf.remove(i + 1)
        case None => converged = true
      }
    }
    val spark = bins.sparkSession
    val poolRows = pbuf.toSeq.map { case (lo, w, s) =>
      org.apache.spark.sql.Row(lo, new java.math.BigDecimal(w.bigInteger),
        new java.math.BigDecimal(s.bigInteger))
    }
    val pools = spark.createDataFrame(
      spark.sparkContext.parallelize(poolRows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("lo", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("w", dec, nullable = false),
        org.apache.spark.sql.types.StructField("s", dec, nullable = false))))
    // expand pools back to the input bins: a bin belongs to the pool
    // with the largest lo ≤ bin
    val owner = base.alias("bn")
      .join(pools.alias("p"), col("p.lo") <= col("bn.lo"))
      .groupBy(col("bn.lo").as("bin"), col("bn.w").as("w_bin"),
        col("bn.s").as("s_bin"))
      .agg(max(col("p.lo")).as("pool_lo"))
    owner.join(pools.alias("q"), col("pool_lo") === col("q.lo"))
      .select(col("bin"), col("w_bin").cast(LongType).as("w"),
        col("s_bin").cast(LongType).as("s"), col("pool_lo"),
        round(col("q.s").cast(DoubleType) / col("q.w").cast(DoubleType), 6)
          .as("iso_rate"))
  }

  /** DuckDB mirror: unrolled CTE rounds over an upstream CTE
    * `bins(lo, w, s)` (integers). Defines `pav(bin, w, s, pool_lo,
    * iso_rate)`.
    */
  def pavOracleSql(maxBins: Int): String = {
    // every CTE here is multi-referenced by later rounds; DuckDB
    // inlines non-MATERIALIZED CTEs per reference, which makes the
    // unrolled chain re-evaluate p0 (and the whole upstream binning)
    // exponentially — the q_mutual_knn oracle lesson
    def step(prev: String, cur: String): String =
      s"""${cur}_nxt AS MATERIALIZED (
         |  SELECT a.lo, a.w, a.s,
         |    (SELECT min(c.lo) FROM $prev c WHERE c.lo > a.lo) AS nlo
         |  FROM $prev a),
         |${cur}_adj AS MATERIALIZED (
         |  SELECT n.lo, n.w, n.s, n.nlo, b.w AS nw, b.s AS ns
         |  FROM ${cur}_nxt n JOIN $prev b ON n.nlo = b.lo),
         |${cur}_viol AS MATERIALIZED (
         |  SELECT min(lo) AS mlo FROM ${cur}_adj WHERE s * nw > ns * w),
         |$cur AS MATERIALIZED (
         |  SELECT p.lo,
         |    CASE WHEN p.lo = v.mlo THEN p.w + a.nw ELSE p.w END AS w,
         |    CASE WHEN p.lo = v.mlo THEN p.s + a.ns ELSE p.s END AS s
         |  FROM $prev p
         |  CROSS JOIN ${cur}_viol v
         |  LEFT JOIN ${cur}_adj a ON a.lo = v.mlo
         |  WHERE v.mlo IS NULL OR a.nlo IS NULL OR p.lo <> a.nlo)"""
        .stripMargin
    val rounds = (1 until maxBins)
      .map(k => step(if (k == 1) "p0" else s"p${k - 1}", s"p$k"))
      .mkString(",\n")
    val last = s"p${maxBins - 1}"
    s"""p0 AS MATERIALIZED (SELECT lo, cast(w as decimal(38,0)) AS w,
       |  cast(s as decimal(38,0)) AS s FROM bins),
       |$rounds,
       |owner AS (
       |  SELECT b.lo AS bin, b.w AS w_bin, b.s AS s_bin,
       |    (SELECT max(p.lo) FROM $last p WHERE p.lo <= b.lo) AS pool_lo
       |  FROM p0 b),
       |pav AS (
       |  SELECT o.bin, cast(o.w_bin as bigint) AS w,
       |    cast(o.s_bin as bigint) AS s, o.pool_lo,
       |    round(cast(q.s as double) / cast(q.w as double), 6) AS iso_rate
       |  FROM owner o JOIN $last q ON o.pool_lo = q.lo)""".stripMargin
  }
}
