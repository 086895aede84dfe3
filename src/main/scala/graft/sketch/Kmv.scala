package graft.sketch

import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** KMV (k-minimum-values / theta) sketch — deterministic by
  * construction: the sketch IS the k smallest distinct portable hashes
  * per group, so two engines computing it agree exactly (the DuckDB
  * oracle hash-matches both the registers and the estimates).
  *
  * What it adds over [[Hll]]: SET OPERATIONS. Two KMV registers
  * support overlap/Jaccard estimation (theta-sketch style) without
  * ever joining the raw data — the 100 TB question "how much does
  * corpus A overlap corpus B" becomes a join of two k-row sketches.
  *
  * Estimator: with u_k = kth smallest hash normalized to [0,1),
  * n̂ = (k−1)/u_k; when a group has fewer than k distinct hashes the
  * sketch holds ALL of them and the count is exact. The only
  * floating-point steps are final divisions — deterministic.
  *
  * Scale shape: ONE hash-aggregate with O(k) state per group (the
  * [[graft.functions.KMinDistinct]] bounded aggregate — map-side
  * partial k-min sets, merged by union-then-truncate). The shuffle
  * carries ≤k hashes per group per map partition, never the full
  * distinct-hash set, and the register output is ≤ k rows per group,
  * broadcastable for the set-op join.
  */
object Kmv {

  /** Hash range: [[TextAnalysis.hash60]] is uniform on [0, 2^60). */
  val hashRange: Double = math.pow(2.0, 60)

  /** Per-group bounded sketch: (groupCols…, hs) with hs = the ≤k
    * smallest distinct NON-NULL hashes, ascending (a null value hashes
    * to null and is not a register). One aggregation shuffle, O(k)
    * state — no global distinct, no window sort.
    */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame =
    df.select((groupCols.map(col) :+
        TextAnalysis.hash60(col(valueCol).cast(StringType)).as("h")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.KMinAgg.k_min_distinct(col("h"), k).as("hs"))

  /** k smallest distinct hashes per group: (groupCols…, h, rn) —
    * the exploded row form of [[sketch]] (rn = ascending rank, 1-based;
    * kept for set-op callers that want register rows).
    */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame =
    sketch(df, groupCols, valueCol, k)
      .select((groupCols.map(col) :+ posexplode(col("hs"))): _*)
      .select((groupCols.map(col) :+ col("col").as("h") :+
        (col("pos") + 1).cast(IntegerType).as("rn")): _*)

  /** Distinct-count estimate per group: exact below k, (k−1)/u_k at k.
    * Straight off the bounded sketch: n_regs = |hs|, u_k = last(hs)
    * normalized (hs is ascending, so its last element is the kth
    * minimum) — same arithmetic as the register form, one shuffle.
    */
  def estimateDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame =
    estimateFromSketch(sketch(df, groupCols, valueCol, k), groupCols, k)

  /** The estimator tail over any (groupCols…, hs) sketch frame — the
    * SINGLE source of the (k−1)/u_k arithmetic, shared by
    * [[estimateDistinct]] and merge/rollup consumers re-aggregating
    * stored sketches (the [[Hll.estimateFromRegisters]] pattern).
    */
  def estimateFromSketch(sk: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame =
    sk.select((groupCols.map(col) :+
        size(col("hs")).cast(LongType).as("n_regs") :+
        element_at(col("hs"), -1).as("kth_hash")): _*)
      .withColumn("n_est",
        when(col("n_regs") < k, col("n_regs").cast(DoubleType))
          .otherwise(lit((k - 1).toDouble) /
            (col("kth_hash").cast(DoubleType) / hashRange)))
      .drop("kth_hash")

  /** Theta-style Jaccard/overlap estimate between the value sets of two
    * single-group DataFrames: join of two ≤k-row sketches. θ = the
    * smaller of the two kth-minimum normalized hashes; both sketches
    * are truncated to hashes ≤ θ and compared as exact sets below θ.
    * Output: 1 row (est_jaccard, est_intersection).
    *
    * ONE distributed plan, zero driver-side actions: the two bounded
    * sketches (≤k rows each) full-outer-join on the hash, θ rides in
    * from a crossed 1-row aggregate, and the estimate is a final
    * single-row aggregation — so the caller composes it lazily like
    * any other operator (the old form ran 4 separate jobs to fetch
    * θ and the set counts to the driver).
    */
  def jaccardEstimate(a: DataFrame, b: DataFrame, valueCol: String,
      k: Int): DataFrame = {
    val ra = sketch(a.select(lit("a").as("g"), col(valueCol)), Seq("g"), valueCol, k)
      .select(explode(col("hs")).as("h"), lit(true).as("in_a"))
    val rb = sketch(b.select(lit("b").as("g"), col(valueCol)), Seq("g"), valueCol, k)
      .select(explode(col("hs")).as("h"), lit(true).as("in_b"))
    val theta = ra.agg(max(col("h")).as("tha"))
      .crossJoin(rb.agg(max(col("h")).as("thb")))
      .select(least(col("tha"), col("thb")).as("theta"))
    // exact set arithmetic below θ (hashes ≤ θ are a uniform sample of
    // the union); counts are integers, the estimate one division each
    val joined = ra.join(rb, Seq("h"), "full_outer")
      .crossJoin(broadcast(theta))
      .filter(col("h") <= col("theta"))
    joined.agg(
      sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("n_inter"),
      count(lit(1)).as("n_union"),
      first(col("theta")).as("theta"))
      .select(
        when(col("n_union") > 0,
          col("n_inter").cast(DoubleType) / col("n_union").cast(DoubleType))
          .otherwise(lit(0.0)).as("est_jaccard"),
        col("n_union"), col("theta"))
      .select(col("est_jaccard"),
        (col("est_jaccard") *
          when(col("theta") > 0,
            greatest(col("n_union").cast(DoubleType) - 1.0, lit(0.0)) /
              (col("theta").cast(DoubleType) / hashRange))
            .otherwise(lit(0.0))).as("est_intersection"))
  }

  /** DuckDB mirror of [[registers]] (same constants): the k smallest
    * distinct hashes per group with their ascending rank — the direct
    * cross-engine check of the bounded KMinDistinct aggregate against
    * the distinct+sort formulation.
    */
  def registersOracleSql(table: String, groupCols: Seq[String],
      valueExpr: String, k: Int): String = {
    val h = s"cast(('0x' || substr(md5(cast($valueExpr as varchar)), 1, 15)) as bigint)"
    val grp = groupCols.mkString(", ")
    s"""WITH hashed AS (SELECT DISTINCT $grp, $h AS h FROM $table
       |               WHERE $valueExpr IS NOT NULL),
       |topk AS (
       |  SELECT $grp, h,
       |    row_number() OVER (PARTITION BY $grp ORDER BY h ASC) AS rn
       |  FROM hashed)
       |SELECT $grp, h, cast(rn as integer) AS rn FROM topk WHERE rn <= $k""".stripMargin
  }

  /** DuckDB mirror of [[estimateDistinct]] (same constants). */
  def oracleSql(table: String, groupCols: Seq[String], valueExpr: String,
      k: Int): String = {
    val h = s"cast(('0x' || substr(md5(cast($valueExpr as varchar)), 1, 15)) as bigint)"
    val grp = groupCols.mkString(", ")
    s"""WITH hashed AS (SELECT DISTINCT $grp, $h AS h FROM $table
       |               WHERE $valueExpr IS NOT NULL),
       |topk AS (
       |  SELECT $grp, h,
       |    row_number() OVER (PARTITION BY $grp ORDER BY h ASC) AS rn
       |  FROM hashed),
       |regs AS (SELECT $grp, h FROM topk WHERE rn <= $k)
       |SELECT $grp, count(*) AS n_regs,
       |  CASE WHEN count(*) < $k THEN cast(count(*) as double)
       |       ELSE ${(k - 1).toDouble} / (cast(max(h) as double) / ${hashRange})
       |  END AS n_est
       |FROM regs GROUP BY ${(1 to groupCols.size).mkString(", ")}""".stripMargin
  }

  /** DuckDB mirror of the KMV MERGE law: k-min registers built at the
    * fine grain, unioned per coarse group, DEDUPED and re-trimmed to
    * the k smallest, estimate exactly the direct coarse sketch — the
    * trim-after-merge identity (kmin_k(kmin_k(A) ∪ kmin_k(B)) =
    * kmin_k(A ∪ B)) that makes stored fine sketches servable at every
    * rollup. Same constants as [[oracleSql]].
    */
  def rollupOracleSql(table: String, fineCols: Seq[String],
      coarseCols: Seq[String], valueExpr: String, k: Int): String = {
    require(coarseCols.forall(fineCols.contains), "coarse ⊆ fine")
    val cg = coarseCols.mkString(", ")
    val fine = registersOracleSql(table, fineCols, valueExpr, k)
    val direct = oracleSql(table, coarseCols, valueExpr, k)
    s"""WITH fine AS (
       |$fine),
       |u AS (SELECT DISTINCT $cg, h FROM fine),
       |tk AS (SELECT $cg, h,
       |         row_number() OVER (PARTITION BY $cg ORDER BY h ASC) AS rn
       |       FROM u),
       |mregs AS (SELECT $cg, h FROM tk WHERE rn <= $k),
       |merged AS (
       |  SELECT $cg, count(*) AS n_regs,
       |    CASE WHEN count(*) < $k THEN cast(count(*) as double)
       |         ELSE ${(k - 1).toDouble} /
       |              (cast(max(h) as double) / ${hashRange})
       |    END AS n_est_merged
       |  FROM mregs GROUP BY ${(1 to coarseCols.size).mkString(", ")}),
       |direct AS (
       |$direct)
       |SELECT ${coarseCols.map(c => s"m.$c").mkString(", ")},
       |  m.n_est_merged, d.n_est AS n_est_direct
       |FROM merged m JOIN direct d USING ($cg)""".stripMargin
  }
}
