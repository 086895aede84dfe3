package graft.sketch

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Count-min sketch — deterministic frequency estimation. The counter
  * table is a sum-aggregate over fixed universal-hash buckets
  * (order-independent, mergeable by addition); the point estimate is
  * the MIN over the d rows' counters. Both steps are exactly
  * reproducible cross-engine, so frequency estimates hash-match the
  * DuckDB oracle like the HLL/KMV sketches.
  *
  * Guarantee: est ≥ true count always (collisions only inflate);
  * est ≤ true + ε·N with probability 1−δ for w = e/ε, d = ln(1/δ).
  *
  * Scale shape: ONE hash-aggregate to (group, row, bucket) — d·w
  * counters per group regardless of input size — versus the full
  * distinct-key shuffle an exact count needs. The 100 TB use: token /
  * boilerplate / URL frequency over a corpus where the key cardinality
  * itself is the problem.
  */
object CountMin {

  /** Row-hash coefficients h_i(x) = ((a_i·x + b_i) mod P) mod w —
    * x pre-reduced mod P so a·x stays within int64 (same discipline as
    * [[graft.dedup.Dedup.minhashCoeffs]]).
    */
  val P: Long = 2147483647L
  val rowCoeffs: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (22695477L, 1L), (69069L, 362437L), (48271L, 11L))

  def depth: Int = rowCoeffs.size

  private def itemHash(c: Column): Column =
    TextAnalysis.hash60(c.cast(StringType)) % P

  /** Counter table: (groupCols…, cm_row, cm_bucket, cnt). */
  def counters(df: DataFrame, groupCols: Seq[String], valueCol: String,
      w: Int): DataFrame = {
    val x = itemHash(col(valueCol))
    val rows = array(rowCoeffs.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i).as("cm_row"), ((x * a + b) % P % w).as("cm_bucket"))
    }: _*)
    df.select((groupCols.map(col) :+ explode(rows).as("rb")): _*)
      .select((groupCols.map(col) :+ col("rb.cm_row") :+ col("rb.cm_bucket")): _*)
      .groupBy((groupCols.map(col) :+ col("cm_row") :+ col("cm_bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for the values in `items` (a DataFrame holding
    * distinct `valueCol` rows): min over the d row counters, per group.
    *
    * With non-empty `groupCols`, each probe item is estimated against
    * EVERY group's counter table: probes are cross-joined with the
    * (broadcast) distinct group keys, and the counter lookup joins on
    * groupCols ++ (cm_row, cm_bucket) — so a (group, bucket) pair with
    * no counter row correctly contributes 0, preserving the one-sided
    * est ≥ true guarantee per group.
    *
    * The group universe is the distinct groupCols of `df` — i.e. of the
    * item-bearing relation the counters were built from. Callers feeding
    * a token-exploded frame therefore see only groups that produced at
    * least one token ([[groupedTokenOracleSql]] mirrors this by taking
    * its groups CTE from `toks`, not the base table).
    */
  def estimate(df: DataFrame, items: DataFrame, groupCols: Seq[String],
      valueCol: String, w: Int): DataFrame = {
    val ctrs = counters(df, groupCols, valueCol, w)
    val x = itemHash(col(valueCol))
    val probes = items.select((col(valueCol) +:
      rowCoeffs.zipWithIndex.map { case ((a, b), i) =>
        ((x * a + b) % P % w).as(s"b$i")
      }): _*)
    val exploded = probes.select(col(valueCol),
      explode(array(rowCoeffs.indices.map(i =>
        struct(lit(i).as("cm_row"), col(s"b$i").as("cm_bucket"))): _*)).as("rb"))
      .select(col(valueCol), col("rb.cm_row"), col("rb.cm_bucket"))
    val probed =
      if (groupCols.isEmpty) exploded
      else exploded.crossJoin(
        broadcast(df.select(groupCols.map(col): _*).distinct()))
    probed.join(ctrs, groupCols ++ Seq("cm_row", "cm_bucket"), "left")
      .groupBy((col(valueCol) +: groupCols.map(col)): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** DuckDB mirror of the GROUPED estimate path: per (token, group)
    * estimates for the `topN` globally most frequent whitespace tokens
    * of `table.textCol`, grouped by `groupCol` — each probe item is
    * estimated against every group's own counter table; (group,
    * bucket) pairs with no counter row contribute 0.
    */
  def groupedTokenOracleSql(table: String, textCol: String, groupCol: String,
      w: Int, topN: Int): String = {
    val h = s"cast(('0x' || substr(md5(cast(t.tok as varchar)), 1, 15)) as bigint) % $P"
    val rowSelects = rowCoeffs.zipWithIndex.map { case ((a, b), i) =>
      s"SELECT $groupCol, tok, $i AS cm_row, (($h * $a + $b) % $P) % $w AS cm_bucket FROM toks t"
    }.mkString("\nUNION ALL\n")
    s"""WITH toks AS (
       |  SELECT $groupCol, u.tok FROM $table,
       |    unnest(list_filter(string_split_regex(trim($textCol), '\\s+'),
       |           x -> x != '')) AS u(tok)),
       |hashed AS (
       |$rowSelects),
       |ctrs AS (
       |  SELECT $groupCol, cm_row, cm_bucket, count(*) AS cnt
       |  FROM hashed GROUP BY 1, 2, 3),
       |exact AS (
       |  SELECT tok, count(*) AS n FROM toks GROUP BY 1
       |  ORDER BY n DESC, tok ASC LIMIT $topN),
       |probes AS (
       |  SELECT DISTINCT h.tok, h.cm_row, h.cm_bucket
       |  FROM hashed h JOIN exact e USING (tok)),
       |groups AS (SELECT DISTINCT $groupCol FROM toks)
       |SELECT p.tok, g.$groupCol, min(coalesce(c.cnt, 0)) AS est_count
       |FROM probes p CROSS JOIN groups g
       |LEFT JOIN ctrs c ON c.$groupCol = g.$groupCol
       |  AND c.cm_row = p.cm_row AND c.cm_bucket = p.cm_bucket
       |GROUP BY 1, 2""".stripMargin
  }

  /** DuckDB mirror of counters+estimate for a token-frequency query:
    * estimates for the `topN` most frequent whitespace tokens of
    * `table.textCol` (exact count alongside).
    */
  def tokenOracleSql(table: String, textCol: String, w: Int, topN: Int): String = {
    val h = s"cast(('0x' || substr(md5(cast(t.tok as varchar)), 1, 15)) as bigint) % $P"
    val rowSelects = rowCoeffs.zipWithIndex.map { case ((a, b), i) =>
      s"SELECT tok, $i AS cm_row, (($h * $a + $b) % $P) % $w AS cm_bucket FROM toks t"
    }.mkString("\nUNION ALL\n")
    s"""WITH toks AS (
       |  SELECT u.tok FROM $table,
       |    unnest(list_filter(string_split_regex(trim($textCol), '\\s+'),
       |           x -> x != '')) AS u(tok)),
       |hashed AS (
       |$rowSelects),
       |ctrs AS (
       |  SELECT cm_row, cm_bucket, count(*) AS cnt
       |  FROM hashed GROUP BY 1, 2),
       |exact AS (
       |  SELECT tok, count(*) AS n_exact FROM toks GROUP BY 1
       |  ORDER BY n_exact DESC, tok ASC LIMIT $topN),
       |probes AS (
       |  SELECT DISTINCT h.tok, h.cm_row, h.cm_bucket
       |  FROM hashed h JOIN exact e USING (tok))
       |SELECT p.tok, e.n_exact, min(coalesce(c.cnt, 0)) AS est_count
       |FROM probes p
       |JOIN exact e USING (tok)
       |LEFT JOIN ctrs c USING (cm_row, cm_bucket)
       |GROUP BY 1, 2""".stripMargin
  }

  /** Join-cardinality estimation by CMS inner product — the planner
    * statistic for 100 TB joins: |A ⋈ B| on a key equals
    * Σ_k fA(k)·fB(k), and the inner product of the two sides' CMS
    * counter rows estimates it from d·w counters per side instead of a
    * distinct-key pass over either input (AMS/CMS sketch classic:
    * Cormode & Muthukrishnan 2005, §4.2). Per depth row the estimate
    * is Σ_b cA[i,b]·cB[i,b]; collisions only ADD cross terms, so each
    * row over-estimates and the MIN over rows is the sketch estimate,
    * with est ≥ true always and est ≤ true + ε·‖fA‖₁‖fB‖₁ w.h.p. at
    * w = e/ε. All-integer, so cross-engine exact.
    *
    * Use: decide broadcast-vs-shuffle or detect a skew blowup BEFORE
    * running the join — the sketches build in one narrow pass over
    * each side (map-side combinable counts), ship d·w longs, and the
    * estimate itself is a d·w-row join, independent of data size.
    *
    * @return one row per depth: (cm_row, row_est, est) with est the
    *         min over depths — callers typically read the single est
    */
  def joinSizeEstimate(a: DataFrame, keyColA: String,
      b: DataFrame, keyColB: String, w: Int): DataFrame = {
    val ca = counters(a.select(col(keyColA).as("k")), Seq(), "k", w)
      .select(col("cm_row"), col("cm_bucket"), col("cnt").as("cnt_a"))
    val cb = counters(b.select(col(keyColB).as("k")), Seq(), "k", w)
      .select(col("cm_row"), col("cm_bucket"), col("cnt").as("cnt_b"))
    val inner = ca.join(cb, Seq("cm_row", "cm_bucket"))
      .groupBy(col("cm_row"))
      .agg(sum(col("cnt_a") * col("cnt_b")).as("row_est"))
    // a depth whose buckets never coincide has inner product 0 — the
    // inner join DROPS that row, which would silently inflate the min
    // (the 0 estimate is exactly the informative one on near-disjoint
    // inputs). Re-anchor on the full depth range with a left join.
    val depths = a.sparkSession.range(0, depth.toLong)
      .select(col("id").cast(IntegerType).as("cm_row"))
    // d rows total, but read twice (per-depth output + the min):
    // persist so the counter builds run once
    val rows = graft.CacheRegistry.register(
      depths.join(inner, Seq("cm_row"), "left")
        .select(col("cm_row"), coalesce(col("row_est"), lit(0L)).as("row_est"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    rows.crossJoin(broadcast(rows.agg(min(col("row_est")).as("est"))))
  }

  /** DuckDB mirror of [[joinSizeEstimate]]: CTE chain over two key
    * CTEs `ka(k)` and `kb(k)` the caller prepends, ending in
    * `rows_(cm_row, row_est)`; the caller writes the final SELECT
    * (typically joining in an exact count for the error report).
    */
  def joinSizeCtesSql(w: Int): String = {
    def h(src: String) =
      s"cast(('0x' || substr(md5(cast($src.k as varchar)), 1, 15)) as bigint) % $P"
    def hashed(name: String, src: String) = {
      val rowSelects = rowCoeffs.zipWithIndex.map { case ((acf, bcf), i) =>
        s"SELECT $i AS cm_row, ((${h(src)} * $acf + $bcf) % $P) % $w AS cm_bucket FROM $src"
      }.mkString("\nUNION ALL\n")
      s"""$name AS (
         |  SELECT cm_row, cm_bucket, count(*) AS cnt FROM (
         |$rowSelects)
         |  GROUP BY 1, 2)""".stripMargin
    }
    s"""${hashed("ca", "ka")},
       |${hashed("cb", "kb")},
       |inner_ AS (
       |  SELECT ca.cm_row, cast(sum(ca.cnt * cb.cnt) as bigint) AS row_est
       |  FROM ca JOIN cb ON ca.cm_row = cb.cm_row AND ca.cm_bucket = cb.cm_bucket
       |  GROUP BY 1),
       |rows_ AS (
       |  SELECT d.cm_row, coalesce(i.row_est, 0) AS row_est
       |  FROM (SELECT unnest(range($depth)) AS cm_row) d
       |  LEFT JOIN inner_ i ON d.cm_row = i.cm_row)""".stripMargin
  }
}
