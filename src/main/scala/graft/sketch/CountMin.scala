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
}
