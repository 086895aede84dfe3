package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
  * 1969): blocked candidate pairs scored by summed log₂ agreement
  * weights, the classical probabilistic-dedup scorer that MinHash
  * CANDIDATE generation feeds in production linkage stacks.
  *
  * Per comparison field f:
  *   agree weight    w⁺_f = log₂(m_f / u_f)
  *   disagree weight w⁻_f = log₂((1 − m_f) / (1 − u_f))
  * where m_f (P[agree | match]) is a supplied prior and u_f
  * (P[agree | non-match]) is ESTIMATED FROM THE CORPUS as the
  * random-pair agreement probability Σ_v c_v(c_v−1) / (N(N−1)) —
  * exact integer counts, one decimal→double division per field.
  *
  * Determinism: the only non-exact steps are the u divisions, log₂,
  * and the final weight sum — all IEEE double ops on identical inputs
  * in both engines; log₂'s last-bit libm variance is absorbed by the
  * single round(·,6) on the published score (the q_bm25 contract).
  *
  * Scale shape: u-estimation is one hash aggregate per field (a
  * frequency table, model-sized); candidate generation is a
  * self-join keyed on the BLOCK — cost Θ(Σ_block |block|²), so the
  * block key must bound block size the way LSH bands do (here: a
  * text prefix + length band, bounded by planted-duplicate cluster
  * size, NOT a corpus-fraction key like language). At skew, split
  * hot blocks with a salt round exactly like the band-bucket dedups.
  */
object Linkage {

  /** Score blocked pairs: input `df` with `idCol`, block columns, and
    * comparison field columns (string-comparable). `mPriors` gives
    * P[agree|match] per field. Output: (id_a, id_b, per-field agree
    * bits agree_<f>, score) for pairs with score ≥ `minScore`,
    * id_a < id_b.
    */
  def fellegiSunter(df: DataFrame, idCol: String, blockCols: Seq[String],
      fields: Seq[String], mPriors: Map[String, Double],
      minScore: Double): DataFrame = {
    require(fields.forall(mPriors.contains), "every field needs an m prior")
    val dec = DecimalType(38, 0)
    val n = df.agg(count(lit(1)).cast(dec).as("n_rows"))
    // per-field u: random-pair agreement probability from value
    // frequencies — Σ c(c−1) / (N(N−1)), exact until one division
    // numerator clamped to ≥ 1: a field whose values are all distinct
    // in a small corpus would otherwise set u = 0 and the agree
    // weight to +∞ — the clamp caps it at "one coincidence"
    val uCols = fields.map { f =>
      val freq = df.groupBy(col(f)).agg(count(lit(1)).cast(dec).as("c"))
      freq.crossJoin(broadcast(n))
        .agg((greatest(sum(col("c") * (col("c") - lit(1).cast(dec))),
          lit(1).cast(dec)).cast(DoubleType) /
          (first(col("n_rows")) * (first(col("n_rows")) - lit(1).cast(dec)))
            .cast(DoubleType)).as(s"u_$f"))
    }
    val u = uCols.reduce(_.crossJoin(_))
    val a = df.alias("a")
    val b = df.alias("b")
    val blockEq = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _)
    val pairs = a.join(b, blockEq && col(s"a.$idCol") < col(s"b.$idCol"))
    val withU = pairs.crossJoin(broadcast(u))
    // null handling: a NULL comparison field — on EITHER or BOTH
    // sides — is a DISAGREEMENT (false), never NULL and never an
    // agreement: a mutually missing value carries no match evidence,
    // so awarding it the m-weight would inflate scores (bare `<=>`
    // would do exactly that on both-NULL; plain `=` would yield SQL
    // NULL). isNotNull && `<=>` here and the matching IS NOT NULL AND
    // IS NOT DISTINCT FROM in the oracle keep the two engines' agree
    // bits identical on nullable fields.
    val agreeBits = fields.map(f =>
      (col(s"a.$f").isNotNull && (col(s"a.$f") <=> col(s"b.$f")))
        .as(s"agree_$f"))
    val score = fields.map { f =>
      val m = mPriors(f)
      when(col(s"agree_$f"),
        log2(lit(m) / col(s"u_$f")))
        .otherwise(log2(lit(1.0 - m) / (lit(1.0) - col(s"u_$f"))))
    }.reduce(_ + _)
    withU
      .select(Seq(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b")) ++
        agreeBits ++ fields.map(f => col(s"u_$f")): _*)
      .withColumn("score", round(score, 6))
      .filter(col("score") >= minScore)
      .drop(fields.map(f => s"u_$f"): _*)
  }

  /** DuckDB mirror of [[fellegiSunter]] over a CTE/table `src` whose
    * columns are `id`, block cols, and the comparison fields.
    */
  def oracleSql(src: String, blockCols: Seq[String], fields: Seq[String],
      mPriors: Map[String, Double], minScore: Double): String = {
    val uCtes = fields.map { f =>
      s"""u_$f AS (
         |  SELECT cast(greatest(
         |      sum(cast(c as decimal(38,0)) * (cast(c as decimal(38,0)) - 1)),
         |      cast(1 as decimal(38,0))) as double) /
         |    cast((SELECT cast(count(*) as decimal(38,0)) FROM $src) *
         |      ((SELECT cast(count(*) as decimal(38,0)) FROM $src) - 1) as double)
         |    AS u
         |  FROM (SELECT $f, count(*) AS c FROM $src GROUP BY 1))""".stripMargin
    }.mkString(",\n")
    val blockEq = blockCols.map(c => s"a.$c = b.$c").mkString(" AND ")
    val agreeSel = fields
      .map(f => s"(a.$f IS NOT NULL AND a.$f IS NOT DISTINCT FROM b.$f)" +
        s" AS agree_$f")
      .mkString(",\n    ")
    val scoreTerms = fields.map { f =>
      val m = mPriors(f)
      s"CASE WHEN a.$f IS NOT NULL AND a.$f IS NOT DISTINCT FROM b.$f " +
        s"THEN log2($m / (SELECT u FROM u_$f)) " +
        s"ELSE log2(${1.0 - m} / (1.0 - (SELECT u FROM u_$f))) END"
    }.mkString(" +\n      ")
    s"""$uCtes,
       |scored AS (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |    $agreeSel,
       |    round($scoreTerms, 6) AS score
       |  FROM $src a JOIN $src b ON $blockEq AND a.id < b.id)""".stripMargin +
      s",\nlinked AS (SELECT * FROM scored WHERE score >= $minScore)"
  }
}
