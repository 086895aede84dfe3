package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gap-allowed sequential 2-patterns over per-entity event streams —
  * the length-2 core of PrefixSpan/GSP support counting: pattern
  * ⟨a, b⟩ is supported by an entity iff SOME a-event strictly
  * precedes SOME b-event (any gap, a ≠ b). This is the sequence-aware
  * complement of basket association rules (q_assoc: co-occurrence,
  * order-blind) and of the Markov matrix (q_markov: ADJACENT
  * transitions only).
  *
  * The trick that makes it linear: ⟨a, b⟩ holds for an entity iff
  * min_ts(a) < max_ts(b) within that entity — so support needs only
  * ONE per-(entity, type) aggregate of (min ts, max ts), then a
  * per-entity self-join over the entity's own DISTINCT TYPES (the
  * alphabet, a handful), never over its events. No window, no
  * per-event pairing, state bounded by |alphabet|² per entity.
  *
  * Strictness: the precedence test is strict on the raw timestamp —
  * two events sharing a timestamp support neither order (deterministic
  * without consulting tiebreaker ids, and replayable in any engine).
  */
object SeqMining {

  /** Pattern support table: (a, b, n_ab, n_a, n_b, n_entities, conf,
    * lift) for every ordered type pair with support ≥ `minSupport`
    * entities. conf = n_ab/n_a; lift = n_ab·N/(n_a·n_b); both one
    * rounded division of exact integers.
    */
  def patterns2(df: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, minSupport: Long): DataFrame = {
    val spans = df.groupBy(col(entityCol).as("e"), col(typeCol).as("ty"))
      .agg(min(col(tsCol)).as("mn"), max(col(tsCol)).as("mx"))
    val n = spans.agg(countDistinct(col("e")).as("n_entities"))
    val perType = spans.groupBy(col("ty")).agg(count(lit(1)).as("n_ty"))
    val ab = spans.alias("a")
      .join(spans.alias("b"),
        col("a.e") === col("b.e") && col("a.ty") =!= col("b.ty") &&
          col("a.mn") < col("b.mx"))
      .groupBy(col("a.ty").as("a"), col("b.ty").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    ab.join(perType.select(col("ty").as("a"), col("n_ty").as("n_a")), Seq("a"))
      .join(perType.select(col("ty").as("b"), col("n_ty").as("n_b")), Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_entities"),
        round(col("n_ab").cast(DoubleType) / col("n_a").cast(DoubleType), 6)
          .as("conf"),
        round(col("n_ab").cast(DoubleType) * col("n_entities").cast(DoubleType) /
          (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)), 6)
          .as("lift"))
  }

  /** Gap-allowed 3-patterns ⟨a, b, c⟩ (repeated types allowed —
    * ⟨a,a,c⟩ needs two a-events): supported by an entity iff events
    * t_a < t_b < t_c of the respective types exist. The linearization
    * extends the span trick with ONE intermediate witness:
    *
    *   b* := min { t_b : t_b > min_ts(a) }       (per entity, per a,b)
    *   ⟨a,b,c⟩ holds  ⇔  b* exists ∧ max_ts(c) > b*
    *
    * (⇐ take a@min_a < b* ≤ the b at b* < the c at max_c; ⇒ b* ≤ t_b
    * < t_c ≤ max_c.) Cost: the witness join pairs each EVENT with its
    * entity's span rows — Θ(|events|·|alphabet|) — then everything is
    * alphabet-bounded per entity; no per-event pair or triple blowup.
    */
  def patterns3(df: DataFrame, entityCol: String, tsCol: String,
      typeCol: String, minSupport: Long): DataFrame = {
    val ev = df.select(col(entityCol).as("e"), col(typeCol).as("ty"),
      col(tsCol).as("t"))
    val spans = ev.groupBy(col("e"), col("ty"))
      .agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
    val bstar = ev.alias("evb")
      .join(spans.alias("sa"),
        col("evb.e") === col("sa.e") && col("evb.t") > col("sa.mn"))
      .groupBy(col("evb.e").as("e"), col("sa.ty").as("a"),
        col("evb.ty").as("b"))
      .agg(min(col("evb.t")).as("bstar"))
    val nAb = bstar.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    val abc = bstar.alias("w")
      .join(spans.alias("sc"),
        col("w.e") === col("sc.e") && col("sc.mx") > col("w.bstar"))
      .groupBy(col("w.a").as("a"), col("w.b").as("b"), col("sc.ty").as("c"))
      .agg(count(lit(1)).as("n_abc"))
      .filter(col("n_abc") >= minSupport)
    abc.join(nAb, Seq("a", "b"))
      .select(col("a"), col("b"), col("c"), col("n_abc"), col("n_ab"),
        round(col("n_abc").cast(DoubleType) / col("n_ab").cast(DoubleType), 6)
          .as("conf"))
  }

  /** DuckDB mirror of [[patterns3]] over a CTE/table `src` with
    * columns (e, ty, ts).
    */
  def patterns3OracleSql(src: String, minSupport: Long): String =
    s"""spans AS (
       |  SELECT e, ty, min(ts) AS mn, max(ts) AS mx FROM $src GROUP BY 1, 2),
       |bstar AS (
       |  SELECT ev.e, sa.ty AS a, ev.ty AS b, min(ev.ts) AS bstar
       |  FROM $src ev JOIN spans sa ON ev.e = sa.e AND ev.ts > sa.mn
       |  GROUP BY 1, 2, 3),
       |nab AS (SELECT a, b, count(*) AS n_ab FROM bstar GROUP BY 1, 2),
       |abc AS (
       |  SELECT w.a, w.b, sc.ty AS c, count(*) AS n_abc
       |  FROM bstar w JOIN spans sc ON w.e = sc.e AND sc.mx > w.bstar
       |  GROUP BY 1, 2, 3 HAVING count(*) >= $minSupport),
       |pat3 AS (
       |  SELECT a, b, c, n_abc, n_ab,
       |    round(cast(n_abc as double) / cast(n_ab as double), 6) AS conf
       |  FROM abc JOIN nab USING (a, b))""".stripMargin

  /** DuckDB mirror of [[patterns2]] over a CTE/table `src` with
    * columns (e, ty, ts).
    */
  def patterns2OracleSql(src: String, minSupport: Long): String =
    s"""spans AS (
       |  SELECT e, ty, min(ts) AS mn, max(ts) AS mx FROM $src GROUP BY 1, 2),
       |ntot AS (SELECT count(DISTINCT e) AS n_entities FROM spans),
       |pertype AS (SELECT ty, count(*) AS n_ty FROM spans GROUP BY 1),
       |ab AS (
       |  SELECT a.ty AS a, b.ty AS b, count(*) AS n_ab
       |  FROM spans a JOIN spans b
       |    ON a.e = b.e AND a.ty <> b.ty AND a.mn < b.mx
       |  GROUP BY 1, 2 HAVING count(*) >= $minSupport),
       |pat AS (
       |  SELECT a, b, n_ab, pa.n_ty AS n_a, pb.n_ty AS n_b, n_entities,
       |    round(cast(n_ab as double) / cast(pa.n_ty as double), 6) AS conf,
       |    round(cast(n_ab as double) * cast(n_entities as double) /
       |      (cast(pa.n_ty as double) * cast(pb.n_ty as double)), 6) AS lift
       |  FROM ab JOIN pertype pa ON ab.a = pa.ty
       |  JOIN pertype pb ON ab.b = pb.ty CROSS JOIN ntot)""".stripMargin
}
