package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audit with a local-recoding
  * generalization ladder — the privacy gate of a data-release
  * pipeline: before publishing per-group records, verify every
  * quasi-identifier (QI) equivalence class contains at least k
  * distinct entities and at least l distinct sensitive values, and
  * generalize the classes that don't instead of dropping them.
  *
  * Ladder semantics (three rungs, local recoding — only FAILING
  * classes coarsen, passing ones keep full resolution):
  *   level 0: group by stable QIs + the fine-grained attribute;
  *            classes with k ≥ K and l ≥ L are released as-is
  *   level 1: members of failing classes regroup under the coarse
  *            attribute value
  *   level 2: members still failing regroup with the attribute
  *            suppressed entirely (NULL); whatever still fails is
  *            flagged `risky` for the caller to withhold
  *
  * Scale shape: three grouped count-distinct aggregations (Spark
  * plans each as a two-phase partial aggregate) plus two left-semi
  * joins routing failing members down a rung — all keyed shuffles on
  * the QI columns; no windows, no driver-side data. The input is
  * scanned once per rung over a monotonically SHRINKING member set
  * (passing classes exit the ladder), so rung cost decays
  * geometrically in practice.
  */
object Privacy {

  /** Audit + generalize. `df` must carry the stable QI columns, the
    * fine and coarse variants of the laddered attribute, the entity id
    * and the sensitive column. Returns one row per released class:
    * stable QIs…, `attr` (fine value, coarse value, or NULL by rung),
    * `level` (0/1/2), `k_size`, `l_div`, `risky`.
    */
  def generalize(df: DataFrame, stableQi: Seq[String], fineCol: String,
      coarseCol: String, idCol: String, sensitiveCol: String,
      k: Long, l: Long): DataFrame = {
    require(k >= 1 && l >= 1, s"k=$k l=$l must be >= 1")
    val need = stableQi ++ Seq(fineCol, coarseCol, idCol, sensitiveCol)
    val base = graft.CacheRegistry.register(
      df.select(need.map(col): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sq = stableQi.map(col)

    def classesOf(rows: DataFrame, attr: Option[String]): DataFrame =
      rows.groupBy(sq ++ attr.map(col): _*)
        .agg(countDistinct(col(idCol)).as("k_size"),
          countDistinct(col(sensitiveCol)).as("l_div"))

    def failing(classes: DataFrame): DataFrame =
      classes.filter(col("k_size") < k || col("l_div") < l)

    def released(classes: DataFrame, attrVal: org.apache.spark.sql.Column,
        level: Int): DataFrame =
      classes.select(sq ++ Seq(attrVal.cast("bigint").as("attr"),
        lit(level).as("level"), col("k_size"), col("l_div"),
        (col("k_size") < k || col("l_div") < l).as("risky")): _*)

    // rung 0: full resolution
    val g0 = classesOf(base, Some(fineCol))
    val pass0 = released(g0.filter(col("k_size") >= k && col("l_div") >= l),
      col(fineCol), 0)
    val rows1 = base.join(failing(g0).select(sq :+ col(fineCol): _*),
      stableQi :+ fineCol, "left_semi")
    // rung 1: coarse attribute
    val g1 = classesOf(rows1, Some(coarseCol))
    val pass1 = released(g1.filter(col("k_size") >= k && col("l_div") >= l),
      col(coarseCol), 1)
    val rows2 = rows1.join(failing(g1).select(sq :+ col(coarseCol): _*),
      stableQi :+ coarseCol, "left_semi")
    // rung 2: attribute suppressed; residual failures stay flagged
    val g2 = classesOf(rows2, None)
    val pass2 = released(g2, lit(null), 2)
    pass0.unionByName(pass1).unionByName(pass2)
  }
}
