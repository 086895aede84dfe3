package graft.nass

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden replay: stage the reference's committed quickstats CSVs,
  * run the DAG, diff against the reference's committed output CSVs
  * (reference: repo-root goldens; SURVEY §5).
  *
  * Coverage limits of the snapshot (the reference DB held more data
  * than the committed inputs):
  *  - c_pro_idmt_2012.csv = full 2012 CENSUS pull for Idaho/Montana;
  *  - production_yield.csv = complete PRODUCTION+YIELD extract (all
  *    states/years that reach commodity_yield) but TOTAL-domain rows
  *    only for some commodities;
  *  - no SURVEY rows at all → price/land_rent chains are untestable
  *    against goldens (covered by unit tests instead).
  */
class NassGoldenSpec extends SparkSpec {

  private val refDir = "/root/reference"

  private lazy val pipe: NassPipeline = {
    val raw = Staging.readQuickstatsRaw(spark,
      s"$refDir/src/quickstats/c_pro_idmt_2012.csv",
      s"$refDir/src/quickstats/production_yield.csv")
    new NassPipeline(spark, Staging.stageQuickstats(raw))
  }

  private def golden(name: String): DataFrame =
    spark.read.option("header", true).csv(s"$refDir/$name.csv")

  /** symmetric anti-join diff on normalized frames; empty ⇒ equal */
  private def diffCount(got: DataFrame, exp: DataFrame): (Long, Long) = {
    val cols = exp.columns.toSeq
    val g = got.select(cols.map(col): _*)
    val e = exp.select(cols.map(col): _*)
    (g.exceptAll(e).count(), e.exceptAll(g).count())
  }

  private def norm2(df: DataFrame, numCols: Seq[String], boolCols: Seq[String]): DataFrame = {
    val d1 = numCols.foldLeft(df)((d, c) =>
      d.withColumn(c, round(col(c).cast(DoubleType), 2)))
    val d2 = boolCols.foldLeft(d1)((d, c) =>
      d.withColumn(c,
        when(col(c) === "t" || col(c) === "true", true)
          .when(col(c) === "f" || col(c) === "false", false)
          .otherwise(col(c).cast(BooleanType))))
    d2.withColumn("year", col("year").cast(IntegerType))
  }

  test("commodity_yield matches the golden CSV exactly (all 244 rows)") {
    val num = Seq("irrigated", "partial", "none", "unspecified")
    val got = norm2(pipe.commodity_yield, num, Nil)
    val exp = norm2(golden("commodity_yield"), num, Nil)
    val (onlyGot, onlyExp) = diffCount(got, exp)
    assert(onlyGot === 0, "rows produced that are not in the golden")
    assert(onlyExp === 0, "golden rows not reproduced")
    assert(got.count() === 244)
  }

  /** Harvest-chain golden coverage, pinned exactly (round-8 advice
    * item 7). The golden commodity_harvest.csv (69,667 rows) was
    * dumped from the reference's FULL database; the committed inputs
    * cover only part of it, and the boundary is now measured, not
    * estimated:
    *  - within 2012 Idaho/Montana (the census-pull slice), the
    *    pipeline reproduces 4,572 golden rows VALUE-EXACT — every
    *    row of every commodity the snapshot has input rows for. The
    *    311 remaining slice rows are fruit commodities (APPLES,
    *    PEARS, CHERRIES, NON-CITRUS TOTALS, …) with ZERO rows in
    *    c_pro_idmt_2012.csv — the reference DB held fruit census
    *    data the committed snapshot does not;
    *  - outside the slice the pipeline emits 6,658 rows whose keys
    *    all exist in the golden but whose aggregates run over the
    *    committed production_yield.csv extract (TOTAL-domain rows
    *    only for some commodities), so 5,872 differ from the full-DB
    *    golden numerically — input coverage, not logic;
    *  - the remaining golden-only keys need input data never
    *    committed to the reference repo at all.
    */
  test("commodity_harvest: input-covered slice exact, produced keys ⊆ golden") {
    val num = Seq("irrigated_acres", "total_acres", "total_production")
    val got = norm2(pipe.commodity_harvest, num, Seq("reported"))
    val exp = norm2(golden("commodity_harvest"), num, Seq("reported"))
    def idmt(df: DataFrame) = df
      .filter(col("year") === 2012 && substring(col("location"), 1, 2).isin("16", "30"))
    // slice golden restricted to commodities the snapshot has inputs
    // for (= commodities the pipeline emits at all in the slice): the
    // replay must be EXACT there — every row, not just head-commodities
    val gotSlice = idmt(got)
    val inputCovered = gotSlice.select(col("commodity")).distinct()
    val expCovered = idmt(exp).join(inputCovered, Seq("commodity"), "left_semi")
    val (onlyGot, onlyExp) = diffCount(gotSlice, expCovered)
    assert(onlyGot === 0, "2012 ID/MT rows produced that are not in the golden")
    assert(onlyExp === 0, "input-covered 2012 ID/MT golden rows not reproduced")
    assert(gotSlice.count() === 4572)
    // the pinned absent-input remainder: 311 fruit-commodity rows
    val absent = idmt(exp).join(inputCovered, Seq("commodity"), "left_anti")
    assert(absent.count() === 311,
      "absent-input slice rows moved — re-measure the coverage boundary")
    // globally: no spurious keys — everything the pipeline derives
    // from partial inputs is a key the full-DB golden also has
    val keyCols = Seq("commodity", "location", "year", "unit")
    val spurious = got.select(keyCols.map(col): _*)
      .except(exp.select(keyCols.map(col): _*)).count()
    assert(spurious === 0, "keys produced that the golden does not have")
    assert(got.count() === 11230) // pins the measured coverage boundary
  }
}
