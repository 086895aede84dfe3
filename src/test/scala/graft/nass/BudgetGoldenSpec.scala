package graft.nass

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** combined_harvest fidelity via input reconstruction (the
  * PriceRoundtripSpec technique): every golden row (reference
  * src/budget.r, golden combined_harvest.csv, 30,173 rows) is fed back
  * as the Quick Stats API rows that produce it — a total-acres row
  * (`crops - ACRES HARVESTED`) plus, when the golden carries an
  * irrigated figure, the `crops, IRRIGATED - ACRES HARVESTED` twin.
  * Budget.harvestArea's cleanse → zero-pad → location derivation →
  * irrigated self-split left-merge → CENSUS-over-SURVEY dedup must
  * reproduce every golden row exactly.
  */
class BudgetGoldenSpec extends SparkSpec {

  test("combined_harvest reproduces all 30,173 golden rows from reconstructed input") {
    val golden = spark.read
      .option("header", true)
      .option("nullValue", "NA") // R write.csv spells missing as NA
      .csv("/root/reference/combined_harvest.csv")

    // decompose the derived location back into the API's code columns
    val isAsd = col("location").contains("ag")
    val isCounty = length(col("location")) === 5 && !isAsd
    def apiRows(cropsCol: org.apache.spark.sql.Column,
        valueCol: org.apache.spark.sql.Column) =
      golden.select(
        col("source_desc"),
        lit("").as("commodity_desc"),
        concat(cropsCol, lit(" - ACRES HARVESTED")).as("short_desc"),
        lit("TOTAL").as("domain_desc"),
        lit("").as("domaincat_desc"),
        when(isAsd, "AGRICULTURAL DISTRICT").when(isCounty, "COUNTY")
          .otherwise("STATE").as("agg_level_desc"),
        substring(col("location"), 1, 2).as("state_fips_code"),
        when(isAsd, regexp_extract(col("location"), "ag(.*)$", 1))
          .otherwise(lit("")).as("asd_code"),
        when(isCounty, substring(col("location"), 3, 3))
          .otherwise(lit("")).as("county_code"),
        col("year"),
        // 52 golden cells are R-serialized scientific notation (3e+05);
        // the API's CSV format never is — render plain decimal text
        valueCol.cast(DoubleType).cast(DecimalType(18, 2))
          .cast(StringType).as("Value"),
        lit("YEAR").as("reference_period_desc"))
    val totalRows = apiRows(col("crops"), col("total"))
    val irr = apiRows(concat(col("crops"), lit(", IRRIGATED")),
      col("irrigated")).filter(col("Value").isNotNull)
    val input = totalRows.unionByName(irr)

    val got = Budget.harvestArea(input)
      .select(col("source_desc"), col("year"), col("crops"), col("location"),
        round(col("total").cast(DoubleType), 4).as("total"),
        round(col("irrigated").cast(DoubleType), 4).as("irrigated"))
    val exp = golden.select(
      col("source_desc"), col("year").cast(IntegerType).as("year"),
      col("crops"), col("location"),
      round(col("total").cast(DoubleType), 4).as("total"),
      round(col("irrigated").cast(DoubleType), 4).as("irrigated"))

    assert(exp.count() === 30173)
    val missing = exp.exceptAll(got).count()
    assert(missing === 0, s"$missing golden rows not reproduced")
    val extras = got.exceptAll(exp).count()
    assert(extras === 0, s"$extras extra rows produced")
  }
}
