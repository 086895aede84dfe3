package graft.nass

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** land_rent fidelity via input reconstruction: the snapshot carries no
  * SURVEY staging rows, but the golden land_rent.csv (3,405 rows of
  * REAL cash-rent dataitems) determines its own staging input up to the
  * columns the view reads. Rebuild that input, run the view, require
  * the golden back exactly — this pins the regex boolean flags
  * (' IRRIGATED' leading-space vs NON-IRRIGATED), location derivation,
  * and numeric parse against real NASS strings
  * (reference: src/nass.sql:37-51; golden land_rent.csv).
  */
class LandRentRoundtripSpec extends SparkSpec {

  test("land_rent reproduces all 3,405 golden rows from reconstructed input") {
    val golden = spark.read.option("header", true)
      .csv("/root/reference/land_rent.csv")

    // invert the location rule: 2 chars = state; contains 'ag' =
    // state||'ag'||asd; 5 digits = state||county
    val input = golden.select(
      lit("SURVEY").as("program"),
      col("year").cast(IntegerType).as("year"),
      lit("YEAR").as("period"),
      substring(col("location"), 1, 2).as("statefips"),
      when(col("location").contains("ag"),
        regexp_extract(col("location"), "ag(.*)$", 1)).otherwise(lit(""))
        .as("agdistrictcode"),
      when(length(col("location")) === 5, substring(col("location"), 3, 3))
        .otherwise(lit("")).as("countycode"),
      col("dataitem"),
      col("value"),
      lit("TOTAL").as("domain"), lit("").as("commodity"),
      lit("").as("weekending"), lit("").as("geolevel"), lit("").as("state"),
      lit("").as("agdistrict"), lit("").as("county"), lit("").as("zipcode"),
      lit("").as("region"), lit("").as("watershedcode"), lit("").as("watershed"),
      lit("").as("domaincategory"), lit("").as("cv"))
      .select(Staging.quickstatsCols.map(col): _*)

    val pipe = new NassPipeline(spark, input)
    val got = pipe.land_rent.select(
      col("location"), col("year").cast(IntegerType).as("year"),
      col("irrigated"), col("non_irrigated"), col("pasture"),
      col("value").cast(DoubleType).as("value"), col("dataitem"))
    val exp = golden.select(
      col("location"), col("year").cast(IntegerType).as("year"),
      (col("irrigated") === "t").as("irrigated"),
      (col("non_irrigated") === "t").as("non_irrigated"),
      (col("pasture") === "t").as("pasture"),
      col("value").cast(DoubleType).as("value"), col("dataitem"))

    assert(got.count() === 3405)
    assert(got.exceptAll(exp).count() === 0, "rows not in golden")
    assert(exp.exceptAll(got).count() === 0, "golden rows missing")
  }
}
