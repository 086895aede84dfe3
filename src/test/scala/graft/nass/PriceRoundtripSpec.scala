package graft.nass

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** commodity_price fidelity via input reconstruction: every golden row
  * (773 real price paths) is fed back as a reported SURVEY price row
  * (dataitem = path + ' - PRICE RECEIVED, MEASURED IN ' + unit); the
  * chain — price_location parse with the data-driven commodity-prefix
  * regex, AVG rollup, reported-first reconcile, flatten — must
  * reproduce every golden row. The rollup may additionally synthesize
  * ancestors the snapshot's golden derived from richer inputs, so the
  * assertion is golden ⊆ output with value equality, plus a bound on
  * extras (reference: src/nass.sql:387-451; golden commodity_price.csv).
  */
class PriceRoundtripSpec extends SparkSpec {

  test("commodity_price reproduces all 773 golden rows from reconstructed input") {
    val golden = spark.read.option("header", true)
      .csv("/root/reference/commodity_price.csv")

    // head commodity of the flattened path: NASS commodity heads don't
    // contain ', ' in this corpus, so the first token is the head
    val input = golden.select(
      lit("SURVEY").as("program"),
      col("year").cast(IntegerType).as("year"),
      lit("YEAR").as("period"),
      substring(col("location"), 1, 2).as("statefips"),
      when(col("location").contains("ag"),
        regexp_extract(col("location"), "ag(.*)$", 1)).otherwise(lit(""))
        .as("agdistrictcode"),
      when(length(col("location")) === 5 && !col("location").contains("ag"),
        substring(col("location"), 3, 3)).otherwise(lit("")).as("countycode"),
      split(col("commodity"), ", ").getItem(0).as("commodity"),
      concat(col("commodity"), lit(" - PRICE RECEIVED, MEASURED IN "),
        col("unit")).as("dataitem"),
      col("price").as("value"),
      lit("TOTAL").as("domain"),
      lit("").as("weekending"), lit("").as("geolevel"), lit("").as("state"),
      lit("").as("agdistrict"), lit("").as("county"), lit("").as("zipcode"),
      lit("").as("region"), lit("").as("watershedcode"), lit("").as("watershed"),
      lit("").as("domaincategory"), lit("").as("cv"))
      .select(Staging.quickstatsCols.map(col): _*)

    val pipe = new NassPipeline(spark, input)
    val got = pipe.commodity_price.select(
      col("commodity"), col("location"),
      col("year").cast(IntegerType).as("year"), col("unit"),
      round(col("price").cast(DoubleType), 2).as("price"))
    val exp = golden.select(
      col("commodity"), col("location"),
      col("year").cast(IntegerType).as("year"), col("unit"),
      round(col("price").cast(DoubleType), 2).as("price"))

    val missing = exp.exceptAll(got).count()
    assert(missing === 0, s"$missing golden rows not reproduced")
    // extras = rollup-synthesized ancestors absent from the golden
    // (derived from richer inputs); bound them to stay honest
    val extras = got.exceptAll(exp).count()
    assert(extras < exp.count() / 2,
      s"unexpectedly many synthesized extras: $extras")
  }
}
