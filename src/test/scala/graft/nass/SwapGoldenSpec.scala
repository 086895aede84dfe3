package graft.nass

import graft.SparkSpec
import graft.ops.PivotFixed
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Swap-chain golden fidelity (reference src/swap.sql:171-397):
  *
  *  1. SOLVER roundtrip — every golden swap.csv row (1,599) is folded
  *     back into a harvest_yield preimage (NON-IRRIGATED + IRRIGATED
  *     siblings re-joined into one input row, unsplit rows carried as
  *     totals) and [[SwapPipeline.solve]] must reproduce the golden
  *     exactly. Pairing uses rank-matching within
  *     (location, base, price, unit, price_unit) groups so the 24
  *     multi-pair groups (2 irr + 1-2 non rows) reconstruct too.
  *  2. PIVOT diff — the four crosstab exports recomputed FROM the
  *     golden swap rows must match the committed swap_net /
  *     swap_price / swap_yield / swap_yield_unit goldens cell-by-cell.
  *     The 45 (location, commodity) keys holding two swap rows are
  *     excluded: PG's tablefunc crosstab resolves duplicate keys by
  *     physical row order, which is not a defined semantic on either
  *     engine (every other cell — 6,000+ per pivot — must match).
  */
class SwapGoldenSpec extends SparkSpec {

  private val refDir = "/root/reference"

  private lazy val golden: DataFrame =
    spark.read.option("header", true).csv(s"$refDir/swap.csv")
      .select(col("location"), col("commodity"),
        col("acres").cast(DecimalType(18, 2)).as("acres"),
        col("yield").cast(DecimalType(10, 2)).as("yield"),
        col("price").cast(DecimalType(10, 2)).as("price"),
        col("unit"), col("price_unit"))

  private def normNum(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, round(col(s"`$c`").cast(DoubleType), 2)))

  test("solve() reproduces all 1,599 golden swap rows from a reconstructed preimage") {
    val tagged = golden
      .withColumn("kind",
        when(col("commodity").endsWith(", NON-IRRIGATED"), "non")
          .when(col("commodity").endsWith(", IRRIGATED"), "irr")
          .otherwise("uns"))
      .withColumn("base",
        regexp_replace(col("commodity"), "(, NON-IRRIGATED|, IRRIGATED)$", ""))
      // null-proof group keys (price can be null; Seq-joins drop nulls)
      .withColumn("pk", coalesce(col("price").cast(StringType), lit("~")))
      .withColumn("uk", coalesce(col("unit"), lit("~")))
      .withColumn("puk", coalesce(col("price_unit"), lit("~")))
    val gk = Seq("location", "base", "pk", "uk", "puk")
    val w = Window.partitionBy((gk :+ "kind").map(col): _*)
      .orderBy(col("acres").asc_nulls_first, col("yield").asc_nulls_first)
    val ranked = tagged.filter(col("kind") =!= "uns")
      .withColumn("r", row_number().over(w))
    val nons = ranked.filter(col("kind") === "non")
      .select(gk.map(col) ++ Seq(col("r").as("nr"),
        col("acres").as("non_acres"), col("yield").as("non_yield")): _*)
    val nonCnt = nons.groupBy(gk.map(col): _*).agg(max(col("nr")).as("n_non"))
    val irrs = ranked.filter(col("kind") === "irr")
      .select(gk.map(col) ++ Seq(col("r").as("ir"),
        col("acres").as("irr_acres"), col("yield").as("irr_yield"),
        col("price"), col("unit"), col("price_unit")): _*)
    // rank-match; a lone non row absorbs every irr rank (its emitted
    // non output rows are identical → solve's distinct collapses them,
    // which is exactly how the golden got one non and two irr rows)
    val paired = irrs.join(nonCnt, gk).join(nons, gk)
      .filter(col("nr") === least(col("ir"), col("n_non")))
    val hySplit = paired.select(
      col("location"), col("base").as("commodity"),
      col("irr_acres").cast(DecimalType(18, 2)).as("irrigated_acres"),
      (col("non_acres") + col("irr_acres")).cast(DecimalType(18, 2)).as("total_acres"),
      col("unit"),
      col("non_yield").as("nonirrigated"),
      col("irr_yield").as("irrigated"),
      lit(null).cast(DecimalType(10, 2)).as("total"),
      lit(null).cast(DecimalType(10, 2)).as("production_yield"),
      col("price"), col("price_unit"))
    val hyUns = tagged.filter(col("kind") === "uns").select(
      col("location"), col("commodity"),
      lit(null).cast(DecimalType(18, 2)).as("irrigated_acres"),
      col("acres").cast(DecimalType(18, 2)).as("total_acres"),
      col("unit"),
      lit(null).cast(DecimalType(10, 2)).as("nonirrigated"),
      lit(null).cast(DecimalType(10, 2)).as("irrigated"),
      col("yield").as("total"),
      lit(null).cast(DecimalType(10, 2)).as("production_yield"),
      col("price"), col("price_unit"))

    val num = Seq("acres", "yield", "price")
    val got = normNum(SwapPipeline.solve(hySplit.unionByName(hyUns)), num)
    val exp = normNum(golden, num)
    assert(exp.count() === 1599)
    val missing = exp.exceptAll(got).count()
    assert(missing === 0, s"$missing golden swap rows not reproduced")
    val extras = got.exceptAll(exp).count()
    assert(extras === 0, s"$extras extra rows produced")
  }

  test("the four crosstab exports match their goldens on all unambiguous cells") {
    val ambiguous = golden.groupBy(col("location"), col("commodity"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(col("location"), col("commodity"))
    val ambKeys = ambiguous.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(ambKeys.size === 45) // documented PG-order-dependent cells

    def maskAmbiguous(df: DataFrame): DataFrame =
      SwapPipeline.pivotCommodities.foldLeft(df) { (d, c) =>
        val amb = ambKeys.collect { case (l, cc) if cc == c => l }
        if (amb.isEmpty) d
        else d.withColumn(c,
          when(col("location").isin(amb.toSeq: _*), lit(null))
            .otherwise(col(s"`$c`")))
      }

    def check(pivotGolden: String, valueCol: String): Unit = {
      val got = PivotFixed.crosstab(golden, Seq("location"), "commodity",
        valueCol, SwapPipeline.pivotCommodities)
      val exp = spark.read.option("header", true).csv(s"$refDir/$pivotGolden.csv")
      assert(exp.count() === 157, s"$pivotGolden row count")
      val numeric = valueCol != "unit"
      def norm(df: DataFrame) = {
        val masked = maskAmbiguous(df)
        if (numeric) normNum(masked, SwapPipeline.pivotCommodities) else masked
      }
      val g = norm(got).select(exp.columns.map(c => col(s"`$c`")): _*)
      val e = norm(exp)
      val d1 = g.exceptAll(e).count()
      val d2 = e.exceptAll(g).count()
      assert(d1 === 0 && d2 === 0, s"$pivotGolden differs: $d1/$d2 rows")
    }
    check("swap_net", "acres")
    check("swap_price", "price")
    check("swap_yield", "yield")

    // yield_unit: one row keyed by constant 1; units are unique per
    // commodity so every cell is deterministic
    val gotU = PivotFixed.crosstab(golden.withColumn("k", lit(1)),
      Seq("k"), "commodity", "unit", SwapPipeline.pivotCommodities).drop("k")
    val expU = spark.read.option("header", true)
      .csv(s"$refDir/swap_yield_unit.csv").drop("location")
    val cols = SwapPipeline.pivotCommodities.map(c => col(s"`$c`"))
    assert(gotU.select(cols: _*).collect().toSeq ===
      expU.select(cols: _*).collect().toSeq)
  }
}
