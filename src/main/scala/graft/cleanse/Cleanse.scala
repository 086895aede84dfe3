package graft.cleanse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pure-Column cleansing / conformance functions for the NASS-style
  * pipeline. These are the engine's scalar building blocks; every one is
  * composed from codegen'd builtins (no UDFs) so they stay inside
  * whole-stage codegen and remain pushdown-transparent.
  *
  * Semantics re-expressed from the reference workload
  * (reference: src/quickstats.sql:64-89, src/nass.sql:39-67,114-119,
  * src/budget.r:48-65).
  */
object Cleanse {

  /** Trim every string column (reference: src/quickstats.sql:64-89 trims
    * all 20 staging columns). Non-string columns pass through.
    */
  def trimAll(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType) trim(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** PG `to_number(value, '9999999999D99')`-style parse of comma-grouped
    * numerics like "10,122" / "1,234.56" (reference: src/nass.sql:46,67,
    * 114,393; R: as.numeric(gsub(',','',Value)) src/budget.r:51).
    * Delegates to the native codegen'd expression
    * [[graft.functions.ToNumber]] (single pass, no regex engine);
    * non-numeric input (sentinels) → NULL. Equivalence with the
    * composed regexp_replace+cast form is property-tested in
    * ToNumberSpec.
    */
  def toNumber(c: Column, precision: Int = 14, scale: Int = 2): Column =
    graft.functions.ToNumber.to_number(c, precision, scale)

  /** The composed-builtin form (regex strip + cast), kept as the
    * differential-testing twin of the native expression.
    */
  def toNumberComposed(c: Column, precision: Int = 14, scale: Int = 2): Column =
    regexp_replace(c, ",", "").cast(DecimalType(precision, scale))

  /** Sentinel filter: NASS publishes "(D)" withheld / "(Z)" rounds-to-zero
    * etc.; the reference drops any parenthesised value
    * (reference: src/nass.sql:119 `not value~'^\(.*\)'`).
    */
  def notSentinel(c: Column): Column = !c.rlike("^\\(.*\\)")

  /** THE central conformance rule: derive a single location key from
    * (stateFips, asdCode, countyCode) — county → state||county,
    * ag-district → state||'ag'||asd, else state
    * (reference: src/nass.sql:39-41,62-65,111-113,390-392;
    * R: src/budget.r:62-65). Appears in 4 spellings in the reference;
    * factored once here.
    */
  def locationOf(stateFips: Column, asdCode: Column, countyCode: Column): Column =
    when(countyCode.isNotNull && countyCode =!= "", concat(stateFips, countyCode))
      .when(asdCode.isNotNull && asdCode =!= "", concat(stateFips, lit("ag"), asdCode))
      .otherwise(stateFips)

  /** Commodity normalization: commodity || ', '||class (unless ALL
    * CLASSES) || ', '||util_practice (unless ALL UTILIZATION PRACTICES)
    * (reference: src/nass.sql:57-61; src/swap.sql:25-29).
    */
  def commodityOf(commodity: Column, classDesc: Column, utilPractice: Column): Column =
    concat(
      commodity,
      when(classDesc.isNotNull && classDesc =!= "ALL CLASSES",
        concat(lit(", "), classDesc)).otherwise(lit("")),
      when(utilPractice.isNotNull && utilPractice =!= "ALL UTILIZATION PRACTICES",
        concat(lit(", "), utilPractice)).otherwise(lit("")))

  /** Zero-pad a numeric code to fixed width (R formatC(width, flag='0'),
    * reference: src/budget.r:54-56,161-163).
    */
  def padCode(c: Column, width: Int): Column = lpad(c.cast(StringType), width, "0")

  /** Literal-delimiter split. Spark's `split` takes a REGEX while PG
    * `string_to_array` splits on a literal (reference: src/nass.sql:115,
    * 124 — delimiters ' - ', ', ', ' / ' contain regex metachars in
    * general), so quote the delimiter.
    */
  def splitLiteral(c: Column, delim: String): Column =
    split(c, java.util.regex.Pattern.quote(delim))

  /** PG-faithful split: `string_to_array('', delim)` is the EMPTY array
    * in PG, while Spark's split("") yields [""] — a one-empty-string
    * array that breaks join keys against genuinely-empty paths
    * (observed: reported root prices never matched their synthesized
    * rollup twins).
    */
  def splitLiteralPg(c: Column, delim: String): Column =
    when(c === "", array().cast(ArrayType(StringType)))
      .otherwise(splitLiteral(c, delim))

  /** Escape regex metacharacters in a data-driven pattern fragment
    * (used when the reference interpolates a column value into a regex,
    * e.g. src/nass.sql:402 `regexp_replace(di[1],commodity||'(, )?','')`).
    */
  def regexEscape(c: Column): Column =
    regexp_replace(c, """([\\^$.|?*+()\[\]{}])""", """\\$1""")

  /** Parent path = path minus its last element
    * (reference: src/nass.sql:209,215 `subcommodity[1:array_length-1]`).
    * For an empty array PG yields NULL-ish empty; slice(c,1,-?) needs a
    * non-negative length — greatest guards size()=0.
    */
  def parentPath(c: Column): Column =
    slice(c, lit(1), greatest(size(c) - 1, lit(0)))
}
