package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic CSV export — the reference's `\COPY (select * from
  * nass.<v>) TO <f> WITH CSV HEADER` sink (reference: src/nass.mk:54-60).
  *
  * Spark view order is not preserved through transforms, so the golden
  * row order is reproduced HERE by an explicit orderBy at export time
  * (SURVEY §2.9 O1). PG formatting fidelity: booleans as t/f, NULLs as
  * empty fields.
  *
  * Scale note: `coalesce(1)` single-file output is the fidelity path
  * for golden diffing; `export` without it writes partitioned CSV for
  * real data volumes.
  */
object CsvSink {

  private def pgFormatted(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case BooleanType =>
          when(col(f.name), "t").when(!col(f.name), "f").as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** PG `ORDER BY` sorts NULLS LAST on ascending keys; Spark defaults
    * to NULLS FIRST — golden row order diverges on any NULL sort key
    * (e.g. land_rent's NULL-value sentinel rows) without this.
    * `orderBy` columns are plain (direction-free) expressions by
    * contract; they are exported ascending, nulls last.
    */
  private def pgOrder(orderBy: Seq[Column]): Seq[Column] =
    orderBy.map(_.asc_nulls_last)

  /** Partitioned export (scale path). */
  def export(df: DataFrame, path: String, orderBy: Seq[Column] = Nil): Unit = {
    val ordered = if (orderBy.nonEmpty) df.orderBy(pgOrder(orderBy): _*) else df
    pgFormatted(ordered).write
      .mode("overwrite")
      .option("header", true)
      .option("emptyValue", "")
      .csv(path)
  }

  /** Single-file export (golden-diff fidelity path). */
  def exportSingle(df: DataFrame, path: String, orderBy: Seq[Column] = Nil): Unit = {
    val ordered = if (orderBy.nonEmpty) df.orderBy(pgOrder(orderBy): _*) else df
    pgFormatted(ordered).coalesce(1).write
      .mode("overwrite")
      .option("header", true)
      .option("emptyValue", "")
      .csv(path)
  }
}
