package graft

import graft.queries.Inventory
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real inventory lives in [[graft.queries.Inventory]]; this object
  * just adapts it to the driver's shape.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Inventory.qJoinMulti(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val names = Inventory.entries.map(_._1)
    val dups = names.diff(names.distinct)
    require(dups.isEmpty,
      s"duplicate query names would silently shadow gate rows: $dups")
    Inventory.entries.map { case (name, fn, _) => name -> fn }.toMap
  }

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (driver
    * then records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    Inventory.entries.collect { case (name, _, Some(sql)) => name -> sql }.toMap
}
