package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Schema-drift-tolerant parquet ingestion — read a corpus whose
  * daily drops evolved their schema (columns added over time, old
  * files missing them) as ONE frame: the long-lived-pipeline reality
  * every training-data store hits (a crawler adds a `lang` column in
  * March; files from January must still read).
  *
  * What Spark's `mergeSchema` gives and what it refuses is pinned by
  * `EvolvedReadSpec`: ADDED columns merge (absent files surface
  * NULL); INCOMPATIBLE type changes (int file vs string file for one
  * column) fail the merge loudly rather than coerce — the correct
  * default for a lakehouse (silent coercion corrupts; the fix is a
  * backfill or an explicit projection per epoch).
  *
  * `readAs` is the second tool: project every file onto a CALLER-
  * DECLARED schema (select with casts + NULL literals for missing
  * columns, applied per input path so each epoch's files are read
  * with their own physical schema). That handles the widening cases
  * mergeSchema refuses, with the cast discipline visible at the call
  * site.
  *
  * Scale shape: both paths stay pure scans — mergeSchema unions
  * footers at planning time (a driver-side footer read, distributed
  * by Spark for many files), and the per-epoch projection is a
  * narrow map over each scan; no shuffle is introduced by either.
  */
object EvolvedRead {

  /** Union-compatible read of many parquet paths with schema merging
    * (added columns become NULL for files that predate them).
    */
  def readMerged(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "need at least one input path")
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
  }

  /** Read each path with its own physical schema, then project every
    * file onto `target`: missing columns become typed NULLs, present
    * columns cast to the target type — the explicit-coercion path for
    * drift mergeSchema rejects (e.g. int → long widening).
    */
  def readAs(spark: SparkSession, paths: Seq[String],
      target: StructType): DataFrame = {
    require(paths.nonEmpty, "need at least one input path")
    paths.map { p =>
      val df = spark.read.parquet(p)
      // case-insensitive match (Spark's default resolution): a file
      // column "Lang" must satisfy a target field "lang", not be
      // silently NULL-ed out
      val have = df.columns.map(c => c.toLowerCase -> c).toMap
      df.select(target.fields.map { f =>
        have.get(f.name.toLowerCase) match {
          case Some(actual) => col(actual).cast(f.dataType).as(f.name)
          case None => lit(null).cast(f.dataType).as(f.name)
        }
      }.toIndexedSeq: _*)
    }.reduce(_.unionByName(_))
  }
}
