package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Every loader is a plain parquet scan so Catalyst keeps full pushdown
  * freedom (column pruning + predicate pushdown reach the parquet reader).
  * Do NOT cache here: callers decide materialization, mirroring the
  * reference's view-vs-materialized-view distinction
  * (reference: src/nass.sql:108,236,273,360).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos via
    * the legacy conf and truncate to microseconds (matching DuckDB's
    * ns→µs truncation). Integer `div` keeps the conversion exact —
    * a double round-trip would lose precision at 1e18 nanos.
    *
    * SESSION SIDE EFFECT (deliberate, not restorable): the conf is set
    * on the caller's session and stays set — parquet readers consult
    * the session conf at EXECUTION time, so a set-then-restore around
    * the `read` call would break the scan when the action finally
    * runs. The flag only changes how NANOS-annotated int64 columns
    * load (as raw longs), a type this library's other tables do not
    * use; callers who do read NANOS parquet elsewhere in the same
    * session should set the conf themselves to make the dependency
    * explicit.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
