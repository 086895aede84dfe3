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
  /** events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (which
    * Spark's vectorized reader rejects, [PARQUET_TYPE_ILLEGAL]) and
    * plain TIMESTAMP(MICROS); the generator has changed layout across
    * regenerations. Read type-adaptively: set the legacy conf so a
    * NANOS column loads as a raw long (the flag is a no-op for every
    * other type this library reads), then normalize on the LOADED type:
    *
    *  - LongType (NANOS-as-long layout): integer-`div` to micros and
    *    rebuild the timestamp. `div` keeps the conversion exact — a
    *    double round-trip would lose precision at 1e18 nanos — and
    *    matches DuckDB's ns→µs truncation.
    *  - TimestampNTZType (MICROS layout, NTZ-inferred): cast to
    *    TimestampType. All sessions in this library pin
    *    spark.sql.session.timeZone=UTC, so the cast is value-preserving
    *    and downstream time functions see the type they were tested on.
    *  - TimestampType: pass through.
    *
    * SESSION SIDE EFFECT (deliberate, not restorable): the conf is set
    * on the caller's session and stays set — parquet readers consult
    * the session conf at EXECUTION time, so a set-then-restore around
    * the `read` call would break a NANOS scan when the action finally
    * runs. The flag only changes how NANOS-annotated int64 columns
    * load, a type this library's other tables do not use.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
