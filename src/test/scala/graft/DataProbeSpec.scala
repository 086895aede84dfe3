package graft

import org.apache.spark.sql.functions._

/** The data-shape probe must pass on pristine driver testdata and
  * trip — loudly, via its boolean — on a truncated table that the
  * schema check alone would wave through (round-8 advice item 5).
  */
class DataProbeSpec extends SparkSpec {

  private val sfTiny = "/root/testdata/sf0.001"

  test("probe passes on pristine driver testdata (schema + count floors)") {
    assert(DataProbe.check(spark, sfTiny))
  }

  test("a truncated table trips the count floor the schema probe misses") {
    // mirror sf0.001 into a temp dir, truncating documents to 10 rows
    // — identical schema, so only the row-count floor can catch it
    val dir = java.nio.file.Files.createTempDirectory("probe").toFile
    val mirror = new java.io.File(dir, "sf0.001")
    mirror.mkdirs()
    Tables.all.foreach { t =>
      val df = spark.read.parquet(s"$sfTiny/$t.parquet")
      val out = if (t == "documents") df.limit(10) else df
      out.write.mode("overwrite").parquet(s"$mirror/$t.parquet")
    }
    assert(!DataProbe.check(spark, mirror.toString),
      "10-row documents table must fail the sf0.001 floor of 250")
    // an unknown sf basename skips floors but still schema-checks
    val renamed = new java.io.File(dir, "custom")
    assert(mirror.renameTo(renamed))
    assert(DataProbe.check(spark, renamed.toString),
      "floors are per-known-sf; unknown dirs only need non-empty tables")
  }
}
