package graft

import org.apache.spark.sql.functions._

/** The two replication modes' planted-duplicate contracts: `neardup`
  * makes every original a K-member near-dup cluster (output-driven
  * quadratic growth for pair emitters — by design), `disjoint` remaps
  * each replica's vocabulary so cross-replica Jaccard is 0 and
  * duplicate DENSITY stays constant (pair output grows linearly).
  */
class ScaleGenSpec extends SparkSpec {

  private def gen(mode: String): String = {
    val out = java.nio.file.Files
      .createTempDirectory(s"graft-scalegen-$mode").toString
    ScaleGen.run(spark, sf, out, reps = 2, mode = mode)
    out
  }

  test("neardup mode: replica text is the original plus one suffix token") {
    val out = gen("neardup")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val orig = spark.read.parquet(s"$sf/documents.parquet")
    val n = orig.count()
    assert(docs.count() == 2 * n)
    // replica row r=1 of doc d carries doc_id d + (max+1) and
    // text = orig.text + " rep1" — a Jaccard n/(n+1) near-dup
    val shift = orig.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val joined = docs.filter(col("doc_id") >= shift)
      .withColumn("doc_id", col("doc_id") - shift)
      .alias("r").join(orig.alias("o"), "doc_id")
      .filter(col("r.text") =!= concat(col("o.text"), lit(" rep1")))
    assert(joined.count() == 0)
  }

  test("disjoint mode: cross-replica token sets are disjoint, structure preserved") {
    val out = gen("disjoint")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val orig = spark.read.parquet(s"$sf/documents.parquet")
    val shift = orig.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val replicas = docs.filter(col("doc_id") >= shift)
    // every replica token carries the _g1 suffix -> zero overlap with
    // any original token (cross-replica Jaccard 0: dup-cluster count
    // scales linearly, cluster size stays the original corpus's)
    val origToks = orig
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .filter(length(col("t")) > 0).distinct()
    val repToks = replicas
      .select(explode(split(col("text"), "\\s+")).as("t"))
      .filter(length(col("t")) > 0).distinct()
    assert(repToks.join(origToks, "t").count() == 0)
    // token COUNT per document is preserved: the remap renames tokens,
    // it does not add or drop any (same within-replica dup structure)
    val counts = replicas
      .withColumn("doc_id", col("doc_id") - shift)
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).as("n_rep"))
      .join(orig.select(col("doc_id"),
        size(split(col("text"), "\\s+")).as("n_orig")), "doc_id")
      .filter(col("n_rep") =!= col("n_orig"))
    assert(counts.count() == 0)
    // n_chars recomputed to match the remapped text
    assert(docs.filter(col("n_chars") =!=
      length(col("text")).cast("long")).count() == 0)
  }

  test("referential integrity holds in both modes (lineitem keys resolve)") {
    val out = gen("disjoint")
    val l = spark.read.parquet(s"$out/lineitem.parquet")
    val o = spark.read.parquet(s"$out/orders.parquet")
    val p = spark.read.parquet(s"$out/part.parquet")
    assert(l.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count() == 0)
    assert(l.join(p, col("l_partkey") === col("p_partkey"), "left_anti")
      .count() == 0)
  }
}
