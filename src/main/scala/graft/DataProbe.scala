package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** First-run data-shape smoke probe.
  *
  * The driver regenerates /root/testdata between rounds, and a silent
  * physical-layout change (r7: events.ts flipped from TIMESTAMP(NANOS)
  * to TIMESTAMP(MICROS)) once blanked 17 query families without any
  * loud signal — every query just failed analysis and benched at the
  * cost of throwing. This probe runs before the query loop in both
  * Bench and Verify: it loads every table through the SAME loader the
  * queries use (so it validates post-normalization shape, not raw
  * parquet), asserts the expected logical schema and non-emptiness,
  * and prints a full expected-vs-actual diff on any mismatch. It
  * WARNS, never aborts: a mismatch may still leave most queries green,
  * and a partial round beats an empty one.
  */
object DataProbe {

  /** Expected post-loader logical schema, as (column, simpleString type).
    * Timestamp columns written naive (no UTC adjustment) load as
    * timestamp_ntz under Spark 4's default inferTimestampNTZ=true;
    * events.ts is normalized to session-tz timestamp by Tables.events.
    */
  val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  /** Per-scale-factor row-count LOWER bounds (half the driver's
    * documented generation counts, so ordinary regeneration noise
    * passes but a truncated or partially regenerated table — which
    * would sail through the schema probe silently — trips a loud
    * warning). Keyed by the sf directory's basename; an unknown
    * basename skips the count check (schema probe still runs).
    */
  val minRows: Map[String, Map[String, Long]] = Map(
    "sf0.001" -> Map("region" -> 3L, "nation" -> 12L, "customer" -> 75L,
      "supplier" -> 5L, "part" -> 100L, "orders" -> 750L,
      "lineitem" -> 3000L, "events" -> 500L, "documents" -> 250L,
      "embeddings" -> 250L),
    "sf0.01" -> Map("region" -> 3L, "nation" -> 12L, "customer" -> 750L,
      "supplier" -> 50L, "part" -> 1000L, "orders" -> 7500L,
      "lineitem" -> 30000L, "events" -> 5000L, "documents" -> 250L,
      "embeddings" -> 250L),
    "sf0.1" -> Map("region" -> 3L, "nation" -> 12L, "customer" -> 7500L,
      "supplier" -> 500L, "part" -> 10000L, "orders" -> 75000L,
      "lineitem" -> 300000L, "events" -> 50000L, "documents" -> 2500L,
      "embeddings" -> 1000L))

  /** Load a table through its normalizing loader (events needs one). */
  private def loadNormalized(s: SparkSession, d: String, name: String): DataFrame =
    name match {
      case "events" => Tables.events(s, d)
      case other    => Tables.load(s, d, other)
    }

  private def fmt(schema: Seq[(String, String)]): String =
    schema.map { case (n, t) => s"$n:$t" }.mkString(", ")

  /** Probe every table; returns true iff all match. Mismatch details go
    * to stderr (captured in full by the driver's log) with a short
    * marker on stdout so the bench log's tail capture shows the verdict.
    */
  def check(spark: SparkSession, sfDir: String): Boolean = {
    val sfName = new java.io.File(sfDir).getName
    val bounds = minRows.getOrElse(sfName, Map.empty)
    val counts = scala.collection.mutable.ListBuffer.empty[String]
    val bad = Tables.all.flatMap { t =>
      try {
        val df = loadNormalized(spark, sfDir, t)
        val actual = df.schema.fields.toSeq
          .map(f => f.name -> f.dataType.simpleString)
        val exp = expected(t)
        if (actual != exp) {
          System.err.println(s"[probe] SCHEMA MISMATCH table=$t")
          System.err.println(s"[probe]   expected: ${fmt(exp)}")
          System.err.println(s"[probe]   actual:   ${fmt(actual)}")
          Some(t)
        } else {
          // row-count floor: a truncated/partially regenerated table
          // passes the schema probe but fails here, loudly
          val n = df.count()
          counts += s"$t=$n"
          val floor = bounds.getOrElse(t, 1L)
          if (n < floor) {
            System.err.println(
              s"[probe] ROW COUNT LOW table=$t rows=$n expected>=$floor ($sfDir)")
            Some(t)
          } else None
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[probe] LOAD FAILED table=$t: ${e.getMessage}")
          Some(t)
      }
    }
    System.err.println(s"[probe] row counts: ${counts.mkString(", ")}")
    if (bad.isEmpty) {
      System.err.println(s"[probe] data-shape OK: ${Tables.all.size} tables match expected schemas ($sfDir)")
      true
    } else {
      val msg = s"[probe] DATA-SHAPE MISMATCH (${bad.mkString(",")}) — " +
        "testdata layout changed under the loaders; expect query failures below"
      System.err.println(msg)
      println(msg) // tail-captured stdout too: make the cause findable
      false
    }
  }
}
