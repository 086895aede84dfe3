package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-probe data generator: replicate an existing testdata dir K×
  * with referential integrity preserved, for the ≥sf1 scaling sweep
  * (VERDICT r10 item 6). NOT a substitute for the driver's testdata —
  * the oracle gates still run against the driver's dirs; this exists
  * so per-query runtime can be measured one order of magnitude up and
  * compared against each operator's documented asymptotic bound.
  *
  * Replication scheme (replica r = 0 is the untouched original):
  *  - dims (region, nation) copy once — they are genuinely fixed;
  *  - every entity key shifts by r·(max+1) of its table (customers,
  *    suppliers, parts, orders, events, users, docs, vectors), and
  *    every foreign key shifts by the SAME constant, so joins fan out
  *    exactly K× with no cross-replica edges;
  *  - document text gains a per-replica suffix token: replicas become
  *    NEAR-duplicates of the original (Jaccard ≈ n/(n+1)) — the
  *    realistic recrawl structure — instead of exact duplicates that
  *    would collapse under exact dedup; the optional `disjoint` mode
  *    (4th CLI arg) instead remaps every token per replica, holding
  *    duplicate DENSITY constant — see the documents transform below;
  *  - embeddings shift by r/1000 per component: distinct vectors,
  *    same cluster geometry.
  *
  * Each table lands as ONE parquet file named <table>.parquet (the
  * oracle tool opens that exact path), written through Spark so the
  * physical types (timestamp_ntz, float[]) match the driver's layout
  * byte-for-byte at the schema level (DataProbe-verified).
  */
object ScaleGen {

  private def shiftBy(df: DataFrame, keys: Seq[String],
      shift: Map[String, Long], r: Int): DataFrame =
    keys.foldLeft(df) { (d, k) =>
      d.withColumn(k, col(k) + lit(r * shift(k)))
    }

  def main(args: Array[String]): Unit = {
    val (srcDir, outDir, reps, mode) = args match {
      case Array(s, o, r) => (s, o, r.toInt, "neardup")
      case Array(s, o, r, m) => (s, o, r.toInt, m)
      case _ => sys.error("usage: ScaleGen <srcDir> <outDir> <reps> [neardup|disjoint]")
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, srcDir, outDir, reps, mode)
    spark.stop()
  }

  /** Generation body, session-agnostic (specs call it on the shared
    * test session; `main` owns session lifecycle).
    */
  def run(spark: SparkSession, srcDir: String, outDir: String,
      reps: Int, mode: String): Unit = {
    require(reps >= 1)
    require(mode == "neardup" || mode == "disjoint", s"unknown mode $mode")

    def rd(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def maxOf(t: String, c: String): Long =
      rd(t).agg(max(col(c))).collect().head.getLong(0) + 1L

    val ck = maxOf("customer", "c_custkey")
    val sk = maxOf("supplier", "s_suppkey")
    val pk = maxOf("part", "p_partkey")
    val ok = maxOf("orders", "o_orderkey")
    val ek = maxOf("events", "event_id")
    val uk = maxOf("events", "user_id")
    val dk = maxOf("documents", "doc_id")
    val vk = maxOf("embeddings", "vec_id")

    def repl(t: String, per: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until reps).map(r => per(rd(t), r)).reduce(_ unionByName _)

    val out: Seq[(String, DataFrame)] = Seq(
      "region" -> rd("region"),
      "nation" -> rd("nation"),
      "customer" -> repl("customer",
        (d, r) => shiftBy(d, Seq("c_custkey"), Map("c_custkey" -> ck), r)),
      "supplier" -> repl("supplier",
        (d, r) => shiftBy(d, Seq("s_suppkey"), Map("s_suppkey" -> sk), r)),
      "part" -> repl("part",
        (d, r) => shiftBy(d, Seq("p_partkey"), Map("p_partkey" -> pk), r)),
      "orders" -> repl("orders", (d, r) => shiftBy(d,
        Seq("o_orderkey", "o_custkey"),
        Map("o_orderkey" -> ok, "o_custkey" -> ck), r)),
      "lineitem" -> repl("lineitem", (d, r) => shiftBy(d,
        Seq("l_orderkey", "l_partkey", "l_suppkey"),
        Map("l_orderkey" -> ok, "l_partkey" -> pk, "l_suppkey" -> sk), r)),
      "events" -> repl("events", (d, r) => shiftBy(d,
        Seq("event_id", "user_id"),
        Map("event_id" -> ek, "user_id" -> uk), r)),
      "documents" -> repl("documents", { (d, r) =>
        val shifted = shiftBy(d, Seq("doc_id"), Map("doc_id" -> dk), r)
        // neardup (default): replicas append one suffix token — every
        // original becomes a K-member near-dup cluster (Jaccard
        // n/(n+1)), so the TRUE pair set of any near-dup operator
        // grows ~quadratically in K. The realistic recrawl structure,
        // but it entangles operator scaling with planted-output
        // growth.
        // disjoint (constant density): every token of replica r ≥ 1
        // gets a per-replica suffix, so cross-replica Jaccard is 0 and
        // each replica is a vocabulary-remapped COPY of the original
        // corpus — dup-cluster count scales linearly, cluster size
        // stays the original's, and pair-emitter output grows
        // linearly. This is the regime a real growing corpus
        // approaches (vocabulary grows with the data, pair density
        // collapses — SCALE.md round 11), so the pair of modes
        // separates candidate-bound behavior from output growth.
        val txt =
          if (r == 0) col("text")
          else if (mode == "neardup") concat(col("text"), lit(s" rep$r"))
          else regexp_replace(col("text"), "(\\S+)", "$1_g" + r)
        shifted.withColumn("text", txt)
          .withColumn("n_chars", length(col("text")).cast(LongType))
      }),
      "embeddings" -> repl("embeddings", { (d, r) =>
        val shifted = shiftBy(d, Seq("vec_id"), Map("vec_id" -> vk), r)
        if (r == 0) shifted
        else shifted.withColumn("embedding",
          transform(col("embedding"),
            v => (v + lit(r / 1000.0f)).cast(FloatType)))
      }))

    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    new java.io.File(outDir).mkdirs()
    out.foreach { case (t, df) =>
      val tmp = s"$outDir/__tmp_$t"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.startsWith("part-"))
        .getOrElse(sys.error(s"no part file for $t"))
      val dst = new org.apache.hadoop.fs.Path(s"$outDir/$t.parquet")
      if (fs.exists(dst)) fs.delete(dst, false)
      fs.rename(part, dst)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      println(s"[scalegen] $t -> $dst")
    }
  }
}
