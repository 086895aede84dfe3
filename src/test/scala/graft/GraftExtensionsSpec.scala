package graft

import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** The SQL function surface must be the same machinery as the Scala
  * API — every registered function is compared against its DataFrame
  * twin on the same input.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "el la de que los 1,234.56 here"),
    (3L, "")).toDF("doc_id", "text")

  test("SQL functions equal their DataFrame twins") {
    docs.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT doc_id,
        |  to_number('1,234.56') AS parsed,
        |  shingle_hashes(text) AS grams,
        |  minhash_sig(shingle_hashes(text)) AS sig,
        |  simhash(text) AS sh,
        |  fingerprint_hex(text) AS fp,
        |  fingerprint60(text) AS fp60,
        |  quality_score(text) AS q,
        |  lang_id(text) AS lang,
        |  token_count(text) AS n_tok
        |FROM ext_docs""".stripMargin)
    val api = docs.select(col("doc_id"),
      functions.ToNumber.to_number(lit("1,234.56")).as("parsed"),
      Dedup.shingleHashes(col("text")).as("grams"),
      Dedup.minhashSignature(Dedup.shingleHashes(col("text"))).as("sig"),
      Dedup.simhash(col("text")).as("sh"),
      TextAnalysis.fingerprintHex(col("text")).as("fp"),
      TextAnalysis.fingerprint60(col("text")).as("fp60"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.tokenCount(col("text")).as("n_tok"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("z_value in SQL equals the ZOrder expression") {
    val pairs = Seq((0L, 0L), (1L, 0L), (2L, 3L), (65535L, 65535L))
      .toDF("x", "y")
    pairs.createOrReplaceTempView("ext_zv")
    val sql = spark.sql("SELECT z_value(x, y) AS z FROM ext_zv")
      .as[Long].collect().toSeq
    val api = pairs.select(graft.ops.ZOrder.zValue($"x", $"y"))
      .as[Long].collect().toSeq
    assert(sql === api)
  }

  test("k_min_distinct aggregate in SQL equals the Kmv register build") {
    (1 to 500).map(i => ("g", s"v-${i % 120}")).toDF("grp", "v")
      .createOrReplaceTempView("ext_kmv")
    val sql = spark.sql(
      """SELECT grp, k_min_distinct(fingerprint60(v), 16) AS hs
        |FROM ext_kmv GROUP BY grp""".stripMargin)
      .select(explode($"hs").as("h")).as[Long].collect().toSeq
    val api = graft.sketch.Kmv.registers(
      spark.table("ext_kmv"), Seq("grp"), "v", k = 16)
      .select($"h").as[Long].collect().toSeq
    assert(sql.sorted === api.sorted && sql.length === 16)
  }

  test("top_k_by and misra_gries aggregates in SQL equal the Column API") {
    (1 to 300).map(i => (s"g${i % 3}", (i % 37).toLong, i.toLong))
      .toDF("grp", "ord", "pay").createOrReplaceTempView("ext_topk")
    val sql = spark.sql(
      """SELECT grp, top_k_by(ord, pay, 4) AS top
        |FROM ext_topk GROUP BY grp""".stripMargin)
      .select($"grp", $"top".cast("string")).as[(String, String)]
      .collect().toSet
    val api = spark.table("ext_topk").groupBy($"grp")
      .agg(functions.TopKAgg.top_k_by($"ord", $"pay", 4).as("top"))
      .select($"grp", $"top".cast("string")).as[(String, String)]
      .collect().toSet
    assert(sql === api)
    // misra_gries on a single partition: exact counters for ≤k items
    val mg = spark.sql(
      """SELECT misra_gries(x, 8) AS c FROM
        |  (SELECT explode(array(5L, 5L, 7L, 5L, 7L, 9L)) AS x)"""
        .stripMargin).select($"c".cast("string")).as[String].head()
    assert(mg === "[{5, 3}, {7, 2}, {9, 1}]")
  }

  test("bloom_contains in SQL equals the literal-words probe") {
    val keys = (0L until 200L by 3L).toDF("k")
    val words = graft.ops.BloomJoin.bloomWords(keys, "k", mBits = 1024)
    val wordsSql = words.mkString("array(", "L, ", "L)")
    (0L until 200L).toDF("k").createOrReplaceTempView("ext_bloom")
    val sql = spark.sql(
      s"SELECT k, bloom_contains(cast(k as string), $wordsSql, 1024) AS m " +
        "FROM ext_bloom").as[(Long, Boolean)].collect().toMap
    val api = (0L until 200L).toDF("k")
      .select($"k", graft.sketch.Bloom.mightContainWords($"k", words, 1024)
        .as("m")).as[(Long, Boolean)].collect().toMap
    assert(sql === api)
    // no false negatives on the build set
    assert((0L until 200L by 3L).forall(sql(_)))
  }

  test("dot_fold in SQL equals the Scala fold") {
    val vecs = Seq((1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("id", "a", "b")
    vecs.createOrReplaceTempView("ext_vecs")
    val s = spark.sql("SELECT dot_fold(a, b) AS d FROM ext_vecs")
      .head().getDouble(0)
    val d = vecs.select(graft.sim.Ann.dot($"a", $"b")).head().getDouble(0)
    assert(s === d && s === 32.0)
  }

  test("registerViews exposes the nass DAG to spark.sql") {
    val csvs = new java.io.File("/root/reference/src/quickstats")
      .listFiles().filter(_.getName.endsWith(".csv")).map(_.getPath).toSeq
    val engine = new SummaryEngine(spark, csvs)
    engine.registerViews()
    val n = spark.sql(
      "SELECT count(*) FROM nass_commodity_yield WHERE year = 2012")
      .head().getLong(0)
    assert(n > 0)
    // a join across registered views plans and runs
    val joined = spark.sql(
      """SELECT count(*) FROM nass_commodity_harvest h
        |JOIN nass_commodity_list l USING (commodity)""".stripMargin)
      .head().getLong(0)
    assert(joined > 0)
  }
}
