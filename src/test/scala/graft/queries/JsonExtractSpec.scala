package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adversarial-input pin of the two JSON extraction paths used by
  * q_json_extract (typed `from_json` vs path `get_json_object`).
  *
  * The driver's events generator emits only clean integer `k` props,
  * so the oracle's `n_agree = count(*)` pin holds there — this spec
  * documents WHERE the extractors genuinely diverge (round-5 advice:
  * nothing exercised quoted numbers / floats / invalid JSON), so the
  * pin is an informed one, not an accident of the fixture.
  */
class JsonExtractSpec extends SparkSpec {
  import spark.implicits._

  private val kSchema = StructType(Seq(StructField("k", LongType)))

  private def extract(df: org.apache.spark.sql.DataFrame) = df.select(
    col("case_id"),
    from_json(col("props"), kSchema).getField("k").as("k1"),
    get_json_object(col("props"), "$.k").cast(LongType).as("k2"))

  test("extractor agreement and divergence across adversarial props") {
    val rows = Seq(
      (1L, """{"k": 5}"""),        // clean int: both 5
      (2L, """{"k": "5"}"""),      // quoted number: DIVERGES (see below)
      (3L, """{"k": 5.7}"""),      // float: DIVERGES (see below)
      (4L, """{"j": 5}"""),        // missing key: both null
      (5L, """not json at all"""), // invalid: both null
      (6L, null),                  // null props: both null
      (7L, """{"k": -12}""")       // negative int: both -12
    ).toDF("case_id", "props")
    val got = extract(rows).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(got(1L) === ((Some(5L), Some(5L))))
    // THE divergences: typed from_json refuses a string-typed "5" and
    // a non-integral 5.7 for a LongType field (null both times), while
    // get_json_object returns the raw scalar text and the non-ANSI
    // cast coerces it — "5" → 5 and "5.7" → 5 (decimal-truncating
    // string cast). A corpus with quoted or float numeric props would
    // break the oracle's n_agree = count(*) pin.
    assert(got(2L) === ((None, Some(5L))))
    assert(got(3L) === ((None, Some(5L))))
    assert(got(4L) === ((None, None)))
    assert(got(5L) === ((None, None)))
    assert(got(6L) === ((None, None)))
    assert(got(7L) === ((Some(-12L), Some(-12L))))

    // null-safe agreement (the query's n_agree definition): everything
    // except the quoted-number and float rows agrees
    val agree = extract(rows)
      .select(col("case_id"), (col("k1") <=> col("k2")).as("ok")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(agree.filter(!_._2).keySet === Set(2L, 3L))
  }

  test("driver events fixture is in the clean regime (n_agree = n)") {
    val out = Inventory.qJsonExtract(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_agree") === r.getAs[Long]("n"),
        s"extractors diverged on real fixture for ${r.getString(0)}")
    }
  }
}
