package graft.functions

import graft.SparkSpec
import graft.cleanse.Cleanse
import org.apache.spark.sql.functions._

class ToNumberSpec extends SparkSpec {
  import spark.implicits._

  test("parses comma-grouped numerics, nulls sentinels") {
    val out = Seq("10,122", "1,234.56", "(D)", "(Z)", "", "24", "-12.5", "abc")
      .toDF("v")
      .select($"v", ToNumber.to_number($"v").as("n"))
      .collect().map(r => r.getString(0) ->
        Option(r.getDecimal(1)).map(_.doubleValue)).toMap
    assert(out("10,122") === Some(10122.0))
    assert(out("1,234.56") === Some(1234.56))
    assert(out("24") === Some(24.0))
    assert(out("-12.5") === Some(-12.5))
    assert(out("(D)") === None)
    assert(out("(Z)") === None)
    assert(out("") === None)
    assert(out("abc") === None)
  }

  test("property: agrees with the composed-builtin cleanse on numeric strings") {
    // format a wide numeric range with comma grouping, assert both paths
    // parse identically (to_number ∘ format = id, SURVEY §5 law)
    val rng = new scala.util.Random(42)
    val values = Seq.fill(200)((rng.nextLong() % 100000000000L).toDouble / 100.0)
    val rows = values.map(v => f"$v%,.2f").toDF("v")
      .select($"v", ToNumber.to_number($"v").as("a"), Cleanse.toNumberComposed($"v").as("b"))
      .collect()
    rows.zip(values).foreach { case (r, v) =>
      assert(r.getDecimal(1) === r.getDecimal(2), s"mismatch for ${r.getString(0)}")
      assert(math.abs(r.getDecimal(1).doubleValue - v) < 1e-9)
    }
  }

  test("runs inside whole-stage codegen (no fallback)") {
    // non-foldable input so the expression survives constant folding
    // and its doGenCode path actually compiles + executes
    val df = spark.range(5)
      .select(ToNumber.to_number(format_number($"id" * 1234567L, 0)).as("n"))
    // "*(n)" prefix = inside a WholeStageCodegen stage
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    val vals = df.collect().map(r => Option(r.getDecimal(0)).map(_.longValue))
    assert(vals(1) === Some(1234567L))
    assert(vals(4) === Some(4938268L))
  }
}
