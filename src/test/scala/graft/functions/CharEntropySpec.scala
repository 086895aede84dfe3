package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  private def h(s: String): Double =
    CharEntropyKernel.entropyQ6(UTF8String.fromString(s))

  test("uniform k-symbol strings hit ln(k), degenerate strings hit 0") {
    assert(h("") === 0.0)
    assert(h("aaaaaaa") === 0.0)
    // 2 symbols, equal counts → ln 2; quantization error ≤ 1e-6
    assert(math.abs(h("abab") - math.log(2.0)) < 2e-6)
    // 4 symbols equal counts → ln 4
    assert(math.abs(h("abcdabcdabcd") - math.log(4.0)) < 2e-6)
  }

  test("skewed distribution: exact quantized-integer replay") {
    // "aab": p = {a: 2/3, b: 1/3}
    // slp = 2*round(ln(2/3)*1e6) + 1*round(ln(1/3)*1e6), H = -slp/3e6
    val lpA = math.rint(math.log(2.0 / 3.0) * 1e6).toLong
    val lpB = math.rint(math.log(1.0 / 3.0) * 1e6).toLong
    val expect = BigDecimal(-(2 * lpA + lpB).toDouble / 3 / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(h("aab") === expect)
  }

  test("non-ASCII path: code points counted, surrogate pairs intact") {
    // "éé" single repeated symbol → 0; mixed with ASCII → ln 2
    assert(h("éé") === 0.0)
    assert(math.abs(h("aéaé") - math.log(2.0)) < 2e-6)
    // one astral code point (surrogate pair) + one ASCII, equal → ln 2
    assert(math.abs(h("😀a😀a") - math.log(2.0)) < 2e-6)
  }

  test("astral plane: exact quantized value at the oracle's granularity") {
    // 'a😀b😀' = 4 CODE POINTS {a:1, 😀:2, b:1} — a UTF-16-unit counter
    // would see 6 units and diverge. DuckDB's string_split(text, '')
    // splits per code point too (verified: 4 elements, slp −4158882),
    // so this pins the engine/oracle granularity contract the parquet
    // fixtures (ASCII-dominated) never exercise.
    val lpQ = math.rint(math.log(0.25) * 1e6).toLong  // a, b
    val lpH = math.rint(math.log(0.5) * 1e6).toLong   // 😀
    val slp = 2 * lpQ + 2 * lpH
    assert(slp === -4158882L)
    val expect = BigDecimal(-slp.toDouble / 4 / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(h("a😀b😀") === expect)
  }

  test("column form survives codegen, null in → null out") {
    // spark.range keeps a real physical stage (a local Seq would fold
    // into a LocalTableScan and bypass codegen entirely)
    val df = spark.range(2)
      .select(col("id"),
        CharEntropy.char_entropy(
          when(col("id") === 0, "abab").otherwise(lit(null))).as("e"))
    val rows = df.orderBy("id").collect()
    assert(math.abs(rows(0).getDouble(1) - math.log(2.0)) < 2e-6)
    assert(rows(1).isNullAt(1))
    // the '*(n)' prefix marks the Project as whole-stage-codegen'd —
    // the kernel did not fall back to interpreted eval
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
