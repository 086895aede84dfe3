package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HierarchyRollupSpec extends SparkSpec {
  import spark.implicits._

  // A tiny 2-commodity hierarchy mirroring the NASS dataitem taxonomy:
  // BEANS > DRY EDIBLE > {LIMA, PINTO}; BEANS reported at root too.
  private def rows = Seq(
    ("BEANS", "06001", 2012, Seq("DRY EDIBLE", "LIMA"), 10.0, "ACRES"),
    ("BEANS", "06001", 2012, Seq("DRY EDIBLE", "PINTO"), 30.0, "ACRES"),
    ("BEANS", "06001", 2012, Seq("GREEN"), 5.0, "ACRES"),
    ("CORN", "06001", 2012, Seq[String](), 100.0, "BU")
  ).toDF("commodity", "location", "year", "path", "acres", "unit")

  test("leaves: anti-join drops rows that are parents of others") {
    val withParent = rows.unionByName(Seq(
      ("BEANS", "06001", 2012, Seq("DRY EDIBLE"), 99.0, "ACRES")
    ).toDF("commodity", "location", "year", "path", "acres", "unit"))
    val lv = HierarchyRollup.leaves(
      withParent, Seq("commodity", "location", "year"), "path")
    // DRY EDIBLE is the parent of LIMA/PINTO → not a leaf
    val paths = lv.select(array_join($"path", ",")).as[String].collect().toSet
    assert(paths === Set("DRY EDIBLE,LIMA", "DRY EDIBLE,PINTO", "GREEN", ""))
  }

  test("sum rollup synthesizes every ancestor incl. root") {
    val out = HierarchyRollup.rollup(
      rows, Seq("commodity", "location", "year"), "path",
      Seq("acres"), HierarchyRollup.SumMode, carry = Seq("unit"))
      .withColumn("p", array_join($"path", ","))
      .select($"commodity", $"p", $"acres")
      .as[(String, String, Double)].collect().toMap2
    assert(out(("BEANS", "DRY EDIBLE,LIMA")) === 10.0)
    assert(out(("BEANS", "DRY EDIBLE,PINTO")) === 30.0)
    assert(out(("BEANS", "DRY EDIBLE")) === 40.0)       // synthesized parent
    assert(out(("BEANS", "")) === 45.0)                  // root = 40 + 5
    assert(out(("CORN", "")) === 100.0)                  // empty-path leaf kept
  }

  test("avg rollup averages sibling groups, then rounds of emission") {
    val out = HierarchyRollup.rollup(
      rows.filter($"commodity" === "BEANS"),
      Seq("commodity", "location", "year", "unit"), "path",
      Seq("acres"), HierarchyRollup.AvgMode)
      .withColumn("p", array_join($"path", ","))
      .select($"p", $"acres").as[(String, Double)].collect().toMap
    assert(out("DRY EDIBLE") === 20.0)   // avg(10,30)
    // root emitted twice: round1 from GREEN-level leaf (5), round2 from
    // synthesized DRY EDIBLE (20) … wait: round1 emits parent of GREEN
    // (root, avg over window of len-1 rows = GREEN only → 5) and parent
    // of LIMA/PINTO (DRY EDIBLE → 20); round2 emits root from DRY
    // EDIBLE → 20; final avg(5, 20) = 12.5 per UNION-dedup semantics.
    assert(out("") === 12.5)
  }

  private implicit class ToMap2(xs: Array[(String, String, Double)]) {
    def toMap2: Map[(String, String), Double] =
      xs.map { case (a, b, c) => (a, b) -> c }.toMap
  }
}
