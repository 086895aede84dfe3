package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join via deletion-neighborhood blocking
  * (FastSS / SymSpell family) — the fuzzy record-linkage primitive
  * for short keys (entity names, SKUs, queries, usernames): find all
  * string pairs within Levenshtein distance d without comparing all
  * pairs.
  *
  * Completeness: if lev(s1, s2) ≤ d, an optimal alignment leaves a
  * common subsequence reachable from EACH side by at most d single-
  * character deletions, so the two deletion neighborhoods intersect —
  * blocking on neighborhood members misses nothing. The converse is
  * weaker (a shared variant only bounds the distance by 2d), hence
  * the exact `levenshtein` verification on candidates.
  *
  * Scale shape: each distinct string fans out to O(len^d) variants —
  * a narrow, codegen'd generate (strings are deduplicated first, so
  * corpus frequency doesn't multiply the fan-out); candidates come
  * from one equi-join on the variant string, grouping work by bucket
  * exactly like MinHash banding does for documents; the verify step
  * touches candidate pairs only. All-pairs never happens. Intended
  * domain: short keys (len ≲ 40) and d ≤ 2 — past that the variant
  * fan-out outgrows LSH-style alternatives.
  */
object FuzzyJoin {

  /** All strings reachable from `s` by at most `maxEdits` character
    * deletions, `s` itself included — distinct, as an array column.
    * Pure collection builtins (sequence/transform/flatten), so the
    * fan-out stays inside whole-stage codegen.
    */
  def deletionVariants(s: Column, maxEdits: Int): Column = {
    require(maxEdits >= 0 && maxEdits <= 3, "variant fan-out is O(len^d)")
    def del1(arr: Column): Column =
      array_distinct(flatten(transform(arr, t =>
        when(length(t) === 0, array().cast("array<string>"))
          .otherwise(expr_transform_del(t)))))
    var layer = array(s)
    var all = layer
    (1 to maxEdits).foreach { _ =>
      layer = del1(layer)
      all = array_union(all, layer)
    }
    all
  }

  /** One-deletion variants of a single (non-empty) string column. */
  private def expr_transform_del(t: Column): Column =
    transform(sequence(lit(1), length(t)), i =>
      concat(t.substr(lit(1), i - 1), t.substr(i + 1, length(t))))

  /** All pairs of distinct values of `strCol` within Levenshtein
    * distance `maxEdits`: (str_a, str_b, dist), str_a < str_b.
    */
  def selfJoin(df: DataFrame, strCol: String, maxEdits: Int): DataFrame = {
    val names = df.select(col(strCol).as("s")).filter(col("s").isNotNull)
      .distinct()
    val vars = names.select(col("s"),
      explode(deletionVariants(col("s"), maxEdits)).as("v"))
    val cand = vars.select(col("v"), col("s").as("str_a"))
      .join(vars.select(col("v"), col("s").as("str_b")), "v")
      .filter(col("str_a") < col("str_b"))
      .select("str_a", "str_b").distinct()
    cand.withColumn("dist",
        levenshtein(col("str_a"), col("str_b")).cast("long"))
      .filter(col("dist") <= maxEdits)
  }
}
