package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Ann
import graft.text.{Bm25, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared DuckDB-SQL fragment generators, kept in lockstep with the
  * TextAnalysis/Dedup constants — the single source of truth for
  * algorithm parameters across the Spark operators and their oracles.
  *
  * Part of the [[PipelineQueries]] linear trait chain: each trait
  * extends the previous one, so member initialization order and
  * visibility are IDENTICAL to the former single-object layout (the
  * chain is a file split, not an architecture: everything still
  * composes into the one PipelineQueries object).
  */
private[queries] trait PipelineSqlBase {

  // --- shared DuckDB SQL fragments, kept in lockstep with TextAnalysis/Dedup

  /** DuckDB: whitespace tokens of text (empty-token-free). */
  private[queries] val toksSql =
    """list_filter(string_split_regex(trim(text), '\s+'), x -> x != '')"""

  /** DuckDB: graft.text.TextAnalysis.hash60 of expression e. */
  private[queries] def hash60Sql(e: String): String =
    s"cast(('0x' || substr(md5($e), 1, 15)) as bigint)"

  /** DuckDB: distinct hashed word w-shingles of the token list `l`. */
  private[queries] def shinglesWSql(l: String, w: Int): String = {
    val joined = (0 until w).map(o => s"$l[i+$o]").mkString(" || ' ' || ")
    s"""list_distinct(list_transform(
       |  list_transform(range(1, greatest(len($l) - ${w - 1}, 0) + 1),
       |    i -> $joined),
       |  g -> ${hash60Sql("g")} % ${Dedup.P}))""".stripMargin
  }

  /** DuckDB: distinct hashed word 3-shingles of the token list `l`. */
  private[queries] def shinglesSql(l: String): String = shinglesWSql(l, 3)

  /** DuckDB: 16-element minhash signature of shingle-hash list `sh`. */
  private[queries] def minhashSql(sh: String): String =
    Dedup.minhashCoeffs.map { case (a, b) =>
      s"coalesce(list_min(list_transform($sh, x -> (x * $a + $b) % ${Dedup.P})), ${Dedup.P})"
    }.mkString("[", ",\n ", "]")

  private[queries] def inList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ",", ")")

  /** DuckDB: left-fold dot product of two list columns — the oracle
    * image of Ann.dot (graft.functions.DotFold): same operand order,
    * same double math.
    */
  private[queries] def listDotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(cast(0 as double),
       |  list_transform(range(1, len($a) + 1),
       |    i -> cast($a[i] as double) * cast($b[i] as double))),
       |  (acc, v) -> acc + v)""".stripMargin

  /** DuckDB: sign-pattern LSH bucket key of `vec` over the first
    * `h` dim-64 hyperplanes — the oracle image of Ann.lshKey
    * (single-sourced plane constants via Ann.hyperplane).
    */
  private[queries] def lshKeySql(vec: String, h: Int, offset: Int = 0): String = {
    def dotPlane(p: Seq[Double]) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |  list_transform(range(1, 65),
         |    i -> cast($vec[i] as double) * (${p.mkString("[", ",", "]")})[i])),
         |  (acc, x) -> acc + x)""".stripMargin
    (0 until h).map(i => Ann.hyperplane(offset + i, 64))
      .map(p => s"(CASE WHEN ${dotPlane(p)} >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
  }

  /** DuckDB: the count-derived seed plane count of
    * [[graft.sim.KnnGraph.seedPlanes]] as a CASE chain over `cntSql` —
    * EXACT integer comparisons generated from the same constants the
    * engine clamps with, so the two derivations cannot drift. The SQL
    * stays structurally static at every scale factor; only the data
    * flowing through the scalar subquery changes (the q_semdedup
    * derived-k discipline applied to a bucketing knob).
    */
  private[queries] def knnPlanesSql(cntSql: String): String = {
    import graft.sim.KnnGraph.{SeedMinPlanes, SeedMaxPlanes, SeedTargetOccupancy}
    val whens = (SeedMinPlanes until SeedMaxPlanes)
      .map(p => s"WHEN $cntSql <= ${SeedTargetOccupancy << p} THEN $p")
      .mkString(" ")
    s"CASE $whens ELSE $SeedMaxPlanes END"
  }

  /** DuckDB: occupancy-adaptive LSH bucket key — the full
    * [[graft.sim.KnnGraph.SeedMaxPlanes]]-plane sign key masked down
    * to the derived plane count by a string prefix (`substr(key, 1,
    * P)` ≡ keeping the first P planes, exactly the plane subset the
    * engine blocks with). `pSql` is a scalar subquery yielding P.
    */
  private[queries] def lshKeyMaskedSql(vec: String, pSql: String,
      offset: Int = 0): String =
    s"substr(${lshKeySql(vec, graft.sim.KnnGraph.SeedMaxPlanes, offset)}, 1, ($pSql))"

  /** DuckDB: one SELECT per LSH band, exploding table `src`'s
    * (id, sig) rows into ($idOut, sig, bucket) — the single source of
    * the band/row layout for every MinHash oracle.
    */
  private[queries] def bandSelectsSql(src: String, idOut: String): String =
    (0 until Dedup.bands).map { b =>
      val key = (1 to Dedup.rowsPerBand)
        .map(r => s"sig[${b * Dedup.rowsPerBand + r}]")
        .mkString(s"'${b}' || '_' || ", " || '_' || ", "")
      s"SELECT $idOut, sig, $key AS bucket FROM $src"
    }.mkString("\nUNION ALL\n")
}
