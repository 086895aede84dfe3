package graft.ops

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Token-budget document chunking — the dual of [[Packing]]: where
  * packing concatenates short documents up to a context budget,
  * chunking splits long documents DOWN to it, with an optional token
  * overlap between consecutive chunks so no span of `overlap` tokens
  * straddles a boundary unseen (the standard RAG / pretraining window
  * trick).
  *
  * Chunk i covers tokens [i·stride, i·stride + chunkTokens) of the
  * whitespace token stream (stride = chunkTokens − overlap); the chunk
  * count is ceil((n − overlap) / stride) floored at 1 for non-empty
  * documents, which emits no redundant tail chunk (a final window
  * fully contained in its predecessor). Zero-token documents emit zero
  * chunks.
  *
  * Scale shape: per-row arithmetic + one Generate (explode) — a NARROW
  * operation, no shuffle anywhere; output partitioning follows the
  * input, so a downstream repartition is the caller's explicit choice.
  * The token array is staged once per document in the projection below
  * the Generate; the per-chunk slices reference the staged column
  * rather than re-tokenizing per chunk.
  */
object Chunking {

  /** @param chunkTokens window size in whitespace tokens
    * @param overlap     tokens shared between consecutive chunks
    *                    (0 ≤ overlap < chunkTokens)
    * @return one row per chunk: (idCol, chunk_idx, n_tokens, chunk_text)
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    // integer ceil((n - overlap)/stride), floored at 1 for n > 0. The
    // division runs in double (Spark int/int is double outside ANSI)
    // but every operand is a small positive int, so the quotient is
    // exact and the int cast truncates to the same value DuckDB's
    // integer `//` produces.
    val n = size(col("__toks"))
    val nChunks = when(n === 0, lit(0))
      .otherwise(greatest(
        ((n - overlap + (stride - 1)) / stride).cast(IntegerType), lit(1)))
    // null text → empty token array (size(null) is -1, which would
    // otherwise fabricate one chunk); the oracle coalesces its token
    // list to [] for the same zero-chunk result
    df.select(col(idCol),
      coalesce(TextAnalysis.tokens(col(textCol)),
        array().cast("array<string>")).as("__toks"))
      .withColumn("__ci",
        explode(when(nChunks > 0, sequence(lit(0), (nChunks - 1).cast(IntegerType)))
          .otherwise(array().cast("array<int>"))))
      .select(
        col(idCol),
        col("__ci").as("chunk_idx"),
        size(slice(col("__toks"), col("__ci") * stride + 1, lit(chunkTokens)))
          .as("n_tokens"),
        array_join(slice(col("__toks"), col("__ci") * stride + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** DuckDB mirror of [[chunkByTokens]] over `table.textCol`. */
  def chunkOracleSql(table: String, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): String = {
    val stride = chunkTokens - overlap
    s"""WITH toks AS (
       |  SELECT $idCol,
       |    coalesce(list_filter(string_split_regex(trim($textCol), '\\s+'),
       |      x -> x != ''), []) AS t
       |  FROM $table),
       |sized AS (
       |  SELECT $idCol, t,
       |    CASE WHEN len(t) = 0 THEN 0
       |         ELSE greatest((len(t) - $overlap + ${stride - 1}) // $stride, 1)
       |    END AS n_chunks
       |  FROM toks)
       |SELECT $idCol, u.ci AS chunk_idx,
       |  len(list_slice(t, u.ci * $stride + 1, u.ci * $stride + $chunkTokens))
       |    AS n_tokens,
       |  array_to_string(
       |    list_slice(t, u.ci * $stride + 1, u.ci * $stride + $chunkTokens), ' ')
       |    AS chunk_text
       |FROM sized, unnest(range(0, n_chunks)) AS u(ci)""".stripMargin
  }
}
