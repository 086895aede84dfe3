package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Ann
import graft.text.{Bm25, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (binary payload) queries: metadata, features, resize,
  * pHash, frame sampling.
  *
  * Part of the [[PipelineQueries]] linear trait chain: each trait
  * extends the previous one, so member initialization order and
  * visibility are IDENTICAL to the former single-object layout (the
  * chain is a file split, not an architecture: everything still
  * composes into the one PipelineQueries object).
  */
private[queries] trait MultimodalQueries extends SimilarityGraphQueries {
  // ---------------------------------------------------------- multimodal

  /** Binary-column metadata: never decodes the payload. */
  def qBinaryMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.metadata(
      Multimodal.withPayload(Tables.documents(s, d), "text"), "doc_id")

  val qBinaryMetaSql: String =
    """SELECT doc_id,
      |  octet_length(cast(text as blob)) AS byte_len,
      |  sha256(text) AS sha256
      |FROM documents""".stripMargin

  /** Stub-decoded media features via mapPartitions (typed Dataset
    * path). Even this JVM-side codec is oracle-checkable because the
    * fake decode is pure arithmetic on payload bytes, replicated in
    * SQL via per-char ascii sums.
    */
  def qMediaFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeFeatures(
      s, Multimodal.withPayload(Tables.documents(s, d), "text"), "doc_id")
      .toDF()

  val qMediaFeaturesSql: String =
    """WITH b AS (
      |  SELECT doc_id AS id, length(text) AS n,
      |    ascii(substr(text, 1, 1)) AS b0,
      |    ascii(substr(text, 2, 1)) AS b1,
      |    list_sum(list_transform(range(1, length(text) + 1),
      |      i -> ascii(substr(text, i, 1)))) AS bsum
      |  FROM documents)
      |SELECT id, n AS "byteLen",
      |  16 + abs(CASE WHEN n > 0 THEN b0 ELSE 0 END) % 48 AS width,
      |  16 + abs(CASE WHEN n > 1 THEN b1 ELSE 0 END) % 48 AS height,
      |  1 + n % 3 AS channels,
      |  CASE WHEN n > 0
      |    THEN floor((bsum * 1.0 / n / 255.0) * 1e6 + 0.5) / 1e6
      |    ELSE 0.0 END AS brightness
      |FROM b""".stripMargin

  /** Nearest-neighbor resize through the stub codec boundary: scalar
    * features (dims + byte-sum checksum) are oracle-verified; the
    * resized binary itself is spec-tested (SQL does not ship blobs).
    */
  def qMediaResize(s: SparkSession, d: String): DataFrame =
    Multimodal.resize(
      s, Multimodal.withPayload(Tables.documents(s, d), "text"), "doc_id",
      outW = 8, outH = 8)
      .toDF()
      .select(col("id"), col("srcW"), col("srcH"),
        length(col("resized")).as("out_len"), col("checksum"))

  /** Perceptual-hash image dedup over the stub codec: every payload's
    * 8×8 average-hash plus how many corpus images share it — the
    * multimodal twin of exact text dedup, with the pixel sampling AND
    * the integer-exact thresholding replicated in SQL.
    */
  def qPhash(s: SparkSession, d: String): DataFrame = {
    // persisted: the codec map feeds both the per-hash counts and the
    // join's probe side — without the cache the whole decode pipeline
    // runs twice
    val ph = graft.CacheRegistry.register(
      Multimodal.perceptualHash(
        s, Multimodal.withPayload(Tables.documents(s, d), "text"), "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val counts = ph.groupBy(col("phash")).agg(count(lit(1)).as("n_same"))
    ph.join(counts, Seq("phash"))
      .select(col("doc_id"), col("phash"), col("n_same"))
  }

  val qPhashSql: String =
    """WITH b AS (
      |  SELECT doc_id AS id, length(text) AS n,
      |    16 + abs(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END) % 48 AS w,
      |    16 + abs(CASE WHEN length(text) > 1 THEN ascii(substr(text, 2, 1)) ELSE 0 END) % 48 AS h
      |  FROM documents),
      |px AS (
      |  SELECT id,
      |    list_transform(range(0, 64),
      |      i -> CASE WHEN n > 0
      |        THEN ascii(substr(text, cast((((i % 8) * w) // 8 + (((i // 8) * h) // 8) * w) % n + 1 as bigint), 1))
      |        ELSE 0 END) AS s
      |  FROM b JOIN documents ON b.id = documents.doc_id),
      |ph AS (
      |  SELECT id AS doc_id,
      |    array_to_string(list_transform(s,
      |      v -> CASE WHEN v * 64 > list_sum(s) THEN '1' ELSE '0' END), '') AS phash
      |  FROM px)
      |SELECT doc_id, phash, n_same FROM ph
      |JOIN (SELECT phash, count(*) AS n_same FROM ph GROUP BY phash) USING (phash)""".stripMargin

  val qMediaResizeSql: String =
    """WITH b AS (
      |  SELECT doc_id AS id, length(text) AS n,
      |    16 + abs(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END) % 48 AS w,
      |    16 + abs(CASE WHEN length(text) > 1 THEN ascii(substr(text, 2, 1)) ELSE 0 END) % 48 AS h
      |  FROM documents),
      |px AS (
      |  SELECT id, n, w, h,
      |    cast(list_sum(list_transform(range(0, 64),
      |      i -> CASE WHEN n > 0
      |        THEN ascii(substr(text, cast((((i % 8) * w) // 8 + (((i // 8) * h) // 8) * w) % n + 1 as bigint), 1))
      |        ELSE 0 END)) as bigint) AS checksum
      |  FROM b JOIN documents ON b.id = documents.doc_id)
      |SELECT id, w AS "srcW", h AS "srcH", 64 AS out_len, checksum
      |FROM px""".stripMargin

  /** Frame-sampling plumbing: deterministic split/explode, every-2nd
    * frame kept.
    */
  def qFrameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.withPayload(Tables.documents(s, d), "text"),
      "doc_id", frameBytes = 64, everyNth = 2)
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame_bytes")).as("frame_len"))

  val qFrameSampleSql: String =
    """SELECT doc_id, u.i AS frame_idx,
      |  least(64, length(text) - u.i * 64) AS frame_len
      |FROM documents,
      |  unnest(range(0, cast(ceil(length(text) / 64.0) as bigint))) AS u(i)
      |WHERE u.i % 2 = 0""".stripMargin
}
