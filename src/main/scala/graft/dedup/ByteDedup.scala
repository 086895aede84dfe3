package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Byte-level dedup via CONTENT-DEFINED CHUNKING — the storage-system
  * primitive (restic/borg/LBFS lineage) that text-level dedup can't
  * replace for binary payloads (model checkpoints, media, archives):
  * chunk boundaries are declared where a gear rolling hash of the
  * last W bytes hits a mask condition, so boundaries are a function
  * of CONTENT, not position — inserting bytes near the start shifts
  * every fixed-size block but leaves all content-defined chunks after
  * the insertion point identical (ByteDedupSpec pins this
  * shift-resilience law, the whole reason CDC exists).
  *
  * The chunker is a native expression ([[GearChunks]]): the per-byte
  * rolling state is inherently sequential, so it runs as one JVM
  * kernel call per payload inside codegen — a Column-tree or SQL
  * formulation cannot express the loop (which is also why this
  * operator is spec-verified rather than oracle-gated: DuckDB has no
  * way to replay a per-byte rolling state without recursion).
  *
  * Scale shape: chunking is a narrow map (no shuffle); the dedup
  * report is ONE hash-aggregate over (chunk_hash → bytes, refs) —
  * the same group-table footprint as document-level exact dedup, at
  * chunk granularity.
  */
object ByteDedup {

  /** Deterministic 256-entry gear table from the repo's splitmix-free
    * fixed recurrence (no RNG — same table on every JVM).
    */
  private[dedup] val gear: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(256) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      x * 0x2545F4914F6CDD1DL
    }
  }

  /** Chunk payload bytes: boundaries where the gear hash's top
    * `maskBits` bits are zero, with min/max chunk-size clamps.
    * Returns (offset, length, chunk_hash) structs; chunk_hash is a
    * 64-bit FNV-1a of the chunk bytes.
    */
  def chunkKernel(bytes: Array[Byte], maskBits: Int, minSize: Int,
      maxSize: Int): ArrayData = {
    val mask = ((1L << maskBits) - 1) << (64 - maskBits)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      i += 1
      val len = i - start
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize || i == n) {
        // FNV-1a over the chunk
        var f = 0xcbf29ce484222325L
        var j = start
        while (j < i) { f = (f ^ (bytes(j) & 0xffL)) * 0x100000001b3L; j += 1 }
        out += InternalRow(start.toLong, len.toLong, f)
        start = i
        h = 0L
      }
    }
    new GenericArrayData(out.toArray)
  }

  def gearChunks(payload: Column, maskBits: Int = 11, minSize: Int = 64,
      maxSize: Int = 8192): Column =
    Bridge.toColumn(GearChunks(
      Bridge.toExpression(payload), maskBits, minSize, maxSize))

  /** Corpus chunk-dedup report: per payload, its total bytes, chunk
    * count, and the bytes it shares with EARLIER payloads (first
    * occurrence owns a chunk — the [[ParagraphDedup]] ownership rule
    * at byte granularity). One narrow chunking map + one hash-keyed
    * ownership aggregate + one join back.
    * Output: (idCol, n_bytes, n_chunks, dup_bytes).
    */
  def chunkDedupReport(df: DataFrame, idCol: String, payloadCol: String,
      maskBits: Int = 11, minSize: Int = 64, maxSize: Int = 8192): DataFrame = {
    val chunks = df
      .select(col(idCol).cast(LongType).as("__id"),
        explode(gearChunks(col(payloadCol), maskBits, minSize, maxSize))
          .as("c"))
      .select(col("__id"), col("c.hash").as("h"), col("c.len").as("len"))
    val owners = chunks.groupBy(col("h")).agg(min(col("__id")).as("owner"))
    val perDoc = chunks.join(owners, Seq("h"))
      .groupBy(col("__id"))
      .agg(sum(col("len")).as("n_bytes"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("owner") < col("__id"), col("len"))
          .otherwise(0L)).as("dup_bytes"))
    df.select(col(idCol).cast(LongType).as("__id"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_bytes"), lit(0L)).as("n_bytes"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("dup_bytes"), lit(0L)).as("dup_bytes"))
  }
}

/** Content-defined chunk list of a BINARY payload — one sequential
  * kernel call per row (see [[ByteDedup]] for why this cannot be a
  * Column tree).
  */
case class GearChunks(child: Expression, maskBits: Int, minSize: Int,
    maxSize: Int) extends UnaryExpression {
  require(maskBits > 0 && maskBits < 32, "maskBits must lie in (0, 32)")
  require(0 < minSize && minSize <= maxSize, "need 0 < minSize <= maxSize")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("offset", LongType, nullable = false),
      StructField("len", LongType, nullable = false),
      StructField("hash", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    ByteDedup.chunkKernel(input.asInstanceOf[Array[Byte]], maskBits,
      minSize, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.dedup.ByteDedup.chunkKernel(" +
        s"$c, $maskBits, $minSize, $maxSize);")

  override protected def withNewChildInternal(newChild: Expression): GearChunks =
    copy(child = newChild)
}
