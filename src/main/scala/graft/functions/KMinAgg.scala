package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded k-minimum-distinct-values aggregate: per group, the k
  * smallest DISTINCT NON-NULL long values of `child`, returned as an
  * ascending array<long>. NULL inputs are skipped — a null hash is not
  * a register value; both DuckDB oracle mirrors filter nulls the same
  * way ([[graft.sketch.Kmv.oracleSql]]/`registersOracleSql`).
  *
  * This is the KMV/theta-sketch register builder (see
  * [[graft.sketch.Kmv]]) as a real bounded-state aggregate: O(k) memory
  * per group, map-side partial aggregation, merge by set-union-then-
  * truncate — versus the previous global `distinct()` +
  * `row_number()` window formulation, which shuffled and SORTED every
  * distinct hash of the input (unbounded state, one total sort per
  * group) to keep k of them. At 100 TB the distinct-hash set is the
  * thing that doesn't fit; the aggregator never materializes it.
  *
  * Determinism: "k smallest distinct" is order-insensitive, so the
  * result is identical regardless of partitioning, and matches the
  * DuckDB oracle's row_number-over-sorted formulation exactly.
  */
case class KMinDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  // a non-bigint child would pass analysis and then CCE at runtime in
  // update(); fail it at analysis time instead (AbstractDataType /
  // ExpectsInputTypes are private[sql], so check directly)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"k_min_distinct requires a BIGINT input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], x: Long): Unit =
    if (buf.size < k) { buf.add(x); () }
    else if (x < buf.last()) { if (buf.add(x)) { buf.pollLast(); () } }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out) // TreeSet iterates ascending
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinDistinct =
    copy(child = newChild)
}

object KMinAgg {
  /** Column API: k smallest distinct values of a long column, as an
    * ascending array<long> aggregate.
    */
  def k_min_distinct(value: Column, k: Int): Column =
    Bridge.toColumn(
      KMinDistinct(Bridge.toEagerExpression(value), k).toAggregateExpression())
}
