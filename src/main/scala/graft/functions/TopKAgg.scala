package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate: for each group, the k best
  * (ord, payload) pairs by ord DESC (ties by payload ASC — a
  * deterministic total order when payload is a unique id), returned
  * as an array<struct<ord,payload>> in rank order.
  *
  * This is the scalable alternative to the
  * `row_number().over(partitionBy(g).orderBy(...)) <= k` formulation:
  * the window SORTS every row of every group through one reducer per
  * group (at 100 TB, the hot group IS the skew problem), while this
  * aggregate carries O(k) state per group, partially aggregates
  * map-side (each partition contributes at most k pairs per group),
  * and merges by bounded heap union — the same contract as
  * [[KMinDistinct]], of which it is the keyed-payload generalization.
  *
  * Exact (ord, payload) duplicate pairs collapse to one entry —
  * irrelevant under the intended use (payload is a per-group-unique
  * row id) and documented rather than defended with extra state.
  *
  * Determinism: "k best under a total order" is insensitive to input
  * partitioning and arrival order, so results are stable across runs
  * and engines; the DuckDB oracle replays it as a row_number window
  * over the same (ord DESC, payload ASC) order.
  */
case class TopKBy(
    ord: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def left: Expression = ord
  override def right: Expression = payload

  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == LongType && payload.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by requires BIGINT (ord, payload), got " +
        s"(${ord.dataType.sql}, ${payload.dataType.sql})")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", LongType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  // best-first total order: ord DESC, payload ASC
  private val cmp: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](cmp)

  private def insert(buf: java.util.TreeSet[(Long, Long)], x: (Long, Long)): Unit =
    if (buf.size < k) { buf.add(x); () }
    else if (cmp.compare(x, buf.last()) < 0) {
      if (buf.add(x)) { buf.pollLast(); () }
    }

  override def update(
      buf: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val o = ord.eval(input)
    val p = payload.eval(input)
    // a NULL on either side is not a rankable row: skip, matching the
    // oracle's implicit WHERE ord IS NOT NULL AND payload IS NOT NULL
    if (o != null && p != null)
      insert(buf, (o.asInstanceOf[Long], p.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator() // best-first
    var i = 0
    while (it.hasNext) {
      val (o, p) = it.next()
      out(i) = InternalRow(o, p)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (o, p) = it.next(); bb.putLong(o); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKBy =
    copy(ord = newLeft, payload = newRight)
}

object TopKAgg {
  /** Column API: the k best (ord DESC, payload ASC) pairs per group as
    * an array<struct<ord,payload>> in rank order. Both inputs BIGINT;
    * quantize doubles to integer units first (the repo-wide decimal
    * discipline) so cross-engine ordering is exact.
    */
  def top_k_by(ord: Column, payload: Column, k: Int): Column =
    Bridge.toColumn(
      TopKBy(Bridge.toEagerExpression(ord), Bridge.toEagerExpression(payload), k)
        .toAggregateExpression())
}
