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

/** Misra-Gries heavy-hitter candidate sketch over a BIGINT item
  * column: at most k (item, weight) counters per buffer, mergeable by
  * counter addition + uniform subtraction (the Agarwal et al.
  * mergeable-summaries construction).
  *
  * The GUARANTEE — every item with true frequency > N/(k+1) is present
  * in the final candidate set — holds under EVERY partitioning and
  * merge order, which is what makes the sketch usable as a gate:
  * [[graft.sketch.HeavyHitters.exactHeavyHitters]] recounts the ≤ k
  * candidates exactly and filters on a threshold ≥ N/(k+1), so the
  * composed result is EXACT and deterministic even though the
  * intermediate counter values are merge-order-dependent (this is why
  * the sketch itself is not oracle-hashable but the composed operator
  * is).
  *
  * Why it exists at 100 TB: exact `groupBy(item).count()` shuffles a
  * partial row per (partition, distinct item) — fine for bounded
  * vocabularies, fatal when the item domain is open (urls, user ids,
  * n-grams: trillions of distinct keys). The sketch caps every map
  * partition's contribution at k counters, so shuffle volume is
  * O(partitions·k) no matter how wide the domain; the exact recount
  * pass then touches only the ≤ k survivors (broadcast InSet filter →
  * one tiny aggregate).
  *
  * Eval order: (weight DESC, item ASC) — deterministic for a FIXED
  * merge tree (single-partition spec fixtures), superset-stable under
  * any tree.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Long, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a BIGINT item, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("weight", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long](k * 2)

  override def update(
      buf: java.util.HashMap[Long, Long],
      input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      val cur = buf.get(item)
      if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + 1L)
      else if (buf.size < k) buf.put(item, 1L)
      else {
        // decrement-all: amortized O(1) per row (each decrement pays
        // back an earlier increment), O(k) worst-case per call
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[Long, Long],
      other: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val oit = other.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, cur + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest weight from everything, drop ≤ 0
      val ws = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { ws(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(ws)
      val m = ws(buf.size - k - 1) // (k+1)-th largest
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= m) it.remove() else e.setValue(e.getValue - m)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    val arr = new Array[(Long, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = arr.sortBy { case (item, w) => (-w, item) }
    new GenericArrayData(sorted.map { case (item, w) =>
      InternalRow(item, w)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object HeavyHittersAgg {
  /** Column API: ≤ k Misra-Gries candidate counters as
    * array<struct<item,weight>>, weight DESC. The candidate SET is a
    * guaranteed superset of items with frequency > N/(k+1); the
    * weights are lower-bound estimates, merge-order-dependent — treat
    * them as pruning hints, never as counts.
    */
  def misra_gries(item: Column, k: Int): Column =
    Bridge.toColumn(
      MisraGries(Bridge.toEagerExpression(item), k).toAggregateExpression())
}
