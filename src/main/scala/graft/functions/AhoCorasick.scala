package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-alphabet Aho–Corasick automaton: ONE streaming pass over a
  * document matches an ENTIRE dictionary (every occurrence of every
  * term, including terms nested inside other terms and occurrences
  * that overlap across terms).
  *
  * This is the scale answer to blocklist/keyword screening — the C4 /
  * RefinedWeb "banned word list" gate, dictionary-based PII hints,
  * licence-phrase detection. The naive form is k `contains`/regexp
  * scans per row (k passes over 100 TB of text, or one k-way regex
  * alternation that backtracks); the automaton is O(bytes + matches)
  * per document REGARDLESS of dictionary size, and the compiled
  * automaton rides the closure/codegen references exactly like a
  * broadcast model (the [[NearestCentroidExpr]] /
  * BloomFilterMightContain pattern) — executor memory holds one copy
  * of O(dictionary bytes) state, never per-row state.
  *
  * Construction is the textbook BFS (goto trie → failure links →
  * flattened output lists): edges are kept as per-node SORTED byte
  * arrays probed with binary search (O(edges) memory — a dense
  * nodes×256 table would be the faster-but-fatter choice and stops
  * fitting executors at 10⁶-term dictionaries), and the per-node
  * output list is pre-flattened through the failure chain so the hot
  * loop never walks links to count.
  */
final class AhoCorasick private (
    val edgeKeys: Array[Array[Byte]],
    val edgeTo: Array[Array[Int]],
    val fail: Array[Int],
    /** terms ending at this state (failure chain pre-flattened). */
    val outCnt: Array[Int],
    /** term ids ending at this state (failure chain pre-flattened). */
    val outTerms: Array[Array[Int]],
    val nTerms: Int) extends Serializable {

  /** goto with failure fallback — amortized O(1) per input byte. */
  def step(state0: Int, b: Byte): Int = {
    var st = state0
    while (true) {
      val i = java.util.Arrays.binarySearch(edgeKeys(st), b)
      if (i >= 0) return edgeTo(st)(i)
      if (st == 0) return 0
      st = fail(st)
    }
    0 // unreachable
  }
}

object AhoCorasick {

  /** Build the automaton over the dictionary's UTF-8 bytes. Matching
    * is raw-substring (no word boundaries, no case folding — callers
    * normalize case upstream with `lower`, which stays codegen'd).
    */
  def build(dict: Seq[String]): AhoCorasick = {
    require(dict.nonEmpty, "empty blocklist")
    require(dict.forall(_.nonEmpty), "blocklist terms must be non-empty")
    require(dict.distinct.length == dict.length, "duplicate blocklist term")
    val pats = dict.map(_.getBytes(StandardCharsets.UTF_8))

    // goto trie
    val kids = mutable.ArrayBuffer(mutable.TreeMap.empty[Byte, Int])
    val ends = mutable.ArrayBuffer(List.empty[Int])
    pats.zipWithIndex.foreach { case (p, tid) =>
      var st = 0
      p.foreach { b =>
        st = kids(st).getOrElse(b, {
          kids += mutable.TreeMap.empty[Byte, Int]
          ends += Nil
          kids(st).put(b, kids.length - 1)
          kids.length - 1
        })
      }
      ends(st) = tid :: ends(st)
    }

    // BFS failure links + flattened outputs (parents visit first, so
    // fail(v)'s flattened list is final when v consumes it)
    val n = kids.length
    val fail = new Array[Int](n)
    val outTerms = new Array[Array[Int]](n)
    outTerms(0) = ends(0).reverse.toArray
    val queue = mutable.Queue.empty[Int]
    kids(0).foreach { case (_, v) =>
      fail(v) = 0
      outTerms(v) = (ends(v).reverse ++ outTerms(0)).toArray
      queue += v
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      kids(u).foreach { case (b, v) =>
        var f = fail(u)
        while (f != 0 && !kids(f).contains(b)) f = fail(f)
        fail(v) = kids(f).getOrElse(b, 0) match {
          case `v` => 0 // only when f==0 had no b-edge other than v itself
          case w => w
        }
        outTerms(v) = (ends(v).reverse ++ outTerms(fail(v))).toArray
        queue += v
      }
    }

    new AhoCorasick(
      kids.map(_.keysIterator.toArray).toArray,
      kids.map(_.valuesIterator.toArray).toArray,
      fail, outTerms.map(_.length), outTerms, dict.length)
  }

  /** A term with a BORDER (a proper prefix that is also a suffix) can
    * overlap itself, making the automaton's every-end-position count
    * exceed a left-to-right non-overlapping count. The oracle's
    * `replace`-based counting is non-overlapping, so query-level
    * dictionaries must be border-free for the two to be the same
    * number. The automaton itself has no such restriction.
    */
  def hasBorder(term: String): Boolean =
    (1 until term.length).exists(l =>
      term.substring(0, l) == term.substring(term.length - l))
}

object AhoCorasickKernel {

  /** Per-thread scratch for [[termCounts]]: one counts array + one
    * touched-slot list sized to the automaton's dictionary, allocated
    * once per (thread, automaton) and reset O(matched terms) per row —
    * per-row work never scales with DICTIONARY size, only with what
    * actually matched (a 10⁶-term blocklist costs each row nothing
    * beyond its own matches).
    */
  private val scratch =
    new ThreadLocal[(AhoCorasick, Array[Int], Array[Int])]

  /** `array<struct(term, cnt)>` over one document — the matched
    * dictionary terms (ids ascending) with their occurrence counts;
    * unmatched terms are absent. The attribution variant of [[scan]]
    * (which terms fire, which are dead weight).
    */
  def termCounts(s: UTF8String, ac: AhoCorasick): ArrayData = {
    var st = scratch.get
    if (st == null || (st._1 ne ac)) {
      st = (ac, new Array[Int](ac.nTerms), new Array[Int](ac.nTerms))
      scratch.set(st)
    }
    val cnts = st._2
    val touched = st._3
    var nTouched = 0
    var state = 0
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      state = ac.step(state, s.getByte(i))
      val ts = ac.outTerms(state)
      var j = 0
      while (j < ts.length) {
        val t = ts(j)
        if (cnts(t) == 0) { touched(nTouched) = t; nTouched += 1 }
        cnts(t) += 1
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(touched, 0, nTouched)
    val out = new Array[Any](nTouched)
    var k = 0
    while (k < nTouched) {
      val t = touched(k)
      out(k) = new GenericInternalRow(Array[Any](t, cnts(t)))
      cnts(t) = 0
      k += 1
    }
    new GenericArrayData(out)
  }

  /** `struct(hits, terms)` over one document: every (term, end
    * position) occurrence counted, plus how many DISTINCT dictionary
    * terms appear at least once. Per-row transient state is one bitset
    * word per 64 dictionary terms.
    */
  def scan(s: UTF8String, ac: AhoCorasick): InternalRow = {
    var state = 0
    var hits = 0
    var distinct = 0
    val seen = new Array[Long]((ac.nTerms + 63) >>> 6)
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      state = ac.step(state, s.getByte(i))
      val c = ac.outCnt(state)
      if (c > 0) {
        hits += c
        val ts = ac.outTerms(state)
        var j = 0
        while (j < ts.length) {
          val t = ts(j)
          val w = t >>> 6
          val m = 1L << (t & 63)
          if ((seen(w) & m) == 0L) { seen(w) |= m; distinct += 1 }
          j += 1
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](hits, distinct))
  }
}

/** `struct(hits int, terms int)` of dictionary matches in `child`.
  * The automaton is compiled once on the driver and referenced from
  * generated code (one static kernel call — dictionary size never
  * inflates the generated method, the [[NearestCentroidExpr]]
  * discipline).
  */
case class BlocklistHitsExpr(child: Expression, dict: Seq[String])
    extends UnaryExpression {

  @transient private lazy val auto = AhoCorasick.build(dict)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"blocklist_hits requires string, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("hits", IntegerType, nullable = false),
    StructField("terms", IntegerType, nullable = false)))

  override def nullSafeEval(s: Any): Any =
    AhoCorasickKernel.scan(s.asInstanceOf[UTF8String], auto)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAuto", auto,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.AhoCorasickKernel.scan($s, $acRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistHitsExpr =
    copy(child = newChild)
}

/** `array<struct(term int, cnt int)>` of matched dictionary terms
  * (ids ascending, unmatched absent) — the per-term attribution
  * variant of [[BlocklistHitsExpr]], same reference-object codegen
  * shape.
  */
case class BlocklistTermCountsExpr(child: Expression, dict: Seq[String])
    extends UnaryExpression {

  @transient private lazy val auto = AhoCorasick.build(dict)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"blocklist_term_counts requires string, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", IntegerType, nullable = false),
    StructField("cnt", IntegerType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(s: Any): Any =
    AhoCorasickKernel.termCounts(s.asInstanceOf[UTF8String], auto)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAuto", auto,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.AhoCorasickKernel.termCounts($s, $acRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BlocklistTermCountsExpr = copy(child = newChild)
}

object Blocklist {
  /** Dictionary screen over a text column: `struct(hits, terms)`. */
  def blocklist_hits(text: Column, dict: Seq[String]): Column =
    Bridge.toColumn(BlocklistHitsExpr(Bridge.toExpression(text), dict))

  /** Matched terms with occurrence counts: `array<struct(term, cnt)>`. */
  def blocklist_term_counts(text: Column, dict: Seq[String]): Column =
    Bridge.toColumn(BlocklistTermCountsExpr(Bridge.toExpression(text), dict))
}
