package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup/similarity hot paths.
  *
  * The composed-builtin forms of these pipelines run their per-element
  * work inside higher-order functions (transform/aggregate/zip_with),
  * which Spark evaluates INTERPRETED — every shingle or vector element
  * pays expression-tree dispatch and intermediate ArrayData allocation.
  * These expressions compute the same values (bit-for-bit: same
  * tokenizer regex, same md5→60-bit→mod-P hash, same left-to-right
  * double fold) in tight JVM kernels, and implement `doGenCode` so they
  * stay inside whole-stage codegen (the generated code calls the
  * static kernels directly — the [[ToNumber]] pattern).
  *
  * Oracle parity is unchanged by construction: the DuckDB SQL is
  * generated from the same constants and the kernels replicate the
  * builtin semantics exactly (verified by the q_minhash_*, q_dedup_*,
  * q_ngram_jaccard, q_ann_*, q_embed_dup hash gates).
  */
object HashKernels {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** True iff any element of `arr` occurs in the SORTED key array —
    * binary search per element, zero allocation per row (vs
    * arrays_overlap against a literal, which rebuilds its lookup
    * structure on every evaluation). NULL elements never match.
    */
  def sortedContainsAny(arr: ArrayData, sorted: Array[Long]): Boolean = {
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) &&
        java.util.Arrays.binarySearch(sorted, arr.getLong(i)) >= 0)
        return true
      i += 1
    }
    false
  }

  /** First 60 bits of md5(s) as a positive long — identical to
    * conv(substring(md5(s),1,15),16,10): hex chars 0-14 are bytes 0-6
    * plus the high nibble of byte 7.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xffL) >>> 4)
  }

  /** Distinct hashed word w-shingles of the whitespace token stream —
    * the kernel twin of the builtin pipeline
    * filter(split(trim(text),"\s+")) → concat_ws(" ", w toks) →
    * md5-hash60 % p → array_distinct (first-occurrence order).
    */
  def shingleHashes(text: UTF8String, w: Int, p: Long): ArrayData = {
    if (text == null) return null
    val raw = text.toString.split("\\s+")
    var n = 0
    var i = 0
    while (i < raw.length) { if (!raw(i).isEmpty) n += 1; i += 1 }
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[String](n)
    var j = 0
    i = 0
    while (i < raw.length) { if (!raw(i).isEmpty) { toks(j) = raw(i); j += 1 }; i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]((n - w + 1) * 2)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i <= n - w) {
      sb.setLength(0)
      var k = 0
      while (k < w) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val h = hash60(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % p
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** MinHash signature: per permutation i, min over shingles x of
    * (x*a(i)+b(i)) % p; empty shingle set → all-p sentinel. Identical
    * to the single left-fold builtin form (min is order-insensitive).
    */
  def minhashSig(grams: ArrayData, as: Array[Long], bs: Array[Long], p: Long): ArrayData = {
    if (grams == null) return null
    val m = as.length
    val sig = new Array[Long](m)
    java.util.Arrays.fill(sig, p)
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      val x = grams.getLong(i)
      var k = 0
      while (k < m) {
        val h = (x * as(k) + bs(k)) % p
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** SimHash fingerprint over the whitespace token stream: bit k of the
    * result is set when the +1/−1 vote sum over tokens' k-th hash60
    * bits is positive. Kernel twin of the builtin fold
    * (aggregate over transform(tokens, hash60) maintaining `bits` vote
    * counters) — the sum is order-insensitive, so values are identical.
    */
  def simHash(text: UTF8String, bits: Int): Long = {
    val raw = text.toString.split("\\s+")
    val votes = new Array[Int](bits)
    var i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) {
        val h = hash60(raw(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var k = 0
        while (k < bits) {
          if (((h >>> k) & 1L) == 1L) votes(k) += 1 else votes(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < bits) { if (votes(k) > 0) fp |= (1L << k); k += 1 }
    fp
  }

  /** Left-to-right dot-product fold in double — bit-identical to
    * aggregate(zip_with(a,b,(x,y)->double(x)*double(y)), 0.0, +):
    * same operand order, same rounding at every step. Null element or
    * length mismatch → null (the zip_with/aggregate null contract).
    */
  def dotFold(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    if (a == null || b == null) return null
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** All sign-random-projection bucket keys of a vector in one pass —
    * the kernel twin of building each table key as
    * concat_ws("_", t, concat(when(dotFold(vec, plane_i) >= 0, "1")
    * .otherwise("0") …)). `planes` is the row-major flattened
    * [numTables·planesPerTable, dim] hyperplane matrix; table t's key
    * uses plane rows [t·planesPerTable, (t+1)·planesPerTable).
    *
    * Null/edge parity with the composed form: a null vector, a
    * dimension mismatch, or a null element makes every per-plane dot
    * null, and `when(null >= 0, …).otherwise("0")` yields '0' — so the
    * key degrades to the all-zeros pattern rather than null, exactly
    * as the builtin chain does.
    */
  def signBuckets(vec: ArrayData, vecFloat: Boolean, planes: Array[Double],
      numTables: Int, planesPerTable: Int, dim: Int,
      withPrefix: Boolean): ArrayData = {
    val out = new Array[UTF8String](numTables)
    val sb = new java.lang.StringBuilder
    var t = 0
    while (t < numTables) {
      sb.setLength(0)
      if (withPrefix) { sb.append(t); sb.append('_') }
      var j = 0
      while (j < planesPerTable) {
        val base = (t * planesPerTable + j) * dim
        val d = dotRow(vec, vecFloat, planes, base, dim)
        sb.append(if (d != null && d.doubleValue() >= 0.0) '1' else '0')
        j += 1
      }
      out(t) = UTF8String.fromString(sb.toString)
      t += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  private def dotRow(vec: ArrayData, vecFloat: Boolean, planes: Array[Double],
      base: Int, dim: Int): java.lang.Double = {
    if (vec == null || vec.numElements() != dim) return null
    var acc = 0.0
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      val x = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      acc += x * planes(base + i)
      i += 1
    }
    acc
  }

  /** Bloom membership: all probe bits of md5-hash60(s) set in the
    * dense word array (word i = bits [63·i, 63·i+63), bit 63 unused) —
    * the JVM twin of [[graft.sketch.Bloom]]'s SQL probe arithmetic,
    * which passes its own coefficients in so the layouts can't drift.
    */
  def bloomContains(s: UTF8String, words: Array[Long], mBits: Int,
      as: Array[Long], bs: Array[Long], p: Long): Boolean = {
    val x = hash60(s.getBytes) % p
    var i = 0
    while (i < as.length) {
      val pos = (x * as(i) + bs(i)) % p % mBits
      if ((words((pos / 63).toInt) & (1L << (pos % 63).toInt)) == 0L)
        return false
      i += 1
    }
    true
  }
}

/** array<long> of distinct hashed word w-shingles of a text column. */
case class ShingleHashes(child: Expression, w: Int, p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    HashKernels.shingleHashes(input.asInstanceOf[UTF8String], w, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.shingleHashes($c, $w, ${p}L);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** array<long> MinHash signature of an array<long> shingle-hash column. */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {
  require(as.length == bs.length, "coefficient arrays must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSig(input.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.minhashSig($c, $aRef, $bRef, ${p}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Bloom membership probe of a STRING key against a bounded dense
  * word array. The words travel as a codegen REFERENCE OBJECT, not as
  * literal children — an mBits = 2^19 filter is ~8k longs, which as an
  * `array(lit…)` membership projection costs thousands of analyzer
  * nodes and megabytes of (truncated) plan string per probe; here the
  * plan prints one compact node and the generated code indexes the
  * shared array directly. Probe coefficients arrive from
  * [[graft.sketch.Bloom]] so the SQL build / oracle layouts and this
  * kernel cannot drift apart.
  */
case class BloomContainsExpr(child: Expression, words: Array[Long],
    mBits: Int, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {
  require(words.length == (mBits - 1) / 63 + 1,
    s"dense word array must cover mBits=$mBits exactly")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  override def nullSafeEval(input: Any): Any =
    HashKernels.bloomContains(input.asInstanceOf[UTF8String], words, mBits,
      aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    val aRef = ctx.addReferenceObj("bloomA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("bloomB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.bloomContains(" +
        s"$c, $wRef, $mBits, $aRef, $bRef, ${p}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpr =
    copy(child = newChild)
}

/** Membership-of-any: true iff any element of the child long array is
  * in the driver-supplied key set. The keys sort ONCE at construction
  * and bind into codegen as a reference object — per row the cost is
  * |arr|·log|keys| comparisons with zero allocation, where
  * arrays_overlap against a literal array re-hashes the full key set
  * on every evaluation. Built for the streaming decontamination gate
  * (eval-suite-sized key sets probed at ingest rate).
  */
case class LongSetContainsAny(child: Expression, keys: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  @transient private lazy val sorted: Array[Long] = {
    val s = keys.clone(); java.util.Arrays.sort(s); s
  }

  override def nullSafeEval(input: Any): Any =
    HashKernels.sortedContainsAny(input.asInstanceOf[ArrayData], sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("sortedKeys", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.sortedContainsAny($c, $kRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LongSetContainsAny =
    copy(child = newChild)
}

/** SimHash fingerprint (low `bits` bits used) of a text column. */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 60, "hash60 supplies at most 60 bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    HashKernels.simHash(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashKernels.simHash($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Left-fold dot product of two array<float|double> columns → double. */
case class DotFold(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"DotFold needs array<float|double> inputs, got $t")
  }
  @transient private lazy val lFloat = isFloat(left)
  @transient private lazy val rFloat = isFloat(right)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.dotFold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      lFloat, rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}$$r = graft.functions.HashKernels.dotFold(
         |  $a, $b, $lFloat, $rFloat);
         |if (${ev.value}$$r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}$$r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

/** array<string> of per-table sign-projection bucket keys for a vector
  * column. The hyperplane matrix rides along as a plain reference
  * object, NOT as literal child expressions — the composed form inlines
  * numTables·planesPerTable·dim literal nodes (2,304 doubles at the
  * 3×12×64 near-dup config) into the plan, and Catalyst re-analyzes,
  * re-optimizes, and re-codegens all of them on every run; this node
  * keeps the plan O(1) regardless of the plane count.
  *
  * Null vector → null (standard unary null propagation); callers
  * wanting the composed chain's all-zeros degradation for null vectors
  * coalesce with the static zero-pattern keys — [[TextHashes.sign_buckets]]
  * does exactly that, so the column-level twin is total.
  */
case class SignBuckets(child: Expression, planes: Seq[Double],
    numTables: Int, planesPerTable: Int, dim: Int, withPrefix: Boolean)
    extends UnaryExpression {
  require(planes.length == numTables * planesPerTable * dim,
    "planes must be the row-major [numTables*planesPerTable, dim] matrix")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"SignBuckets needs an array<float|double> input, got $t")
  }
  @transient private lazy val vFloat = isFloat
  @transient private lazy val planeArr = planes.toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    HashKernels.signBuckets(input.asInstanceOf[ArrayData],
      vFloat, planeArr, numTables, planesPerTable, dim, withPrefix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("signPlanes", planeArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.HashKernels.signBuckets(
         |  $c, $vFloat, $pRef, $numTables, $planesPerTable, $dim, $withPrefix);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SignBuckets =
    copy(child = newChild)
}

object TextHashes {
  def shingle_hashes(text: Column, w: Int, p: Long): Column =
    Bridge.toColumn(ShingleHashes(Bridge.toExpression(text), w, p))

  def minhash_sig(grams: Column, coeffs: Seq[(Long, Long)], p: Long): Column =
    Bridge.toColumn(MinHashSig(Bridge.toExpression(grams),
      coeffs.map(_._1), coeffs.map(_._2), p))

  def dot_fold(a: Column, b: Column): Column =
    Bridge.toColumn(DotFold(Bridge.toExpression(a), Bridge.toExpression(b)))

  def sim_hash(text: Column, bits: Int): Column =
    Bridge.toColumn(SimHashExpr(Bridge.toExpression(text), bits))

  def set_contains_any(arr: Column, keys: Array[Long]): Column =
    Bridge.toColumn(LongSetContainsAny(Bridge.toExpression(arr), keys))

  /** All sign-projection bucket keys of `vec` in one kernel call.
    * `planes` holds `numTables·planesPerTable` rows of length `dim`
    * (row-major). A null vector degrades to the all-zeros key pattern —
    * the same value the composed when/otherwise chain produces — so the
    * result is never null.
    */
  def sign_buckets(vec: Column, planes: Seq[Seq[Double]], numTables: Int,
      withPrefix: Boolean): Column = {
    require(planes.nonEmpty && numTables > 0 && planes.length % numTables == 0,
      "planes must split evenly across tables")
    val perTable = planes.length / numTables
    val dim = planes.head.length
    val kernel = Bridge.toColumn(SignBuckets(Bridge.toExpression(vec),
      planes.flatten, numTables, perTable, dim, withPrefix))
    val zeros = "0" * perTable
    val zeroKeys = (0 until numTables).map(t =>
      org.apache.spark.sql.functions.lit(
        if (withPrefix) s"${t}_$zeros" else zeros))
    org.apache.spark.sql.functions.coalesce(kernel,
      org.apache.spark.sql.functions.array(zeroKeys: _*))
  }
}
