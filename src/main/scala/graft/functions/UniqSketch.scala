package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Port of the reference's `uniq` adaptive-sampling estimator
  * (AggregateFunctions/UniquesHashSet.h — the BJKST scheme):
  *
  *  - values map to a UInt64 key (AggregateFunctionUniqTraits:
  *    integers as-is, floats by bit pattern, strings via CityHash64);
  *  - the key hashes to 32 bits: low word of intHash64
  *    (DefaultHash<UInt64>, truncated to HashValue_t = UInt32);
  *  - a set keeps only hashes divisible by 2^skip_degree; whenever it
  *    exceeds UNIQUES_HASH_MAX_SIZE = 2^16 elements, skip_degree
  *    increments and non-divisible hashes drop (UniquesHashSet
  *    shrinkIfNeed/rehash);
  *  - the estimate is m·2^d plus a pseudo-random remainder
  *    (intHashCRC32(m) masked to d bits), corrected for 32-bit hash
  *    collisions: round(2^32·(ln 2^32 − ln(2^32 − res)))
  *    (UniquesHashSet::size).
  *
  * The state is ORDER-INDEPENDENT — the surviving set is exactly
  * {h : 2^d | h} for the smallest d keeping ≤ 2^16 elements — so the
  * partial/final merge (max skip, filter, re-thin; UniquesHashSet::
  * merge) reproduces single-threaded results bit-for-bit.
  *
  * Distributed shape: ≤ 256 KB per group regardless of cardinality,
  * where an exact distinct is O(n) state and a full shuffle of every
  * key — the reason the reference defaults uniq to this sketch and
  * the right default at 100 TB.
  */
/** Primitive open-addressing int hash set — the reference's
  * UniquesHashSet table layout: zero lives out-of-band (an empty
  * slot IS 0), Fibonacci-scattered linear probing (the stored values
  * are already hashes, but thinning keeps only multiples of
  * 2^skip_degree whose LOW bits are zero, so the raw value cannot
  * index the table — the reference shifts the skip bits away, we
  * remix). Replaces java.util.HashSet[Integer], whose per-row boxing
  * dominated the 10M-row uniq update path (bench43 q5/q9-q14). */
final class IntHashSet private (initialPow2: Int) {
  // small initial table: ObjectHashAggregate holds ONE buffer per
  // in-memory group, so a grouped uniq over many keys multiplies
  // this allocation; growth to 2^17 slots costs 11 amortized rehashes
  def this() = this(1 << 6)
  private var table = new Array[Int](initialPow2)
  private var shift = Integer.numberOfLeadingZeros(table.length - 1)
  private var n = 0
  private var hasZero = false

  @inline private def slot(h: Int): Int = (h * 0x9E3779B9) >>> shift

  def add(h: Int): Unit = {
    if (h == 0) {
      if (!hasZero) { hasZero = true; n += 1 }
    } else {
      var i = slot(h)
      var c = table(i)
      while (c != 0 && c != h) { i = (i + 1) & (table.length - 1); c = table(i) }
      if (c == 0) {
        table(i) = h
        n += 1
        if ((n - (if (hasZero) 1 else 0)) * 2 > table.length) grow()
      }
    }
  }

  private def grow(): Unit = {
    val old = table
    table = new Array[Int](old.length << 1)
    shift = Integer.numberOfLeadingZeros(table.length - 1)
    var j = 0
    while (j < old.length) {
      val h = old(j)
      if (h != 0) {
        var i = slot(h)
        while (table(i) != 0) i = (i + 1) & (table.length - 1)
        table(i) = h
      }
      j += 1
    }
  }

  /** Drop every element failing `p` (0 always kept by its callers:
    * 0 is divisible by any power of two). */
  def retain(p: Int => Boolean): Unit = {
    val old = table
    table = new Array[Int](old.length)
    n = if (hasZero) 1 else 0
    var j = 0
    while (j < old.length) {
      val h = old(j)
      if (h != 0 && p(h)) {
        var i = slot(h)
        while (table(i) != 0) i = (i + 1) & (table.length - 1)
        table(i) = h
        n += 1
      }
      j += 1
    }
  }

  def size(): Int = n

  /** Grow the table up front to hold `expected` elements without
    * rehashing. Bulk loads (codec read, state merge) insert elements
    * in TABLE-SCAN ORDER of the source set — i.e. sorted by slot —
    * and feeding slot-sorted keys through the incremental grow path
    * creates long linear-probe runs while the table is still small
    * (measured 13× slower than random order on a 37k-entry state;
    * this was ~1 s of every saturated uniq merge in bench43 q5).
    * A right-sized table keeps the load ≤ 50% throughout, so
    * slot-sorted insertion probes normally. */
  def ensureCapacity(expected: Int): Unit = {
    if (expected <= 0) return
    var want = 64
    while (want < expected * 2) want <<= 1
    if (want > table.length) {
      val old = table
      table = new Array[Int](want)
      shift = Integer.numberOfLeadingZeros(table.length - 1)
      var j = 0
      while (j < old.length) {
        val h = old(j)
        if (h != 0) {
          var i = slot(h)
          while (table(i) != 0) i = (i + 1) & (table.length - 1)
          table(i) = h
        }
        j += 1
      }
    }
  }

  def foreach(f: Int => Unit): Unit = {
    if (hasZero) f(0)
    var j = 0
    while (j < table.length) {
      if (table(j) != 0) f(table(j))
      j += 1
    }
  }

  def toSortedArray: Array[Int] = {
    val out = new Array[Int](n)
    var k = 0
    foreach { h => out(k) = h; k += 1 }
    java.util.Arrays.sort(out)
    out
  }

  override def equals(o: Any): Boolean = o match {
    case s: IntHashSet =>
      n == s.n && java.util.Arrays.equals(toSortedArray, s.toSortedArray)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(toSortedArray)
}

final class UniqSketchState {
  /** Hashes (UInt32 in an Int) divisible by 2^skipDegree; the
    * reference's has_zero is just membership of 0 here. */
  var set: IntHashSet = new IntHashSet()
  var skipDegree: Int = 0

  @inline private def good(h: Int): Boolean =
    (h & ((1 << skipDegree) - 1)) == 0

  private def thinIfNeeded(): Unit =
    while (set.size() > UniqSketchState.MaxSize) {
      skipDegree += 1
      set.retain(good)
    }

  def insertHash(h: Int): Unit =
    if (good(h)) { set.add(h); thinIfNeeded() }

  def merge(other: UniqSketchState): Unit = {
    if (other.skipDegree > skipDegree) {
      skipDegree = other.skipDegree
      set.retain(good)
    }
    // bulk load arrives in the other set's table order (slot-sorted);
    // pre-size so no incremental grow happens mid-load (see
    // IntHashSet.ensureCapacity)
    set.ensureCapacity(math.min(
      set.size() + other.set.size(), UniqSketchState.MaxSize + 1))
    other.set.foreach { h =>
      if (good(h)) { set.add(h); thinIfNeeded() }
    }
  }

  def estimate(): Long = {
    val m = set.size().toLong
    if (skipDegree == 0) m
    else {
      var res = m * (1L << skipDegree)
      res += UniqSketchState.intHashCRC32(m) & ((1L << skipDegree) - 1)
      val p32 = 4294967296.0
      math.round(p32 * (math.log(p32) - math.log(p32 - res)))
    }
  }
}

object UniqSketchState {
  /** UNIQUES_HASH_MAX_SIZE = 1 << (17 - 1). */
  val MaxSize = 1 << 16

  /** intHash64 (Common/HashTable/Hash.h:13) — the MurmurHash3
    * finalizer; DefaultHash<UInt64>. */
  def intHash64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** intHashCRC32 (Hash.h:31): hardware CRC32C of the value's 8
    * little-endian bytes, initial register −1, NO final complement —
    * java.util.zip.CRC32C applies both the init and the final XOR, so
    * the raw register is the complement of getValue(). */
  def intHashCRC32(x: Long): Long = {
    val c = new java.util.zip.CRC32C()
    var i = 0
    while (i < 8) { c.update(((x >>> (8 * i)) & 0xff).toInt); i += 1 }
    (~c.getValue()) & 0xffffffffL
  }
}

/** The `uniq` aggregate over one column (or a pre-hashed variadic key
  * with `trivial = true`, mirroring
  * AggregateFunctionUniqUniquesHashSetDataForVariadic's TrivialHash).
  *
  * With `asState = true` this is `uniqState`: the result is the
  * SERIALIZED sketch (≤ ~256 KB regardless of cardinality —
  * UniquesHashSet::write), not the estimate. The reference stores
  * exactly this bounded state in AggregateFunction(uniq, T) columns;
  * an exact distinct set would be O(n) per group at 100 TB. */
case class UniqSketch(
    child: Expression,
    trivial: Boolean = false,
    asState: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[UniqSketchState] {

  override def dataType: DataType = if (asState) BinaryType else LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "uniq_sketch"

  override def createAggregationBuffer(): UniqSketchState = new UniqSketchState

  /** Value → UInt64 key (AggregateFunctionUniqTraits / String
    * CityHash64 path — same mapping as [[UniqHLL12]]). */
  private def keyOf(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case b: Boolean => if (b) 1L else 0L
    case f: Float =>
      java.lang.Float.floatToRawIntBits(f).toLong & 0xffffffffL
    case d: Double => java.lang.Double.doubleToRawLongBits(d)
    case s: UTF8String => HashFns.cityHash64(s.getBytes)
    case a: Array[Byte] => HashFns.cityHash64(a)
    case other => HashFns.cityHash64(
      UTF8String.fromString(other.toString).getBytes)
  }

  private lazy val isTimestamp = child.dataType match {
    case _: TimestampType | TimestampNTZType => true
    case _ => false
  }

  @inline private def putKey(buf: UniqSketchState, key: Long): Unit = {
    // variadic mode: the key IS the hash (TrivialHash), truncated
    val h = if (trivial) key.toInt else UniqSketchState.intHash64(key).toInt
    buf.insertHash(h)
  }

  /** Unboxed per-row updater: when the child is a plain bound column
    * of a primitive/string type (the overwhelmingly common case once
    * the aggregate is bound to its input), read it with the typed
    * InternalRow accessor — `child.eval` boxes every value, and that
    * boxing dominated the 10M-row uniq update path. Falls back to
    * the generic eval for computed children and exotic types. */
  @transient private lazy val updater: (UniqSketchState, InternalRow) => Unit =
    child match {
      case b: org.apache.spark.sql.catalyst.expressions.BoundReference =>
        val ord = b.ordinal
        b.dataType match {
          case LongType =>
            (buf, row) => if (!row.isNullAt(ord)) putKey(buf, row.getLong(ord))
          case IntegerType | DateType =>
            (buf, row) => if (!row.isNullAt(ord)) putKey(buf, row.getInt(ord).toLong)
          case ShortType =>
            (buf, row) => if (!row.isNullAt(ord)) putKey(buf, row.getShort(ord).toLong)
          case ByteType =>
            (buf, row) => if (!row.isNullAt(ord)) putKey(buf, row.getByte(ord).toLong)
          case BooleanType =>
            (buf, row) => if (!row.isNullAt(ord))
              putKey(buf, if (row.getBoolean(ord)) 1L else 0L)
          case FloatType =>
            (buf, row) => if (!row.isNullAt(ord)) putKey(buf,
              java.lang.Float.floatToRawIntBits(row.getFloat(ord)).toLong & 0xffffffffL)
          case DoubleType =>
            (buf, row) => if (!row.isNullAt(ord)) putKey(buf,
              java.lang.Double.doubleToRawLongBits(row.getDouble(ord)))
          case _: TimestampType | TimestampNTZType =>
            (buf, row) => if (!row.isNullAt(ord))
              putKey(buf, Math.floorDiv(row.getLong(ord), 1000000L))
          case StringType =>
            // '' dominates sparse columns (90% of bench SearchPhrase):
            // its CityHash64 is a constant — skip the hash, and since
            // putKey of a constant is idempotent after the first
            // insert, skip that too once seen
            val emptyKey = HashFns.cityHash64(Array.emptyByteArray)
            (buf, row) => if (!row.isNullAt(ord)) {
              val s = row.getUTF8String(ord)
              if (s.numBytes() == 0) putKey(buf, emptyKey)
              else putKey(buf, HashFns.cityHash64(s.getBytes))
            }
          case _ => genericUpdate
        }
      case _ => genericUpdate
    }

  private def genericUpdate: (UniqSketchState, InternalRow) => Unit =
    (buf, input) => {
      val v = child.eval(input)
      if (v != null) {
        val key =
          if (isTimestamp) Math.floorDiv(v.asInstanceOf[Long], 1000000L)
          else keyOf(v)
        putKey(buf, key)
      }
    }

  override def update(buf: UniqSketchState, input: InternalRow): UniqSketchState = {
    updater(buf, input)
    buf
  }

  override def merge(a: UniqSketchState, b: UniqSketchState): UniqSketchState = {
    a.merge(b); a
  }

  override def eval(buf: UniqSketchState): Any =
    if (asState) UniqSketchCodec.write(buf) else buf.estimate()

  override def serialize(buf: UniqSketchState): Array[Byte] =
    UniqSketchCodec.write(buf)

  override def deserialize(bytes: Array[Byte]): UniqSketchState =
    UniqSketchCodec.read(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): UniqSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): UniqSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): UniqSketch =
    copy(child = newChildren.head)
}

/** Shared wire codec for [[UniqSketchState]] — byte-for-byte the
  * reference's UniquesHashSet::write layout
  * (AggregateFunctions/UniquesHashSet.h:373-390): skip_degree as one
  * byte (UInt8 via writeIntBinary), the surviving-hash count as a
  * VarUInt (LEB128: 7 data bits per byte low-first, high bit =
  * continuation), then each 32-bit hash little-endian. Bounded by
  * construction — ≈256 KB worst case (UNIQUES_HASH_MAX_SIZE = 2^16
  * hashes), the same bound the reference obeys. Used both for
  * Spark's internal partial-agg shuffle AND as the stored
  * AggregateFunction(uniq, T) column value, so a state written by
  * `uniqState` on one table round-trips through parquet into
  * `uniqMerge`/`finalizeAggregation` on another. */
object UniqSketchCodec {
  def write(buf: UniqSketchState): Array[Byte] = {
    val n = buf.set.size()
    val bb = ByteBuffer.allocate(1 + 5 + 4 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(buf.skipDegree.toByte)
    var v = n
    while ((v & ~0x7f) != 0) { bb.put(((v & 0x7f) | 0x80).toByte); v >>>= 7 }
    bb.put(v.toByte)
    buf.set.foreach(h => { bb.putInt(h); () })
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  def read(bytes: Array[Byte]): UniqSketchState = {
    val bb = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val s = new UniqSketchState
    s.skipDegree = bb.get() & 0xff
    var n = 0; var shift = 0; var b = 0
    while ({ b = bb.get() & 0xff; n |= (b & 0x7f) << shift; shift += 7
             (b & 0x80) != 0 }) ()
    // the payload is slot-sorted (written in table order): pre-size
    // so the incremental grow path never sees it (13× pathology)
    s.set.ensureCapacity(n)
    var i = 0
    while (i < n) { s.set.add(bb.getInt); i += 1 }
    s
  }

  /** Decode + estimate — the scalar `finalizeAggregation` kernel over
    * a stored uniq state (referenced from codegen by class name; not
    * named `finalize` to avoid the java.lang.Object clash). */
  def finalizeEstimate(bytes: Array[Byte]): Long = read(bytes).estimate()
}

/** Scalar `finalizeAggregation` over a stored AggregateFunction
  * (uniq, T) column — decode the serialized sketch, return the
  * estimate. Codegen'd static call, stays inside whole-stage codegen. */
case class UniqStateFinalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "uniq_state_finalize"

  override protected def nullSafeEval(v: Any): Any =
    UniqSketchCodec.finalizeEstimate(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UniqSketchCodec.finalizeEstimate($c)")

  override protected def withNewChildInternal(newChild: Expression): UniqStateFinalize =
    copy(child = newChild)
}

/** `uniqMerge` / `uniqMergeState` over a stored AggregateFunction
  * (uniq, T) column: inputs are serialized sketches; the merge is
  * UniquesHashSet::merge (max skip-degree, filter, re-thin) — order-
  * independent, so partial/final two-phase agg is bit-stable. With
  * `asState = true` the result stays a serialized state
  * (`uniqMergeState`). */
case class UniqSketchMerge(
    child: Expression,
    asState: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[UniqSketchState] {

  override def dataType: DataType = if (asState) BinaryType else LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = if (asState) "uniq_merge_state" else "uniq_merge"

  override def createAggregationBuffer(): UniqSketchState = new UniqSketchState

  override def update(buf: UniqSketchState, input: InternalRow): UniqSketchState = {
    val v = child.eval(input)
    if (v != null) buf.merge(UniqSketchCodec.read(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: UniqSketchState, b: UniqSketchState): UniqSketchState = {
    a.merge(b); a
  }

  override def eval(buf: UniqSketchState): Any =
    if (asState) UniqSketchCodec.write(buf) else buf.estimate()

  override def serialize(buf: UniqSketchState): Array[Byte] =
    UniqSketchCodec.write(buf)

  override def deserialize(bytes: Array[Byte]): UniqSketchState =
    UniqSketchCodec.read(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): UniqSketchMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): UniqSketchMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): UniqSketchMerge =
    copy(child = newChildren.head)
}
