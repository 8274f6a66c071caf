package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Variadic cityHash64/farmHash64/metroHash64 over arbitrary argument
  * types (reference FunctionsHashing.h FunctionNeighbourhoodHash64):
  * each argument hashes to a UInt64 — integers/dates/datetimes via
  * `intHash64(v ^ salt)`, floats via their IEEE bit pattern, strings
  * via the family's string hash, arrays as `intHash64(len)` folded
  * with each element's hash — and successive hashes combine
  * left-to-right with CityHash's `Hash128to64` (identical in farmhash).
  * Tuples flatten into their fields; zero arguments yield the
  * reference's fixed constant. The single-string fast path stays on
  * the codegen'd [[KernelExpr]]; this expression covers the variadic /
  * non-string shapes (corpus 00253, 00259, 00386).
  */
case class ChMultiHash64(children: Seq[Expression], impl: String)
    extends Expression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = impl.toLowerCase + "64"

  private val strHash: Array[Byte] => Long = impl match {
    case "city" => HashFns.cityHash64
    case "farm" => FarmHash64.hash
    case "metro" => MetroHash64.hash
  }

  /** Hash128to64 (CityHash v1.0, Pike & Alakuijala, MIT; same formula
    * published in farmhash). */
  private def combine(lo: Long, hi: Long): Long = {
    val kMul = 0x9ddfea08eb382d69L
    var a = (lo ^ hi) * kMul
    a ^= (a >>> 47)
    var b = (hi ^ a) * kMul
    b ^= (b >>> 47)
    b * kMul
  }

  private def step(acc: java.lang.Long, h: Long): Long =
    if (acc == null) h else combine(acc, h)

  /** NULL elements inside arrays/structs hash as a fixed sentinel
    * (top-level NULL arguments still make the whole result NULL, see
    * eval): Spark's insert pipeline marks every array containsNull,
    * so a genuinely-null element must not NPE the kernel. */
  private val NullElemHash = 0x9ae16a3b2f90404fL

  /** First-position hash of one value (executeAny&lt;true&gt;). */
  private def leafHash(dt: DataType, v: Any): Long = if (v == null) NullElemHash else dt match {
    case ArrayType(et, _) =>
      val arr = v.asInstanceOf[ArrayData]
      var h = HashFns.intHash64(arr.numElements().toLong)
      var i = 0
      while (i < arr.numElements()) {
        h = combine(h, leafHash(et, arr.get(i, et)))
        i += 1
      }
      h
    case st: StructType =>
      val row = v.asInstanceOf[InternalRow]
      var acc: java.lang.Long = null
      st.fields.zipWithIndex.foreach { case (f, i) =>
        acc = step(acc, leafHash(f.dataType, row.get(i, f.dataType)))
      }
      // a zero-field tuple hashes like the empty argument list
      if (acc == null) 0xe28dbde7fe22e41cL else acc.longValue()
    case StringType => strHash(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => strHash(v.asInstanceOf[Array[Byte]])
    case ByteType => HashFns.intHash64(v.asInstanceOf[Byte].toLong)
    case ShortType => HashFns.intHash64(v.asInstanceOf[Short].toLong)
    case IntegerType => HashFns.intHash64(v.asInstanceOf[Int].toLong)
    case LongType => HashFns.intHash64(v.asInstanceOf[Long])
    case BooleanType => HashFns.intHash64(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case DateType => HashFns.intHash64(v.asInstanceOf[Int].toLong)
    case TimestampType => // CH DateTime numeric value = epoch seconds
      HashFns.intHash64(Math.floorDiv(v.asInstanceOf[Long], 1000000L))
    case FloatType => // zero-extended 32-bit pattern (toInteger<Float32>)
      HashFns.intHash64(
        java.lang.Float.floatToRawIntBits(v.asInstanceOf[Float]) & 0xffffffffL)
    case DoubleType =>
      HashFns.intHash64(
        java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double]))
    case _: DecimalType => // UInt64 maps to Decimal(20,0): raw 64 bits
      HashFns.intHash64(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.toBigInteger.longValue())
    case other => throw new IllegalArgumentException(
      s"$prettyName: unsupported argument type $other")
  }

  /** Accumulate one argument (executeForArgument): tuples flatten,
    * arrays fold length + elements into the running accumulator. */
  private def accumulate(acc0: java.lang.Long, dt: DataType, v: Any): java.lang.Long =
    if (v == null) step(acc0, NullElemHash) else dt match {
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        var acc = acc0
        st.fields.zipWithIndex.foreach { case (f, i) =>
          acc = accumulate(acc, f.dataType, row.get(i, f.dataType))
        }
        acc
      case ArrayType(et, _) =>
        val arr = v.asInstanceOf[ArrayData]
        var acc = step(acc0, HashFns.intHash64(arr.numElements().toLong))
        var i = 0
        while (i < arr.numElements()) {
          acc = combine(acc, leafHash(et, arr.get(i, et)))
          i += 1
        }
        acc
      case _ => step(acc0, leafHash(dt, v))
    }

  override def eval(input: InternalRow): Any = {
    var acc: java.lang.Long = null
    val it = children.iterator
    while (it.hasNext) {
      val c = it.next()
      val v = c.eval(input)
      if (v == null) return null
      acc = accumulate(acc, c.dataType, v)
    }
    // empty argument list: the reference's fixed constant
    if (acc == null) 0xe28dbde7fe22e41cL else acc.longValue()
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChMultiHash64 =
    copy(children = newChildren)
}
