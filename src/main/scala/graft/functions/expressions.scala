package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes, Length, OctetLength, RuntimeReplaceable, Size, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, DataType, DateType, DoubleType, FloatType, IntegerType, LongType, MapType, ShortType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for sipHash64 (reference:
  * dbms/src/Functions/FunctionsHashing.h sipHash64) — a codegen'd
  * scalar: `doGenCode` emits a static call, so the hash runs inside
  * whole-stage codegen with no boxing or UDF serialization boundary.
  * Strings implicitly cast to binary (hashing the UTF-8 bytes, which
  * matches the reference hashing the raw string bytes).
  */
case class SipHash64Expr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "siphash64"

  override protected def nullSafeEval(input: Any): Any =
    SipHash64.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SipHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SipHash64Expr =
    copy(child = newChild)
}

object SipHash64Expr {
  val ident: FunctionIdentifier = FunctionIdentifier("siphash64")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SipHash64Expr].getName, "siphash64")
  val builder: Seq[Expression] => Expression = {
    case Seq(e) => SipHash64Expr(e)
    case other => throw new IllegalArgumentException(
      s"siphash64 expects 1 argument, got ${other.size}")
  }
}

/** Distinct char n-gram count of a string in one codegen'd pass
  * (TextKernels.ngramDistinctCount) — the scalable form of the
  * explode-per-position + countDistinct plan: no generator rows, no
  * shuffle; 100 TB of documents stays a narrow projection.
  */
case class NGramDistinctCountExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "ngram_distinct_count"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.ngramDistinctCount(input.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.ngramDistinctCount($c.toString(), $n)")
  override protected def withNewChildInternal(newChild: Expression): NGramDistinctCountExpr =
    copy(child = newChild)
}

/** Exact n-gram Jaccard similarity of two strings
  * (TextKernels.ngramJaccard) — one call per candidate pair; pairs
  * come from an LSH bucket join, never all-pairs. */
case class NGramJaccardExpr(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ngram_jaccard"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.ngramJaccard(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.ngramJaccard($a.toString(), $b.toString(), $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NGramJaccardExpr =
    copy(left = l, right = r)
}

/** Asymmetric n-gram containment |A∩B|/|A|
  * (TextKernels.ngramContainment) — quote/subset detection on
  * candidate pairs; one codegen'd call per pair. */
case class NGramContainmentExpr(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ngram_containment"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.ngramContainment(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.ngramContainment($a.toString(), $b.toString(), $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NGramContainmentExpr =
    copy(left = l, right = r)
}

/** k-permutation MinHash signature over char n-gram shingles
  * (TextKernels.minHashSig): signature computed per document in one
  * pass — replaces the explode + 16-min-aggregate plan (no shuffle). */
case class MinHashSigExpr(child: Expression, k: Int, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minHashSigArray(input.asInstanceOf[UTF8String].toString, k, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.minHashSigArray($c.toString(), $k, $n)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** 64-bit SimHash fingerprint over whitespace tokens
  * (TextKernels.simHash64) — replaces the token-explode + 64
  * conditional-sum-aggregate plan. */
case class SimHashExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simHash64(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.simHash64($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** The 8 deterministic-hyperplane projections of a 64-d float
  * embedding (the q96 LSH signature): proj_i = Σ_j s(i,j)·x_j with
  * s(i,j) = ±1 from bit 16 of an integer LCG of (plane, 1-based dim).
  * A single codegen'd static call replacing an 8×64 interpreted
  * higher-order-lambda plan; additions run in ascending-j order, so
  * results are bit-identical to the declarative spelling (and to the
  * DuckDB oracle's grouped sum over the same sign matrix). */
object HyperplaneProj {
  private val signs: Array[Double] = {
    val a = new Array[Double](8 * 64)
    var i = 0
    while (i < 8) {
      var j = 1
      while (j <= 64) {
        val h = ((i * 73 + j * 179).toLong * 2654435761L) % 4294967296L
        a(i * 64 + j - 1) = if (((h >> 16) & 1L) == 1L) 1.0 else -1.0
        j += 1
      }
      i += 1
    }
    a
  }

  def proj(emb: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = math.min(emb.numElements(), 64)
    val out = new Array[Double](8)
    var i = 0
    while (i < 8) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += signs(i * 64 + j) * emb.getFloat(j).toDouble
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Cosine similarity of two float-array embeddings in one codegen'd
  * static call — the hot kernel of the brute-force/ANN scans (q50/
  * q53/q54/q95/q96), replacing three interpreted aggregate-lambda
  * passes. Each accumulator (dot, |a|², |b|²) adds in ascending index
  * order, so the doubles are bit-identical to the declarative
  * `aggregate(zip_with(...))` spelling and to DuckDB's list sums. */
object CosineSim {
  /** Σ xᵢ², ascending index — the vec_norm2 kernel (q51). */
  def norm2(a: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      acc += x * x; i += 1
    }
    acc
  }

  def cosine(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Σ (xᵢ−yᵢ)², ascending index — the PQ subspace distance
    * (operators/PqAnn.scala); sequential order matches the SQL
    * `sum((x−y)·(x−y))` over a lockstep unnest. */
  def l2sq(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }
}

case class VecNorm2Expr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm2"
  override protected def nullSafeEval(a: Any): Any =
    CosineSim.norm2(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.CosineSim.norm2($a)")
  override protected def withNewChildInternal(newChild: Expression): VecNorm2Expr =
    copy(child = newChild)
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSim.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance of two float vectors (CosineSim.l2sq) — the
  * per-subspace distance of product quantization; codegen'd, so the
  * m·ks encode calls per row stay inside whole-stage codegen. */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2sq"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.l2sq(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSim.l2sq($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqExpr =
    copy(left = newLeft, right = newRight)
}

/** 64-bit perceptual difference-hash over a feature vector
  * (multimodal.Media.perceptualHash64) — codegen'd so the media
  * near-dup scan stays one narrow pass. */
case class PHash64Expr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "phash64"
  private def floats(a: Any): Array[Float] = {
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    arr.toFloatArray()
  }
  override protected def nullSafeEval(a: Any): Any =
    graft.multimodal.Media.perceptualHash64(floats(a))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.multimodal.Media.perceptualHash64($a.toFloatArray())")
  override protected def withNewChildInternal(newChild: Expression): PHash64Expr =
    copy(child = newChild)
}

case class HyperplaneProjExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hyperplane_proj"
  override protected def nullSafeEval(input: Any): Any =
    HyperplaneProj.proj(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperplaneProj.proj($c)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneProjExpr =
    copy(child = newChild)
}

/** Polynomial rolling hash over the raw bytes
  * (TextKernels.rollingFingerprint) — order-sensitive content digest. */
case class RollingFingerprintExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.rollingFingerprint(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.rollingFingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): RollingFingerprintExpr =
    copy(child = newChild)
}

/** One-argument kernel-backed codegen'd expressions, keyed by kernel
  * name — the hash family (reference FunctionsHashing.h: cityHash64,
  * intHash32/64, halfMD5, URLHash) and the coding family
  * (FunctionsCoding.h: unhex, bitmaskToArray/List, IPv6/UUID
  * Num↔String, IPv4ToIPv6, toStringCutToZero). One class keyed by
  * name keeps 15 scalar kernels at ~1 line of registration each.
  */
case class KernelExpr(child: Expression, kernel: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  private val spec = KernelExpr.kernels(kernel)
  override def inputTypes = Seq(spec.in)
  override def dataType: DataType = spec.out
  override def prettyName: String = kernel
  override protected def nullSafeEval(input: Any): Any = spec.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, spec.gen)
  override protected def withNewChildInternal(newChild: Expression): KernelExpr =
    copy(child = newChild)
}

object KernelExpr {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  final case class Spec(in: DataType, out: DataType,
      gen: String => String, eval: Any => Any)

  private def bytes(a: Any): Array[Byte] = a.asInstanceOf[Array[Byte]]
  private def str(a: Any): String = a.asInstanceOf[UTF8String].toString
  private def u8(s: String): UTF8String = UTF8String.fromString(s)
  private val U8 = "org.apache.spark.unsafe.types.UTF8String.fromString"

  /** ArrayData bridge for codegen'd calls. */
  def longsArray(xs: Array[Long]): ArrayData = new GenericArrayData(xs)

  val kernels: Map[String, Spec] = Map(
    "cityhash64" -> Spec(BinaryType, LongType,
      c => s"graft.functions.HashFns.cityHash64($c)",
      a => HashFns.cityHash64(bytes(a))),
    "inthash64" -> Spec(LongType, LongType,
      c => s"graft.functions.HashFns.intHash64($c)",
      a => HashFns.intHash64(a.asInstanceOf[Long])),
    "inthash32" -> Spec(LongType, LongType,
      c => s"graft.functions.HashFns.intHash32($c)",
      a => HashFns.intHash32(a.asInstanceOf[Long])),
    "farmhash64" -> Spec(BinaryType, LongType,
      c => s"graft.functions.FarmHash64.hash($c)",
      a => FarmHash64.hash(bytes(a))),
    "metrohash64" -> Spec(BinaryType, LongType,
      c => s"graft.functions.MetroHash64.hash($c)",
      a => MetroHash64.hash(bytes(a))),
    "siphash128" -> Spec(BinaryType, BinaryType,
      c => s"graft.functions.SipHash64.hash128($c)",
      a => SipHash64.hash128(bytes(a))),
    "halfmd5" -> Spec(BinaryType, LongType,
      c => s"graft.functions.HashFns.halfMD5($c)",
      a => HashFns.halfMD5(bytes(a))),
    "urlhash" -> Spec(BinaryType, LongType,
      c => s"graft.functions.HashFns.urlHash($c)",
      a => HashFns.urlHash(bytes(a))),
    "unhex_ch" -> Spec(StringType, BinaryType,
      c => s"graft.functions.CodingFns.unhex($c.toString())",
      a => CodingFns.unhex(str(a))),
    "bitmask_to_array" -> Spec(LongType, ArrayType(LongType, containsNull = false),
      c => s"graft.functions.KernelExpr.longsArray(graft.functions.CodingFns.bitmaskToArray($c))",
      a => longsArray(CodingFns.bitmaskToArray(a.asInstanceOf[Long]))),
    "bitmask_to_list" -> Spec(LongType, StringType,
      c => s"$U8(graft.functions.CodingFns.bitmaskToList($c))",
      a => u8(CodingFns.bitmaskToList(a.asInstanceOf[Long]))),
    "ipv6_num_to_string" -> Spec(BinaryType, StringType,
      c => s"$U8(graft.functions.CodingFns.ipv6NumToString($c))",
      a => u8(CodingFns.ipv6NumToString(bytes(a)))),
    "ipv6_string_to_num" -> Spec(StringType, BinaryType,
      c => s"graft.functions.CodingFns.ipv6StringToNum($c.toString())",
      a => CodingFns.ipv6StringToNum(str(a))),
    "ipv4_to_ipv6" -> Spec(LongType, BinaryType,
      c => s"graft.functions.CodingFns.ipv4ToIpv6($c)",
      a => CodingFns.ipv4ToIpv6(a.asInstanceOf[Long])),
    "uuid_num_to_string" -> Spec(BinaryType, StringType,
      c => s"$U8(graft.functions.CodingFns.uuidNumToString($c))",
      a => u8(CodingFns.uuidNumToString(bytes(a)))),
    "uuid_string_to_num" -> Spec(StringType, BinaryType,
      c => s"graft.functions.CodingFns.uuidStringToNum($c.toString())",
      a => CodingFns.uuidStringToNum(str(a))),
    "to_string_cut_to_zero" -> Spec(BinaryType, StringType,
      c => s"$U8(graft.functions.CodingFns.toStringCutToZero($c))",
      a => u8(CodingFns.toStringCutToZero(bytes(a)))),
    "normalize_for_dedup" -> Spec(StringType, StringType,
      c => s"$U8(graft.functions.TextKernels.normalizeForDedup($c.toString()))",
      a => u8(TextKernels.normalizeForDedup(str(a)))),
    // reinterpretAs* family (FunctionsReinterpret.h): memcpy
    // little-endian reads; UInt64 shares Long's 64 bits (values with
    // the top bit set render negative — documented UInt64 caveat)
    "reinterpret_as_uint8" -> Spec(BinaryType, LongType,
      c => s"graft.functions.CodingFns.reinterpretUnsigned($c, 1)",
      a => CodingFns.reinterpretUnsigned(bytes(a), 1)),
    "reinterpret_as_uint16" -> Spec(BinaryType, LongType,
      c => s"graft.functions.CodingFns.reinterpretUnsigned($c, 2)",
      a => CodingFns.reinterpretUnsigned(bytes(a), 2)),
    "reinterpret_as_uint32" -> Spec(BinaryType, LongType,
      c => s"graft.functions.CodingFns.reinterpretUnsigned($c, 4)",
      a => CodingFns.reinterpretUnsigned(bytes(a), 4)),
    "reinterpret_as_uint64" -> Spec(BinaryType, LongType,
      c => s"graft.functions.CodingFns.reinterpretUnsigned($c, 8)",
      a => CodingFns.reinterpretUnsigned(bytes(a), 8)),
    "reinterpret_as_int8" -> Spec(BinaryType, LongType,
      c => s"graft.functions.CodingFns.reinterpretSigned($c, 1)",
      a => CodingFns.reinterpretSigned(bytes(a), 1)),
    "reinterpret_as_int16" -> Spec(BinaryType, LongType,
      c => s"graft.functions.CodingFns.reinterpretSigned($c, 2)",
      a => CodingFns.reinterpretSigned(bytes(a), 2)),
    "reinterpret_as_int32" -> Spec(BinaryType, LongType,
      c => s"graft.functions.CodingFns.reinterpretSigned($c, 4)",
      a => CodingFns.reinterpretSigned(bytes(a), 4)),
    "reinterpret_as_int64" -> Spec(BinaryType, LongType,
      c => s"graft.functions.CodingFns.reinterpretSigned($c, 8)",
      a => CodingFns.reinterpretSigned(bytes(a), 8)),
    "reinterpret_as_float32" -> Spec(BinaryType, FloatType,
      c => s"graft.functions.CodingFns.reinterpretFloat32($c)",
      a => CodingFns.reinterpretFloat32(bytes(a))),
    "reinterpret_as_float64" -> Spec(BinaryType, DoubleType,
      c => s"graft.functions.CodingFns.reinterpretFloat64($c)",
      a => CodingFns.reinterpretFloat64(bytes(a))),
    "reinterpret_as_date" -> Spec(BinaryType, DateType,
      c => s"(int) graft.functions.CodingFns.reinterpretUnsigned($c, 2)",
      a => CodingFns.reinterpretUnsigned(bytes(a), 2).toInt),
    "reinterpret_as_datetime" -> Spec(BinaryType, TimestampType,
      c => s"graft.functions.CodingFns.reinterpretUnsigned($c, 4) * 1000000L",
      a => CodingFns.reinterpretUnsigned(bytes(a), 4) * 1000000L),
    "reinterpret_as_string" -> Spec(LongType, StringType,
      c => s"org.apache.spark.unsafe.types.UTF8String.fromBytes(graft.functions.CodingFns.reinterpretAsStringBytes($c))",
      a => UTF8String.fromBytes(CodingFns.reinterpretAsStringBytes(a.asInstanceOf[Long]))),
    "decode_url_component" -> Spec(StringType, StringType,
      c => s"$U8(graft.functions.CodingFns.decodeUrlComponent($c.toString()))",
      a => u8(CodingFns.decodeUrlComponent(str(a)))),
    "first_significant_subdomain" -> Spec(StringType, StringType,
      c => s"$U8(graft.functions.CodingFns.firstSignificantSubdomain($c.toString()))",
      a => u8(CodingFns.firstSignificantSubdomain(str(a)))),
    "url_hierarchy" -> Spec(StringType, ArrayType(StringType, containsNull = false),
      c => s"graft.functions.KernelExpr.stringsArray(graft.functions.CodingFns.urlHierarchy($c.toString()))",
      a => stringsArray(CodingFns.urlHierarchy(str(a)))),
    "extract_url_parameter_names" -> Spec(StringType, ArrayType(StringType, containsNull = false),
      c => s"graft.functions.KernelExpr.stringsArray(graft.functions.CodingFns.extractUrlParameterNames($c.toString()))",
      a => stringsArray(CodingFns.extractUrlParameterNames(str(a)))),
    "url_path_hierarchy" -> Spec(StringType, ArrayType(StringType, containsNull = false),
      c => s"graft.functions.KernelExpr.stringsArray(graft.functions.CodingFns.urlPathHierarchy($c.toString()))",
      a => stringsArray(CodingFns.urlPathHierarchy(str(a)))))

  /** ArrayData bridge for codegen'd string-array kernels. */
  def stringsArray(xs: Array[String]): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      xs.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])

  def builder(kernel: String): Seq[Expression] => Expression = {
    case Seq(e) => KernelExpr(e, kernel)
    case other => throw new IllegalArgumentException(
      s"$kernel expects 1 argument, got ${other.size}")
  }
}

/** CH conditions are UInt8: any non-zero number is true. Wraps a
  * condition so numeric children become `!= 0` while boolean children
  * pass through — the dialect's if()/and()/or() tolerance. */
case class UInt8ToBool(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "uint8tobool"
  private def isBool = child.dataType == org.apache.spark.sql.types.BooleanType
  override protected def nullSafeEval(input: Any): Any = input match {
    case b: Boolean => b
    case b: Byte => b != 0
    case s: Short => s != 0
    case i: Int => i != 0
    case l: Long => l != 0L
    case f: Float => f != 0f
    case d: Double => d != 0d
    case other => other != null
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isBool) defineCodeGen(ctx, ev, c => c)
    else defineCodeGen(ctx, ev, c => s"($c != 0)")
  override protected def withNewChildInternal(newChild: Expression): UInt8ToBool =
    copy(child = newChild)
}

/** CH treats UInt8 comparison results as summable numbers
  * (`sum(x = y)`); Spark's booleans are not. This wrapper turns a
  * boolean child into 0/1 Int and passes every other type through
  * unchanged — the dialect wraps aggregate arguments with it. */
case class BoolToUInt8(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    if (child.dataType == org.apache.spark.sql.types.BooleanType) IntegerType
    else child.dataType
  override def prettyName: String = "booltouint8"
  override protected def nullSafeEval(input: Any): Any = input match {
    case b: Boolean => if (b) 1 else 0
    case other => other
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (child.dataType == org.apache.spark.sql.types.BooleanType)
      defineCodeGen(ctx, ev, c => s"($c ? 1 : 0)")
    else defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): BoolToUInt8 =
    copy(child = newChild)
}

/** The reference's text rendering of an INTERNAL value — tuples as
  * `(1,2)`, arrays as `[1,2,3]`, strings quoted inside containers,
  * whole doubles without the `.0`, dates/timestamps in their text
  * forms. Shared by visibleWidth and the CH toString. */
object ChRender {
  import org.apache.spark.sql.types._
  def render(v: Any, dt: DataType, inContainer: Boolean): String = (v, dt) match {
    case (null, _) => "\\N"
    case (s: UTF8String, _) =>
      if (inContainer) "'" + s.toString + "'" else s.toString
    case (b: Boolean, _) => if (b) "1" else "0"
    case (days: Int, DateType) =>
      val d = java.time.LocalDate.ofEpochDay(days.toLong).toString
      if (inContainer) s"'$d'" else d
    case (micros: Long, _: TimestampType) =>
      val t = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), 0, java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      if (inContainer) s"'$t'" else t
    case (a: org.apache.spark.sql.catalyst.util.ArrayData, ArrayType(et, _)) =>
      (0 until a.numElements()).map(i => render(a.get(i, et), et, inContainer = true))
        .mkString("[", ",", "]")
    case (r: org.apache.spark.sql.catalyst.InternalRow, st: StructType) =>
      st.fields.zipWithIndex.map { case (f, i) =>
        render(r.get(i, f.dataType), f.dataType, inContainer = true)
      }.mkString("(", ",", ")")
    case (d: Double, _) => graft.sources.Formats.renderDouble(d)
    case (f: Float, _) if f.isWhole && math.abs(f) < 1e7 => f.toLong.toString
    case (d: org.apache.spark.sql.types.Decimal, _) =>
      val s = d.toJavaBigDecimal.stripTrailingZeros
      if (s.scale <= 0) s.toBigInteger.toString else s.toPlainString
    case (x, _) => x.toString
  }
}

/** CH `visibleWidth(x)`: the character width of the value rendered in
  * the reference's text format (FunctionsMiscellaneous.cpp
  * visibleWidth). CodegenFallback: a formatting helper for
  * presentation, never a hot path. */
case class VisibleWidthExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "visiblewidth"
  override protected def nullSafeEval(input: Any): Any =
    ChRender.render(input, child.dataType, inContainer = false).length.toLong
  override protected def withNewChildInternal(newChild: Expression): VisibleWidthExpr =
    copy(child = newChild)
}

/** CH `toString(x)`: the reference's text rendering — notably whole
  * Float64 values print without the trailing `.0` (toString(
  * round(exp10(1))) = '10'), which a plain string cast gets wrong. */
case class ChToStringExpr(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "tostring"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(ChRender.render(input, child.dataType, inContainer = false))
  override protected def withNewChildInternal(newChild: Expression): ChToStringExpr =
    copy(child = newChild)
}

/** CH `hex(x)` — type-dispatching: numbers render big-endian with
  * leading zero BYTES trimmed (hex(257)='0101'); strings/binary render
  * per-byte (FunctionsCoding.h:32-34,1266). */
case class ChHexExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hex expects an integer or string argument, got $other")
    }
  override def prettyName: String = "hex"
  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => UTF8String.fromString(
      CodingFns.hexBytes(input.asInstanceOf[UTF8String].getBytes))
    case BinaryType => UTF8String.fromString(
      CodingFns.hexBytes(input.asInstanceOf[Array[Byte]]))
    case _ => UTF8String.fromString(CodingFns.hexNum(input match {
      case b: Byte => b.toLong
      case s: Short => s.toLong
      case i: Int => i.toLong
      case l: Long => l
    }))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val u8 = "org.apache.spark.unsafe.types.UTF8String.fromString"
    child.dataType match {
      case StringType => defineCodeGen(ctx, ev,
        c => s"$u8(graft.functions.CodingFns.hexBytes($c.getBytes()))")
      case BinaryType => defineCodeGen(ctx, ev,
        c => s"$u8(graft.functions.CodingFns.hexBytes($c))")
      case _ => defineCodeGen(ctx, ev,
        c => s"$u8(graft.functions.CodingFns.hexNum((long)$c))")
    }
  }
  override protected def withNewChildInternal(newChild: Expression): ChHexExpr =
    copy(child = newChild)
}

/** Position-weighted code-point fingerprint Σ cp_i·i
  * (TextKernels.charWeightedFingerprint) — the oracle-verifiable
  * digest behind q49, one pass instead of a per-character explode. */
case class CharWeightedFingerprintExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "char_weighted_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.charWeightedFingerprint(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.charWeightedFingerprint($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): CharWeightedFingerprintExpr =
    copy(child = newChild)
}

/** Per-document repetition statistics (TextKernels.repetitionStats) —
  * the Gopher repetition quality signals as ONE codegen'd call per
  * row returning 7 exact-integer metrics; replaces a token-explode +
  * three n-gram-explode aggregations (4 shuffles) with a narrow
  * projection. */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.repetitionStatsArray(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.repetitionStatsArray($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

/** Distinct word n-gram shingle hashes of a document
  * (TextKernels.tokenNgramHashes) — the per-row unit of the
  * decontamination check (q104): corpus side stays a narrow
  * projection; only Bloom-prefilter survivors ever explode. */
case class TokenNgramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, "token_ngram_hashes: n must be >= 1")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_ngram_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.tokenNgramHashesArray(input.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.tokenNgramHashesArray($c.toString(), $n)")
  override protected def withNewChildInternal(newChild: Expression): TokenNgramHashesExpr =
    copy(child = newChild)
}

/** `bloom_contains_any(array<long>, bloomBytes)` — true iff ANY
  * element might be in the serialized
  * [[org.apache.spark.util.sketch.BloomFilter]]. The filter is built
  * once from the (small, by definition) benchmark shingle set and
  * rides into codegen as a referenced object — each executor
  * deserializes it once, then the probe is a tight in-loop
  * mightContainLong. This is the scale shape for decontaminating a
  * 100 TB corpus: a narrow boolean filter, no join, no explode; the
  * exact verification join downstream only touches the (tiny)
  * candidate set, so Bloom false positives never reach the output. */
case class BloomContainsAnyExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with ImplicitCastInputTypes {
  @transient private lazy val bloom =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))
  override def inputTypes = Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_contains_any"
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      if (bloom.mightContainLong(arr.getLong(i))) return true
      i += 1
    }
    false
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      s"""
         |${ev.value} = false;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if ($bloomRef.mightContainLong($arr.getLong($i))) {
         |    ${ev.value} = true;
         |    break;
         |  }
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): BloomContainsAnyExpr =
    copy(child = newChild)
}

/** Executor-side cache of deserialized Bloom filters keyed by
  * broadcast id — [[BloomContainsAnyBcExpr]] instances (one per task)
  * share one decode of the broadcast bytes per executor.
  *
  * Bounded LRU: a long-running incremental-dedup stream creates a
  * fresh MB-class broadcast per micro-batch, and an unbounded map
  * would pin every decoded filter for the life of the executor even
  * after ContextCleaner reclaims the broadcasts. Only the most recent
  * few filters are ever live at once, so a small LRU loses nothing. */
object BloomBcCache {
  // sized above any realistic number of simultaneously-live filters in
  // one query (a 4-entry bound thrashed when a plan used >4 blooms:
  // every probe re-decoded an MB-class filter under the cache lock)
  private final val MaxEntries = 64
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[
        java.lang.Long, org.apache.spark.util.sketch.BloomFilter](
        16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[java.lang.Long,
            org.apache.spark.util.sketch.BloomFilter]): Boolean =
        size() > MaxEntries
    })
  def get(bc: org.apache.spark.broadcast.Broadcast[Array[Byte]])
      : org.apache.spark.util.sketch.BloomFilter = {
    val hit = cache.get(bc.id) // synchronizedMap: atomic, no decode held
    if (hit != null) return hit
    // decode OUTSIDE the lock — an MB-class readFrom under the global
    // cache lock would serialize every task on a cold executor; a
    // racing duplicate decode is rare and only wastes one allocation
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bc.value))
    val prev = cache.putIfAbsent(bc.id, bf)
    if (prev != null) prev else bf
  }
  /** Visible for tests. */
  private[graft] def size: Int = cache.synchronized(cache.size())
}

/** [[BloomContainsAnyExpr]] with the filter bytes shipped as a Spark
  * BROADCAST instead of a plan literal: an MB-class benchmark filter
  * embedded in the plan bloats every plan copy, task binary, and
  * explain string, and defeats codegen caching — the broadcast moves
  * once per executor over the torrent protocol and the plan carries
  * only the handle. Probe loop and codegen shape are identical. */
case class BloomContainsAnyBcExpr(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends UnaryExpression with ImplicitCastInputTypes {
  @transient private lazy val bloom = BloomBcCache.get(bc)
  override def inputTypes = Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_contains_any_bc"
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      if (bloom.mightContainLong(arr.getLong(i))) return true
      i += 1
    }
    false
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val bloomVar = ctx.addMutableState(
      "org.apache.spark.util.sketch.BloomFilter", "bloomFromBc",
      v => s"$v = graft.functions.BloomBcCache.get(" +
        s"(org.apache.spark.broadcast.Broadcast) $bcRef);")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      s"""
         |${ev.value} = false;
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  if ($bloomVar.mightContainLong($arr.getLong($i))) {
         |    ${ev.value} = true;
         |    break;
         |  }
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): BloomContainsAnyBcExpr =
    copy(child = newChild)
}

/** BPE token count under a plan-literal merge table (Bpe.tokenCount)
  * — the scalable half of the tokenizer: one codegen'd call per
  * document; the merge ranks compile once per executor. */
case class BpeTokenCountExpr(child: Expression, spec: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"
  @transient private lazy val specRef = spec
  override protected def nullSafeEval(input: Any): Any =
    Bpe.tokenCount(input.asInstanceOf[UTF8String].toString, spec)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("bpeSpec", specRef, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.tokenCount($c.toString(), $s)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCountExpr =
    copy(child = newChild)
}

/** The document's BPE token sequence (Bpe.encode) as array<string> —
  * same kernel shape as [[BpeTokenCountExpr]]. */
case class BpeEncodeExpr(child: Expression, spec: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"
  @transient private lazy val specRef = spec
  override protected def nullSafeEval(input: Any): Any =
    Bpe.encodeArray(input.asInstanceOf[UTF8String].toString, spec)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("bpeSpec", specRef, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.encodeArray($c.toString(), $s)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

/** CH `length` works on String AND Array/Map (FunctionsString.h
  * length / FunctionsArray.h arrayLength share the name); Spark
  * splits them as length()/size(). Dispatch on the resolved child
  * type via RuntimeReplaceable, so codegen uses the underlying
  * builtin directly. */
case class ChLength(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => Size(child, legacySizeOfNull = false)
    // CH length(String) is BYTES (FunctionsString.cpp:66 LengthImpl:
    // offsets[i]-1-offsets[i-1], the char variant is lengthUTF8) —
    // and bytes is O(1) on UTF8String where Spark's Length walks the
    // string counting chars (8% of q29's profile).
    case _ => OctetLength(child)
  }
  override def prettyName: String = "length"
  override protected def withNewChildInternal(newChild: Expression): ChLength =
    copy(child = newChild)
}

/** CH reverse: BYTE-reverse for strings (FunctionsString.cpp:232
  * ReverseImpl; reverseUTF8 is the code-point variant), element
  * reverse for arrays. */
case class ChReverse(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case StringType =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        classOf[StringKernels.type], StringType, "byteReverse", Seq(child))
    case _ =>
      org.apache.spark.sql.catalyst.expressions.Reverse(child)
  }
  override def prettyName: String = "reverse"
  override protected def withNewChildInternal(newChild: Expression): ChReverse =
    copy(child = newChild)
}

/** CH arraySum (FunctionsArray.h arraySum): integral arrays fold
  * into Int64/UInt64, float arrays into Float64. Type dispatch via
  * RuntimeReplaceable onto a resolved ArrayAggregate (codegen'd). */
case class ChArraySum(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, LambdaFunction, NamedLambdaVariable}
    val ArrayType(et, containsNull) = child.dataType: @unchecked
    val accType: DataType = et match {
      case FloatType | DoubleType => DoubleType
      case _: org.apache.spark.sql.types.DecimalType => DoubleType
      case _ => LongType
    }
    val acc = NamedLambdaVariable("acc", accType, nullable = true)
    val x = NamedLambdaVariable("x", et, containsNull)
    val merge = LambdaFunction(Add(acc, Cast(x, accType)), Seq(acc, x))
    val acc2 = NamedLambdaVariable("acc", accType, nullable = true)
    val finish = LambdaFunction(acc2, Seq(acc2))
    ArrayAggregate(child,
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        if (accType == DoubleType) 0d else 0L, accType),
      merge, finish)
  }
  override def prettyName: String = "arraysum"
  override protected def withNewChildInternal(newChild: Expression): ChArraySum =
    copy(child = newChild)
}

/** CH toTypeName — the type of the argument under its reference
  * spelling. [[graft.plans.ChTypeNameResolution]] folds it to a
  * literal during ANALYSIS (while [[ChTypeTag]] markers are still in
  * the tree) via [[graft.types.ChTypeInfer]]; this replacement is the
  * fallback spelling if the rule never fired
  * (IFunction::getReturnType). */
case class ToTypeName(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression =
    org.apache.spark.sql.catalyst.expressions.Literal.create(
      graft.types.ChTypes.toChName(child.dataType, child.nullable), StringType)
  override def prettyName: String = "totypename"
  override protected def withNewChildInternal(newChild: Expression): ToTypeName =
    copy(child = newChild)
}

/** round(x, s>0) dispatching on the RESOLVED argument type: floats
  * take the reference's double pipeline (scale up, ties-to-even on
  * the product, scale down — FunctionsRound.h Float64 PositiveScale;
  * BigDecimal-exact BRound differs one ulp where the product lands on
  * a representable half, corpus 00232), everything else keeps
  * bankers' BRound. Lazy replacement — the argument may be unresolved
  * when the dialect builder runs. */
case class ChRoundPositive(child: Expression, scale: Int)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case DoubleType | FloatType =>
      // scale clamps to the type's digits10 (15 / 6) before the
      // power-of-10 lookup (ScaleForRightType PositiveScale)
      val digits = if (child.dataType == FloatType) 6 else 15
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        classOf[MathKernels.type], DoubleType, "roundToScale",
        Seq(org.apache.spark.sql.catalyst.expressions.Cast(child, DoubleType),
          org.apache.spark.sql.catalyst.expressions.Literal(
            math.pow(10, math.min(scale, digits)))),
        Seq(DoubleType, DoubleType), returnNullable = false)
    case _ => org.apache.spark.sql.catalyst.expressions.BRound(child,
      org.apache.spark.sql.catalyst.expressions.Literal(scale))
  }
  override def prettyName: String = "ch_round"
  override protected def withNewChildInternal(newChild: Expression): ChRoundPositive =
    copy(child = newChild)
}

/** Transparent CH-type annotation: carries the reference's type name
  * for an expression whose Spark storage type erases it (UInt32 lives
  * in LongType, DataTypesNumber.h). Semantically the identity — it
  * erases to its child in the optimizer's ReplaceExpressions pass, so
  * physical plans and codegen never see it; only analysis-time
  * consumers (ToTypeName inference) read `chName`. `chName` may be
  * `Nullable(...)`-wrapped (explicit CAST target); a bare name takes
  * its nullability from the child. */
case class ChTypeTag(child: Expression, chName: String)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child
  override def prettyName: String = "ch_type_tag"
  override protected def withNewChildInternal(newChild: Expression): ChTypeTag =
    copy(child = newChild)
}

/** `finalizeAggregation(stateColumn)` — converts an aggregate-state
  * column to its finalized value (FunctionsMiscellaneous
  * finalizeAggregation). In this model most states ARE their partial
  * value, so the default is the identity (RuntimeReplaceable erases
  * the marker). The exception is the uniq family, whose state is the
  * distinct set (collect_set) while the finalized value is its SIZE —
  * [[graft.plans.ChTypeNameResolution]] rewrites the marker once the
  * child's AggregateFunction(...) CH type is visible through alias
  * metadata (corpus 00334). */
case class FinalizeAggregation(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child
  override def prettyName: String = "finalize_aggregation"
  override protected def withNewChildInternal(newChild: Expression): FinalizeAggregation =
    copy(child = newChild)
}

/** Numeric → Float64 honoring a reference-UInt64 identity the Long
  * storage erases: [[graft.plans.ChTypeNameResolution]] rewrites this
  * to the unsigned reinterpretation once alias metadata is visible
  * (formatReadableSize over toUInt64 of a wrapped value, corpus
  * 00232); the default replacement is the plain signed cast. */
case class ChUnsignedToDouble(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(child, DoubleType)
  override def prettyName: String = "ch_unsigned_to_double"
  override protected def withNewChildInternal(newChild: Expression): ChUnsignedToDouble =
    copy(child = newChild)
}

/** SummingMergeTree nested-Map fold kernel
  * (SummingSortedBlockInputStream.cpp mergeMap): input is the
  * CONCATENATION of a merged group's map entries as
  * array<struct<members…>>; output groups entries by the key-member
  * tuple (indices `keyIdx`), sums the value members per key, drops
  * keys whose accumulated values are all zero (only possible after an
  * actual merge — a once-seen zero entry survives), and emits entries
  * sorted ascending by key tuple (the reference's std::map order). */
case class SumMapMergeExpr(child: Expression, keyIdx: Seq[Int])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types.StructType

  override def dataType: DataType = child.dataType
  override def prettyName: String = "sum_map_merge"

  private lazy val st =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val valIdx: Seq[Int] = st.fields.indices.filterNot(keyIdx.contains)

  private def cmpOne(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => Integer.compare(x, y)
    case (x: Short, y: Short) => java.lang.Short.compare(x, y)
    case (x: Byte, y: Byte) => java.lang.Byte.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Float, y: Float) => java.lang.Float.compare(x, y)
    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
    case (x, y) => x.toString.compareTo(y.toString)
  }

  private object KeyOrd extends Ordering[Seq[Any]] {
    def compare(a: Seq[Any], b: Seq[Any]): Int = {
      var i = 0
      while (i < a.length) {
        val c = cmpOne(a(i), b(i))
        if (c != 0) return c
        i += 1
      }
      0
    }
  }

  /** Float members accumulate in Double, everything else in Long —
    * the reference's FieldVisitorSum sums in the native column type,
    * so 64-bit integer values above 2^53 must not round-trip through
    * a double. */
  private lazy val valIsFloat: Array[Boolean] = valIdx.map { j =>
    st(j).dataType == DoubleType || st(j).dataType == FloatType
  }.toArray

  override protected def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val merged = scala.collection.mutable.TreeMap
      .empty[Seq[Any], (Array[Long], Array[Double], Int)](KeyOrd)
    var i = 0
    while (i < arr.numElements()) {
      val row = arr.getStruct(i, st.length)
      val key: Seq[Any] = keyIdx.map(j => row.get(j, st(j).dataType))
      val longs = new Array[Long](valIdx.length)
      val dbls = new Array[Double](valIdx.length)
      var k0 = 0
      while (k0 < valIdx.length) {
        row.get(valIdx(k0), st(valIdx(k0)).dataType) match {
          case null =>
          case l: Long => longs(k0) = l
          case x: Int => longs(k0) = x.toLong
          case s: Short => longs(k0) = s.toLong
          case b: Byte => longs(k0) = b.toLong
          case d: Double => dbls(k0) = d
          case f: Float => dbls(k0) = f.toDouble
          case o =>
            if (valIsFloat(k0)) dbls(k0) = o.toString.toDouble
            else longs(k0) = o.toString.toLong
        }
        k0 += 1
      }
      merged.get(key) match {
        case Some((accL, accD, n)) =>
          var k = 0
          while (k < accL.length) {
            accL(k) += longs(k); accD(k) += dbls(k); k += 1
          }
          merged.update(key, (accL, accD, n + 1))
        case None => merged.update(key, (longs, dbls, 1))
      }
      i += 1
    }
    val kept = merged.toSeq.filter { case (_, (ls, ds, n)) =>
      n == 1 || ls.exists(_ != 0L) || ds.exists(_ != 0.0)
    }
    new GenericArrayData(kept.map { case (key, (ls, ds, _)) =>
      val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(st.length)
      keyIdx.zipWithIndex.foreach { case (j, kk) => out.update(j, key(kk)) }
      valIdx.zipWithIndex.foreach { case (j, vv) =>
        val v: Any = st(j).dataType match {
          case LongType => ls(vv)
          case IntegerType => ls(vv).toInt
          case ShortType => ls(vv).toShort
          case ByteType => ls(vv).toByte
          case FloatType => ds(vv).toFloat
          case DoubleType => ds(vv)
          case _ => ls(vv)
        }
        out.update(j, v)
      }
      out
    }.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): SumMapMergeExpr =
    copy(child = newChild)
}

/** Runtime enum CAST (DataTypeEnum castColumn; corpus 00298): a
  * STRING operand validates against the name set and passes through as
  * the name; a NUMERIC operand decodes to its name. The result
  * carries Enum identity via alias metadata planted by
  * [[graft.plans.ChTypeNameResolution]] (display right-aligns and
  * type-names like the reference's Enum column). */
case class ChEnumCast(child: Expression, bits: Int, defBody: String)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  import org.apache.spark.sql.catalyst.expressions._
  lazy val enumDef: graft.types.ChEnum.Def =
    graft.types.ChEnum.parseDef(bits, defBody)
  override lazy val replacement: Expression = {
    // the enum VALUE is the numeric storage channel (cityHash64 over
    // an enum hashes the number — corpus 00324); the NAME only
    // appears at render time via the alias metadata
    val storage: DataType =
      if (bits == 8) ByteType
      else org.apache.spark.sql.types.ShortType
    if (child.dataType == StringType)
      // unknown names THROW (DataTypeEnum::getValue "Unknown element"),
      // they must not silently become NULL
      CaseWhen(enumDef.names.zip(enumDef.values).map { case (n, v) =>
        (EqualTo(child, Literal(n)): Expression,
          Cast(Literal(v), storage): Expression)
      }, Some(Cast(RaiseError(Concat(Seq(
        Literal("Unknown element '"), child,
        Literal(s"' for type Enum$bits")))), storage)))
    else Cast(child, storage)
  }
  override def prettyName: String = "ch_enum_cast"
  override protected def withNewChildInternal(newChild: Expression): ChEnumCast =
    copy(child = newChild)
}
