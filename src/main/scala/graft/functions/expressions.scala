package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType, StringType}
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
