package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse `arr[i]` semantics (FunctionsArray.h arrayElement):
  * 1-based, negative indexes count from the end, and index 0 or
  * out-of-range yields the element type's DEFAULT VALUE (0, '',
  * empty array) rather than NULL or an error — this version has no
  * NULLs. Spark's own `arr[i]` is 0-based and `element_at` throws
  * under ANSI for index 0, so this is a genuine custom Expression
  * (CodegenFallback: only used by the dialect layer, not hot paths).
  */
case class ChArrayElement(left: Expression, right: Expression,
    nullableDefault: Boolean = false)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  // nullable also when the element type has no constructible default
  // (an out-of-range index then yields NULL instead of a default)
  override def nullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      defaultFor(dataType).isEmpty

  override def prettyName: String = "charrayelement"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: ArrayType, ByteType | ShortType | IntegerType | LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"charrayelement expects (array, integral), got ($l, $r)")
    }

  private lazy val elemType = dataType

  /** Recursive default value — a struct default is the struct of its
    * fields' defaults (the reference returns a default-valued tuple,
    * FunctionsArray.h arrayElement); None when the type has no
    * constructible default (then [[nullable]] reports true and the
    * out-of-range result is NULL). */
  private def defaultFor(dt: DataType): Option[Any] = dt match {
    case ByteType => Some(0.toByte)
    case ShortType => Some(0.toShort)
    case IntegerType => Some(0)
    case LongType => Some(0L)
    case FloatType => Some(0f)
    case DoubleType => Some(0d)
    case _: DecimalType => Some(org.apache.spark.sql.types.Decimal(0))
    case StringType => Some(UTF8String.EMPTY_UTF8)
    case ArrayType(_, _) => Some(ArrayData.toArrayData(Array.empty[Any]))
    case BooleanType => Some(false)
    case DateType => Some(0)            // 1970-01-01 (internal: days)
    case _: TimestampType => Some(0L)   // epoch (internal: µs)
    case st: StructType =>
      // Nullable tuple fields default to NULL inside the default tuple
      val fs = st.fields.map(f =>
        if (f.nullable) Some(null) else defaultFor(f.dataType))
      if (fs.forall(_.isDefined))
        Some(org.apache.spark.sql.catalyst.InternalRow.fromSeq(
          fs.map(_.get).toIndexedSeq))
      else None
    case MapType(_, _, _) =>
      Some(new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        ArrayData.toArrayData(Array.empty[Any]),
        ArrayData.toArrayData(Array.empty[Any])))
    case _ => None
  }

  // With nullableDefault (emptyArrayToSingle over Nullable elements),
  // the pad is NULL; plain arr[i] keeps the type default — Spark's
  // containsNull flag can't carry CH nullability because the insert
  // pipeline deep-nulls every container (corpus 00036 vs 00452)
  private lazy val defaultValue: Any =
    if (nullableDefault && left.dataType.asInstanceOf[ArrayType].containsNull) null
    else defaultFor(elemType).orNull

  override def nullSafeEval(arrAny: Any, idxAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val i = idxAny match {
      case l: Long => l
      case x: Int => x.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
    }
    val n = arr.numElements()
    val pos =
      if (i > 0 && i <= n) i - 1
      else if (i < 0 && -i <= n) n + i
      else return defaultValue
    arr.get(pos.toInt, elemType)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChArrayElement =
    copy(left = newLeft, right = newRight)
}
