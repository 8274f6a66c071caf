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
case class ChArrayElement(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull

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

  private def defaultValue: Any = elemType match {
    case ByteType => 0.toByte
    case ShortType => 0.toShort
    case IntegerType => 0
    case LongType => 0L
    case FloatType => 0f
    case DoubleType => 0d
    case _: DecimalType => org.apache.spark.sql.types.Decimal(0)
    case StringType => UTF8String.EMPTY_UTF8
    case ArrayType(_, _) => ArrayData.toArrayData(Array.empty[Any])
    case BooleanType => false
    case DateType => 0            // 1970-01-01 (internal: days)
    case _: TimestampType => 0L   // epoch (internal: µs)
    case _ => null
  }

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
