package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Locale-aware collation key for ORDER BY ... COLLATE 'locale'
  * (reference: Interpreters/InterpreterSelectQuery.cpp:1032-1049 sorts
  * through Collator; Columns/ColumnString.h getCollator comparison).
  *
  * Spark-native restatement: instead of a custom comparator inside the
  * sort operator, emit a `java.text.CollationKey` byte array as the
  * sort column — BinaryType compares as unsigned memcmp, which is
  * exactly what CollationKey.toByteArray is designed for. The sort
  * itself stays Spark's ordinary (codegen'd, spillable, range-
  * partitioned) sort; only the key projection is collation-aware, so
  * the approach scales identically to any other ORDER BY.
  */
case class ChCollationKey(child: Expression, locale: String)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "ch_collation_key"

  override protected def nullSafeEval(input: Any): Any =
    CollationKernel.key(input.asInstanceOf[UTF8String].toString, locale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loc = ctx.addReferenceObj("locale", locale, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CollationKernel.key($c.toString(), $loc)")
  }

  override protected def withNewChildInternal(newChild: Expression): ChCollationKey =
    copy(child = newChild)
}

object CollationKernel {
  // Collator is not thread-safe: cache per (thread, locale)
  private val cache =
    new ThreadLocal[java.util.HashMap[String, java.text.Collator]] {
      override def initialValue() = new java.util.HashMap()
    }

  def key(s: String, locale: String): Array[Byte] = {
    var c = cache.get().get(locale)
    if (c == null) {
      c = java.text.Collator.getInstance(
        java.util.Locale.forLanguageTag(locale.replace('_', '-')))
      c.setStrength(java.text.Collator.TERTIARY)
      cache.get().put(locale, c)
    }
    c.getCollationKey(s).toByteArray
  }
}
