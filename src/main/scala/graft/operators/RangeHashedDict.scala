package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType}

/** The reference's `range_hashed` dictionary layout
  * (Dictionaries/RangeHashedDictionary.h, DictionaryFactory.cpp
  * range_hashed): per id, a list of [lower, upper] day ranges each
  * carrying an attribute value; `dictGetT('d', attr, id, date)`
  * returns the FIRST range containing the date in (lower, upper)
  * order — ranges are kept sorted by that pair
  * (setAttributeValueImpl's lower_bound insert) — and a bound of 0 /
  * out of the date LUT means "open on that side"
  * (RangeHashedDictionary.h Range::contains). A miss yields the
  * attribute's configured default.
  *
  * Spark shape: the dictionary source is collected ONCE on the
  * driver (dictionaries are config-loaded small tables in the
  * reference too) and rides the task closure as a shared immutable
  * map — a per-row first-containing-range scan (the reference's
  * lookup order, linear in the id's range count) instead of a join,
  * so the fact scan never shuffles. At 1000 executors the map moves
  * once per executor. */
final class RangeHashedDict private (
    private val entries: Map[Long, Array[RangeHashedDict.Entry]])
    extends Serializable {

  /** First containing range's value, or null. `day` is days since
    * epoch (Spark DateType's physical value). */
  def lookup(id: Long, day: Int): java.lang.Long = {
    val vs = entries.getOrElse(id, null)
    if (vs == null) return null
    var i = 0
    while (i < vs.length) {
      val e = vs(i)
      if (e.lower <= day && day <= e.upper) return java.lang.Long.valueOf(e.value)
      i += 1
    }
    null
  }

  def size: Int = entries.valuesIterator.map(_.length).sum
}

object RangeHashedDict {
  /** One range row: open bounds arrive as null and store as
    * Int.MinValue / Int.MaxValue (the reference's "0 or beyond the
    * date LUT" convention, normalized at build). */
  final case class Entry(lower: Int, upper: Int, value: Long)

  /** Collect a (id, lower, upper, value) source into the layout.
    * Null lower/upper = open bound. Ranges per id sort by
    * (lower, upper) — reference insertion order. */
  def build(src: DataFrame, idCol: String, lowerCol: String,
      upperCol: String, valueCol: String): RangeHashedDict = {
    val rows = DictGuard.collectBounded("range_hashed", src.select(
      col(idCol).cast("long"),
      col(lowerCol).cast("date"), col(upperCol).cast("date"),
      col(valueCol).cast("long")))
    val grouped = rows.groupBy(_.getLong(0)).map { case (id, rs) =>
      id -> rs.map { r =>
        val lo = if (r.isNullAt(1)) Int.MinValue else r.getDate(1).toLocalDate.toEpochDay.toInt
        val hi = if (r.isNullAt(2)) Int.MaxValue else r.getDate(2).toLocalDate.toEpochDay.toInt
        Entry(lo, hi, r.getLong(3))
      }.sortBy(e => (e.lower, e.upper))
    }
    new RangeHashedDict(grouped)
  }

  /** `dictGetInt64('d', attr, id, date)` as a Column; misses yield
    * `default` (the attribute's null_value in the reference config). */
  def dictGet(dict: RangeHashedDict, id: Column, date: Column,
      default: Long): Column =
    org.apache.spark.sql.functions.coalesce(
      Bridge.column(RangeDictGetExpr(
        Bridge.expression(id), Bridge.expression(date), dict)),
      org.apache.spark.sql.functions.lit(default))

  // ---- named-dictionary registry: the SQL surface ------------------
  // The reference configures dictionaries by name in XML and queries
  // them as dictGetT('name', 'attr', id, date)
  // (FunctionsExternalDictionaries.h dispatching on layout); here
  // registration is programmatic and the SQL call resolves through
  // GraftFunctions' `dictGetInt64`/`dictGetUInt64` builders.
  private final case class Registered(dict: RangeHashedDict, default: Long)
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Registered]()

  /** Register `name.attr` with its configured null_value default. */
  def register(name: String, attr: String, dict: RangeHashedDict,
      default: Long): Unit =
    registry.put((name, attr), Registered(dict, default))

  private[graft] def clearRegistry(): Unit = registry.clear()

  /** Builder for the SQL form: id/date expressions + literal
    * name/attr → lookup expression with the registered default. */
  def sqlDictGet(name: String, attr: String, id: Expression,
      date: Expression): Expression = {
    val reg = registry.get((name, attr))
    if (reg == null) throw new IllegalArgumentException(
      s"range_hashed dictionary '$name' has no registered attribute " +
        s"'$attr' (RangeHashedDict.register it first)")
    org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
      RangeDictGetExpr(id, date, reg.dict),
      org.apache.spark.sql.catalyst.expressions.Literal(reg.default)))
  }
}

/** Per-row range-dictionary probe: NULL on miss (callers coalesce the
  * configured default on top). Codegen keeps the scan inside
  * whole-stage codegen — the dict object is a plan reference, not a
  * per-row closure capture. */
case class RangeDictGetExpr(left: Expression, right: Expression,
    dict: RangeHashedDict) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dict_get_range"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType &&
        (right.dataType == DateType || right.dataType == IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dict_get_range(id BIGINT, date DATE) expected, got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(id: Any, day: Any): Any =
    dict.lookup(id.asInstanceOf[Long], day.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("rangeDict", dict,
      classOf[RangeHashedDict].getName)
    nullSafeCodeGen(ctx, ev, (id, day) => {
      val hit = ctx.freshName("hit")
      s"""
         |java.lang.Long $hit = $dictRef.lookup($id, $day);
         |if ($hit == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $hit.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RangeDictGetExpr =
    copy(left = newLeft, right = newRight)
}
