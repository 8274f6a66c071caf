package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's `complex_key_hashed` dictionary layout
  * (Dictionaries/ComplexKeyHashedDictionary.cpp; factory
  * Interpreters/DictionaryFactory.cpp complex_key_hashed): a hash
  * table keyed by a COMPOSITE (tuple) key — the layout users hit for
  * multi-column dimension lookups — probed as
  * `dictGetT('name', 'attr', tuple(k1, …, kn))`. A miss, or any NULL
  * key member, yields the attribute's configured default
  * (null_value).
  *
  * Spark shape (same as [[RangeHashedDict]]): the dictionary source
  * is collected ONCE on the driver — dictionaries are config-loaded
  * small tables in the reference too — and rides the plan as a
  * shared reference object, so the fact scan probes a broadcast hash
  * map per row and never shuffles. Key parts normalize to the probe
  * side's INTERNAL representation (integrals widen to Long, strings
  * stay UTF8String), so the per-row probe does zero conversions. At
  * 1000 executors the map moves once per executor. */
final class ComplexKeyHashedDict private (
    private val map: java.util.HashMap[ComplexKeyHashedDict.Key, Any],
    val valueType: DataType) extends Serializable {

  /** Internal-typed value for the key, or null on miss. Callers pass
    * normalized parts (Long for integrals, UTF8String for strings). */
  def lookup(parts: Array[AnyRef]): AnyRef =
    map.get(new ComplexKeyHashedDict.Key(parts)).asInstanceOf[AnyRef]

  def size: Int = map.size
}

object ComplexKeyHashedDict {

  /** Composite key: array-equality wrapper (parts are the NORMALIZED
    * internal values — java.lang.Long or UTF8String). */
  final class Key(val parts: Array[AnyRef]) extends Serializable {
    override def hashCode: Int = java.util.Arrays.hashCode(parts)
    override def equals(o: Any): Boolean = o match {
      case k: Key => java.util.Arrays.equals(parts, k.parts)
      case _ => false
    }
  }

  /** Key-part types the layout accepts (the reference's complex keys
    * are fixed-type tuples; we support the integral + String forms). */
  private def keyPartOk(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType => true
    case _ => false
  }

  /** External (driver Row) value → normalized internal key part. */
  private def normalizeExternal(v: Any): AnyRef = v match {
    case null => null
    case b: Byte => java.lang.Long.valueOf(b.toLong)
    case s: Short => java.lang.Long.valueOf(s.toLong)
    case i: Int => java.lang.Long.valueOf(i.toLong)
    case l: Long => java.lang.Long.valueOf(l)
    case s: String => UTF8String.fromString(s)
    case u: UTF8String => u
    case other => throw new IllegalArgumentException(
      s"complex_key_hashed key part type ${other.getClass} unsupported")
  }

  /** Collect a small dimension frame into the layout. Key columns may
    * be integral or string; the value column must match `valueType`
    * (LongType or StringType). Rows with a NULL key member are
    * skipped — the reference's complex keys are non-nullable, and a
    * NULL-member probe misses anyway. Duplicate keys keep the FIRST
    * row (hashed-layout insert semantics). */
  def build(src: DataFrame, keyCols: Seq[String], valueCol: String,
      valueType: DataType): ComplexKeyHashedDict = {
    require(valueType == LongType || valueType == StringType,
      s"complex_key_hashed value type $valueType unsupported (Long/String)")
    val cols = keyCols.map(org.apache.spark.sql.functions.col) :+
      (valueType match {
        case LongType => org.apache.spark.sql.functions.col(valueCol).cast("long")
        case _ => org.apache.spark.sql.functions.col(valueCol).cast("string")
      })
    val rows = DictGuard.collectBounded("complex_key_hashed",
      src.select(cols: _*))
    val m = new java.util.HashMap[Key, Any](rows.length * 2)
    rows.foreach { r =>
      val n = keyCols.length
      val parts = new Array[AnyRef](n)
      var i = 0
      var ok = true
      while (i < n && ok) {
        if (r.isNullAt(i)) ok = false
        else parts(i) = normalizeExternal(r.get(i))
        i += 1
      }
      if (ok && !r.isNullAt(n)) {
        val v: Any = valueType match {
          case LongType => java.lang.Long.valueOf(r.getLong(n))
          case _ => UTF8String.fromString(r.getString(n))
        }
        m.putIfAbsent(new Key(parts), v)
      }
    }
    new ComplexKeyHashedDict(m, valueType)
  }

  /** DataFrame-API probe: `dictGet(dict, Seq(k1, k2), default)`. */
  def dictGet(dict: ComplexKeyHashedDict, keys: Seq[Column],
      default: Column): Column =
    org.apache.spark.sql.functions.coalesce(
      Bridge.column(ComplexDictGetExpr(keys.map(Bridge.expression), dict)),
      default)

  // ---- named-dictionary registry: the SQL surface ------------------
  private final case class Registered(dict: ComplexKeyHashedDict,
      default: Any)
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Registered]()

  /** Register `name.attr` with its configured null_value default
    * (a Long for integer attributes, a String for string ones). */
  def register(name: String, attr: String, dict: ComplexKeyHashedDict,
      default: Any): Unit =
    registry.put((name, attr), Registered(dict, default))

  private[graft] def clearRegistry(): Unit = registry.clear()

  private[graft] def lookupRegistry(name: String, attr: String)
      : Option[(ComplexKeyHashedDict, Any)] =
    Option(registry.get((name, attr))).map(r => (r.dict, r.default))

  /** Builder for the SQL form `dictGetT('name','attr', tuple(k1,…))`:
    * the tuple decomposes into its member expressions (the dialect
    * translates `tuple` to a struct constructor). A bare non-struct
    * expression probes as a 1-element key. */
  def sqlDictGet(name: String, attr: String, key: Expression): Expression = {
    val reg = registry.get((name, attr))
    if (reg == null) throw new IllegalArgumentException(
      s"complex_key_hashed dictionary '$name' has no registered " +
        s"attribute '$attr' (ComplexKeyHashedDict.register it first)")
    val parts = key match {
      case s: CreateNamedStruct => s.valExprs
      case other => Seq(other)
    }
    val defaultLit = reg.default match {
      case s: String => Literal(UTF8String.fromString(s), StringType)
      case l: Long => Literal(l, LongType)
      case i: Int => Literal(i.toLong, LongType)
      case other => Literal(other)
    }
    org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
      ComplexDictGetExpr(parts, reg.dict), defaultLit))
  }

  /** Per-row composite-key probe: NULL on miss or any NULL key member
    * (callers coalesce the configured default on top). Codegen keeps
    * the scan inside whole-stage codegen — the dict object is a plan
    * reference, not a per-row closure capture. */
  case class ComplexDictGetExpr(children: Seq[Expression],
      dict: ComplexKeyHashedDict) extends Expression {
    override def dataType: DataType = dict.valueType
    override def nullable: Boolean = true
    override def foldable: Boolean = false
    override def prettyName: String = "dict_get_complex_key"

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (children.nonEmpty && children.forall(c => keyPartOk(c.dataType)))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dict_get_complex_key key parts must be integral or string, got " +
          children.map(_.dataType).mkString(", "))
    }

    override def eval(input: InternalRow): Any = {
      val n = children.length
      val parts = new Array[AnyRef](n)
      var i = 0
      while (i < n) {
        val v = children(i).eval(input)
        if (v == null) return null
        parts(i) = normalizeExternal(v)
        i += 1
      }
      dict.lookup(parts)
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val dictRef = ctx.addReferenceObj("complexDict", dict,
        classOf[ComplexKeyHashedDict].getName)
      val evals = children.map(_.genCode(ctx))
      val parts = ctx.freshName("parts")
      val hit = ctx.freshName("hit")
      val fills = children.zip(evals).zipWithIndex.map { case ((c, e), i) =>
        val boxed = c.dataType match {
          case StringType => s"${e.value}"
          case LongType => s"java.lang.Long.valueOf(${e.value})"
          case _ => s"java.lang.Long.valueOf((long) ${e.value})"
        }
        s"""
           |if (!${ev.isNull}) {
           |  ${e.code}
           |  if (${e.isNull}) { ${ev.isNull} = true; }
           |  else { $parts[$i] = $boxed; }
           |}
         """.stripMargin
      }.mkString("\n")
      val javaType = CodeGenerator.javaType(dataType)
      val cast = dataType match {
        case StringType => s"(org.apache.spark.unsafe.types.UTF8String) $hit"
        case _ => s"((java.lang.Long) $hit).longValue()"
      }
      ev.copy(code = code"""
        boolean ${ev.isNull} = false;
        $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        Object[] $parts = new Object[${children.length}];
        $fills
        if (!${ev.isNull}) {
          Object $hit = $dictRef.lookup($parts);
          if ($hit == null) { ${ev.isNull} = true; }
          else { ${ev.value} = $cast; }
        }
      """)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): ComplexDictGetExpr =
      copy(children = newChildren)
  }
}
