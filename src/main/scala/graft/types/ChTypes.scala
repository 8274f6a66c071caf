package graft.types

import org.apache.spark.sql.types._

/** ClickHouse type names ↔ Spark DataTypes (SURVEY.md §1.2; factory
  * dbms/src/DataTypes/DataTypeFactory.cpp). Recursive-descent over
  * the type grammar: `Nullable(T)`, `Array(T)`, `Tuple(T1, …)`,
  * `Nested(n1 T1, …)` (= Array(Struct)), `FixedString(N)`,
  * `Enum8/16('a' = 1, …)`, and the scalar map.
  *
  * Width mapping: unsigned types use the next-wider signed Spark type
  * except UInt64 → DECIMAL(20,0) (value-exact; Long would wrap).
  */
object ChTypes {

  final case class Parsed(dataType: DataType, nullable: Boolean)

  private val scalars: Map[String, DataType] = Map(
    "UInt8" -> IntegerType, "UInt16" -> IntegerType,
    "UInt32" -> LongType, "UInt64" -> DecimalType(20, 0),
    "Int8" -> ByteType, "Int16" -> ShortType,
    "Int32" -> IntegerType, "Int64" -> LongType,
    "Float32" -> FloatType, "Float64" -> DoubleType,
    "String" -> StringType,
    "Date" -> DateType, "DateTime" -> TimestampType,
    "Null" -> NullType)

  /** Parse a ClickHouse type expression into a Spark type. */
  def parse(ch: String): Parsed = {
    val t = ch.trim
    scalars.get(t) match {
      case Some(dt) => Parsed(dt, nullable = false)
      case None if t.startsWith("Nullable(") && t.endsWith(")") =>
        parse(inner(t, "Nullable")).copy(nullable = true)
      case None if t.startsWith("Array(") && t.endsWith(")") =>
        val e = parse(inner(t, "Array"))
        Parsed(ArrayType(e.dataType, containsNull = e.nullable), nullable = false)
      case None if t.startsWith("Tuple(") && t.endsWith(")") =>
        val fields = splitTop(inner(t, "Tuple")).zipWithIndex.map { case (f, i) =>
          val p = parse(f)
          StructField(s"_${i + 1}", p.dataType, p.nullable)
        }
        Parsed(StructType(fields), nullable = false)
      case None if t.startsWith("Nested(") && t.endsWith(")") =>
        val fields = splitTop(inner(t, "Nested")).map { f =>
          val sp = f.trim.split("\\s+", 2)
          require(sp.length == 2, s"Nested field needs 'name Type': $f")
          val p = parse(sp(1))
          StructField(sp(0), p.dataType, p.nullable)
        }
        Parsed(ArrayType(StructType(fields), containsNull = false), nullable = false)
      case None if t.startsWith("FixedString(") =>
        Parsed(StringType, nullable = false) // length enforced on write
      case None if t.startsWith("Enum8(") || t.startsWith("Enum16(") =>
        Parsed(StringType, nullable = false) // name-valued; dictionary on write
      case None if t.startsWith("AggregateFunction(") =>
        // set-state aggregates store the exact distinct/collected
        // value array (uniqExactState layout, composable with the
        // dialect's uniqState/uniqMerge builders); other states stay
        // opaque serialized bytes
        val parts = splitTop(inner(t, "AggregateFunction"))
        val agg = parts.head.trim.toLowerCase
        if (Set("uniq", "uniqexact", "uniqhll12", "uniqcombined",
          "grouparray", "groupuniqarray").contains(agg) && parts.length == 2) {
          val e = parse(parts(1))
          Parsed(ArrayType(e.dataType, containsNull = e.nullable), nullable = false)
        } else Parsed(BinaryType, nullable = false)
      case None =>
        throw new IllegalArgumentException(s"unsupported ClickHouse type: $ch")
    }
  }

  /** Parse a full `name Type, name Type` column list into a schema. */
  def schema(columns: String): StructType = schemaWithDefaults(columns)._1

  /** Column list where defs may carry `DEFAULT expr` / `MATERIALIZED
    * expr` / `ALIAS expr` (ColumnsDescription; the expression is
    * returned as text for the INSERT pipeline to evaluate). */
  def schemaWithDefaults(columns: String): (StructType, Seq[(String, String)]) = {
    val defaults = Seq.newBuilder[(String, String)]
    val fields = splitTop(columns).flatMap { c =>
      val sp = c.trim.split("\\s+", 2)
      require(sp.length == 2, s"column needs 'name Type': $c")
      val (typeText, defaultExpr) =
        "(?is)^(.*?)\\s*\\b(DEFAULT|MATERIALIZED|ALIAS)\\s+(.+)$".r
          .findFirstMatchIn(sp(1)) match {
          case Some(m) => (m.group(1).trim, Some(m.group(3).trim))
          case None => (sp(1).trim, None)
        }
      // `k default 0` (no declared type) infers the type from the
      // default literal, the reference's implicit-type column rule
      // (ColumnsDescription: type of evaluated default expression)
      val typeText2 =
        if (typeText.nonEmpty) typeText
        else inferTypeFromDefault(defaultExpr.getOrElse(
          throw new IllegalArgumentException(s"column needs a type or DEFAULT: $c")))
      defaultExpr.foreach(e => defaults += (sp(0) -> e))
      if (typeText2.startsWith("Nested(")) {
        // the reference stores Nested(a T, b U) as flattened parallel
        // arrays `name.a Array(T)`, `name.b Array(U)` sharing offsets
        // (DataTypeNested / NestedUtils.h flatten)
        splitTop(inner(typeText2, "Nested")).map { f =>
          val fs = f.trim.split("\\s+", 2)
          require(fs.length == 2, s"Nested field needs 'name Type': $f")
          val p = parse(fs(1))
          StructField(s"${sp(0)}.${fs(0)}",
            ArrayType(p.dataType, containsNull = p.nullable), nullable = false)
        }
      } else {
        val p = parse(typeText2)
        Seq(StructField(sp(0), p.dataType, p.nullable))
      }
    }
    (StructType(fields), defaults.result())
  }

  /** Deep-nullable variant of a type (DataType.asNullable is
    * private[spark]); legacy-mode casts may produce nulls, so INSERT
    * casts target this relaxation of the declared type. */
  def deepNullable(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(deepNullable(e), containsNull = true)
    case MapType(k, v, _) =>
      MapType(deepNullable(k), deepNullable(v), valueContainsNull = true)
    case StructType(fs) => StructType(fs.map(f =>
      f.copy(dataType = deepNullable(f.dataType), nullable = true)))
    case other => other
  }

  /** Spark type → the ClickHouse name we'd surface (inverse map). */
  def toChName(dt: DataType, nullable: Boolean = false): String = {
    val base = dt match {
      case ByteType => "Int8"
      case ShortType => "Int16"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case StringType => "String"
      case DateType => "Date"
      case _: TimestampType => "DateTime"
      case d: DecimalType if d.precision == 20 && d.scale == 0 => "UInt64"
      case BinaryType => "String"
      case NullType => "Null"
      case ArrayType(e, n) => s"Array(${toChName(e, n)})"
      case s: StructType =>
        s"Tuple(${s.fields.map(f => toChName(f.dataType, f.nullable)).mkString(", ")})"
      case other => other.simpleString
    }
    if (nullable && !dt.isInstanceOf[ArrayType] && !dt.isInstanceOf[StructType] &&
        dt != NullType) // plain NULL is type Null, never Nullable(Null)
      s"Nullable($base)"
    else base
  }

  /** CH literal typing for implicit-type DEFAULT columns
    * (FieldVisitors: smallest unsigned/signed integer type that
    * holds the value; floats are Float64; strings String; a
    * ['a','b'] literal is Array(String)). */
  private def inferTypeFromDefault(expr: String): String = {
    val e = expr.trim
    if (e.matches("-?\\d+")) {
      val v = BigInt(e)
      if (v >= 0) {
        if (v < 256) "UInt8"
        else if (v < 65536) "UInt16"
        else if (v < (BigInt(1) << 32)) "UInt32" else "UInt64"
      } else {
        if (v >= -128) "Int8"
        else if (v >= -32768) "Int16"
        else if (v >= Int.MinValue) "Int32" else "Int64"
      }
    }
    else if (e.matches("-?\\d+\\.\\d*(?:[eE][+-]?\\d+)?")) "Float64"
    else if (e.startsWith("'")) "String"
    else if (e.startsWith("[")) {
      val items = e.stripPrefix("[").stripSuffix("]").trim
      if (items.startsWith("'")) "Array(String)" else "Array(UInt8)"
    }
    else if (e.matches("(?i)toDate\\(.*")) "Date"
    else if (e.matches("(?i)toDateTime\\(.*")) "DateTime"
    else "String" // unknown expression: CH would evaluate; String is
                  // the safest renderable fallback for the corpus
  }

  private def inner(t: String, head: String): String =
    t.substring(head.length + 1, t.length - 1)

  /** Split on top-level commas (ignoring nesting and quotes). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inQuote = false
    val cur = new StringBuilder
    s.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case c@('(' | '[') if !inQuote => depth += 1; cur += c
      case c@(')' | ']') if !inQuote => depth -= 1; cur += c
      case ',' if depth == 0 && !inQuote => out += cur.toString; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
