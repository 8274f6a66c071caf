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

  /** `enumDef` carries the Enum8/16 name↔value map when the type (or
    * its array element, for Array(EnumN)/Nested leaves) is an enum —
    * callers attach it to the StructField as [[ChEnum]] metadata. */
  final case class Parsed(dataType: DataType, nullable: Boolean,
      enumDef: Option[ChEnum.Def] = None)

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
        Parsed(ArrayType(e.dataType, containsNull = e.nullable),
          nullable = false, enumDef = e.enumDef)
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
        // stored numerically (the reference's Int8/Int16 layout);
        // the name map travels as field metadata (DataTypeEnum.cpp)
        val bits = if (t.startsWith("Enum8(")) 8 else 16
        val d = ChEnum.parseDef(bits, inner(t, s"Enum$bits"))
        Parsed(d.storageType, nullable = false, enumDef = Some(d))
      case None if t.startsWith("AggregateFunction(") =>
        // the state layout mirrors the dialect's -State builders
        // (ChSql stateMergeFns): set/list states store the value
        // array (uniqExactState layout), value states (sum/min/max/
        // any) store the partial value itself, avg stores its
        // (sum, count) pair (AggregateFunctionAvg state), quantile
        // reservoirs store the collected values; anything else stays
        // opaque serialized bytes
        val parts = splitTop(inner(t, "AggregateFunction"))
        val aggFull = parts.head.trim
        val agg = aggFull.takeWhile(_ != '(').trim.toLowerCase
        def arg = parse(parts(1))
        def widened(dt: DataType): DataType = dt match {
          case _: FloatType | _: DoubleType => DoubleType
          case _ => LongType
        }
        agg match {
          // plain uniq stores the serialized adaptive sketch (bounded
          // ≤256 KB — UniquesHashSet::write via UniqSketchCodec);
          // the exact spellings store the distinct-value array
          case "uniq" if parts.length == 2 =>
            Parsed(BinaryType, nullable = false)
          case "uniqexact" | "uniqhll12" | "uniqcombined" |
               "grouparray" | "groupuniqarray" if parts.length == 2 =>
            Parsed(ArrayType(arg.dataType, containsNull = arg.nullable), nullable = false)
          case q if (q.startsWith("quantile") || q.startsWith("median")) &&
              parts.length == 2 =>
            Parsed(ArrayType(arg.dataType, containsNull = arg.nullable), nullable = false)
          case "sum" if parts.length == 2 =>
            Parsed(widened(arg.dataType), nullable = false)
          case "min" | "max" | "any" | "anylast" if parts.length == 2 =>
            Parsed(arg.dataType, nullable = true)
          case "anyif" | "anylastif" | "minif" | "maxif" if parts.length == 3 =>
            Parsed(arg.dataType, nullable = true)
          case "sumif" if parts.length == 3 =>
            Parsed(widened(arg.dataType), nullable = true)
          case "count" => Parsed(LongType, nullable = false)
          case "avg" if parts.length == 2 =>
            Parsed(StructType(Seq(
              StructField("s", widened(arg.dataType), nullable = true),
              StructField("c", LongType, nullable = false))), nullable = false)
          case _ => Parsed(BinaryType, nullable = false)
        }
      case None =>
        throw new IllegalArgumentException(s"unsupported ClickHouse type: $ch")
    }
  }

  /** Parse a full `name Type, name Type` column list into a schema. */
  def schema(columns: String): StructType = schemaWithDefaults(columns)._1

  /** One declared column after parsing: the Spark field (with enum
    * metadata attached when the type is an EnumN), the CH type text it
    * renders as (DESCRIBE surface), and the default clause if any. */
  final case class ColDef(field: StructField, typeText: String,
      defaultKind: Option[String], defaultExpr: Option[String],
      // false when the declaration had no type and [[columnDefs]]
      // guessed one from the default's literal shape — the DDL layer
      // re-infers through the CH expression lattice then
      explicitType: Boolean = true)

  /** Column list where defs may carry `DEFAULT expr` / `MATERIALIZED
    * expr` / `ALIAS expr` (ColumnsDescription; the expression is
    * returned as text for the INSERT pipeline to evaluate). */
  def schemaWithDefaults(columns: String): (StructType, Seq[(String, String)]) = {
    val defs = columnDefs(columns)
    (StructType(defs.map(_.field)),
      defs.flatMap(d => d.defaultExpr.map(e => d.field.name -> e)))
  }

  private def withEnumMeta(f: StructField, e: Option[ChEnum.Def]): StructField =
    e.fold(f)(d => f.copy(metadata = ChEnum.tag(f.metadata, d)))

  /** Attach the declared CH type text as field metadata: toTypeName
    * inference ([[ChTypeInfer.MetaKey]]) and AggregateFunction-typed
    * default handling read it back; the Spark storage type alone
    * can't (UInt8 lives in IntegerType). */
  private def withTypeMeta(f: StructField, typeText: String): StructField =
    f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(f.metadata).putString(ChTypeInfer.MetaKey, typeText).build())

  /** CH type text a parsed column renders as — enum defs print their
    * (value-sorted) entry list, everything else round-trips the
    * declared text via the inverse scalar map. */
  private def renderTypeText(declared: String, p: Parsed): String =
    p.enumDef match {
      case Some(d) if !p.dataType.isInstanceOf[ArrayType] => d.typeName
      case Some(d) => s"Array(${d.typeName})"
      case None => declared
    }

  /** Full parse of a declared column list (DESCRIBE-grade detail). */
  def columnDefs(columns: String): Seq[ColDef] = splitTop(columns).flatMap { c =>
    val sp0 = c.trim.split("\\s+", 2)
    require(sp0.length == 2, s"column needs 'name Type': $c")
    // declared names may be backtick-quoted (`struct.d1` — flattened
    // dotted columns MUST be); the FIELD name is the bare text
    val sp = Array(sp0(0).replace("`", ""), sp0(1))
    val (typeText, defaultKind, defaultExpr) =
      "(?is)^(.*?)\\s*\\b(DEFAULT|MATERIALIZED|ALIAS)\\s+(.+)$".r
        .findFirstMatchIn(sp(1)) match {
        case Some(m) =>
          (m.group(1).trim, Some(m.group(2).toUpperCase), Some(m.group(3).trim))
        case None => (sp(1).trim, None, None)
      }
    // `k default 0` (no declared type) infers the type from the
    // default literal, the reference's implicit-type column rule
    // (ColumnsDescription: type of evaluated default expression)
    val typeText2 =
      if (typeText.nonEmpty) typeText
      else inferTypeFromDefault(defaultExpr.getOrElse(
        throw new IllegalArgumentException(s"column needs a type or DEFAULT: $c")))
    if (typeText2.startsWith("Nested(")) {
      // the reference stores Nested(a T, b U) as flattened parallel
      // arrays `name.a Array(T)`, `name.b Array(U)` sharing offsets
      // (DataTypeNested / NestedUtils.h flatten)
      splitTop(inner(typeText2, "Nested")).map { f =>
        val fs = f.trim.split("\\s+", 2)
        require(fs.length == 2, s"Nested field needs 'name Type': $f")
        val p = parse(fs(1))
        val tt = s"Array(${renderTypeText(fs(1).trim, p)})"
        val field = withTypeMeta(withEnumMeta(StructField(s"${sp(0)}.${fs(0)}",
          ArrayType(p.dataType, containsNull = p.nullable), nullable = false),
          p.enumDef), tt)
        ColDef(field, tt, None, None)
      }
    } else {
      val p = parse(typeText2)
      val tt = renderTypeText(typeText2, p)
      Seq(ColDef(withTypeMeta(withEnumMeta(
        StructField(sp(0), p.dataType, p.nullable), p.enumDef), tt),
        tt, defaultKind, defaultExpr, explicitType = typeText.nonEmpty))
    }
  }

  /** A field typed by a CH type name (with the type-text metadata the
    * DESCRIBE / toTypeName surface reads back). */
  def typedField(name: String, chType: String): StructField = {
    val p = parse(chType)
    withTypeMeta(withEnumMeta(
      StructField(name, p.dataType, p.nullable), p.enumDef),
      renderTypeText(chType, p))
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

  /** Field-level inverse map: enum-tagged fields surface their
    * Enum8/16 entry list, everything else falls to the type map. */
  def toChName(f: StructField): String = ChEnum.of(f) match {
    case Some(d) => f.dataType match {
      case _: ArrayType => s"Array(${d.typeName})"
      case _ => d.typeName
    }
    case None => toChName(f.dataType, f.nullable)
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

  /** Split on top-level commas (ignoring nesting and quotes) —
    * shared with the format renderers (Tuple(…) element lists,
    * compact-JSON row reparsing). */
  def splitTopCommas(s: String): Seq[String] = splitTop(s)

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
