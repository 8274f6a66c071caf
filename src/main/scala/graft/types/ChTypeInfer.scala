package graft.types

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._

import graft.functions.{ChTypeTag, ToTypeName}

/** Analysis-time ClickHouse type inference for `toTypeName`.
  *
  * Spark's storage types erase the reference's unsigned/width
  * distinctions (UInt32 lives in LongType — DataTypesNumber.h), so
  * the Spark-derived spelling [[ChTypes.toChName]] is wrong wherever
  * the reference would say UInt*. This recovers the reference
  * spelling for the tractable core of the surface:
  *
  *  - integer literals follow the smallest-type rule
  *    (Field visitor in Core/FieldVisitors.h: 1 is UInt8, -1 Int8);
  *  - [[ChTypeTag]] markers planted by the dialect's to* conversions
  *    and typed CASTs carry the declared name through analysis;
  *  - stored columns surface their declared name via the `ch.type`
  *    field-metadata key ([[ChTypes]] column parsing);
  *  - if/multiIf/coalesce/least/greatest/arithmetic recombine child
  *    names with the reference's promotion rules
  *    (NumberTraits.h / getLeastSupertype.cpp).
  *
  * Anything it can't prove returns None and the caller falls back to
  * the Spark-derived spelling — inference must never be wrong, only
  * incomplete. It runs on the ANALYZED tree (before the optimizer
  * erases RuntimeReplaceable markers) and only under a ToTypeName
  * node, so it costs nothing on query hot paths.
  */
object ChTypeInfer {

  /** A CH scalar type name split into base + nullability. */
  final case class T(base: String, nullable: Boolean) {
    def render: String =
      if (nullable && base != "Null") s"Nullable($base)" else base
  }

  def parse(name: String): T = {
    val m = "^Nullable\\((.*)\\)$".r.findFirstMatchIn(name.trim)
    m.map(g => T(g.group(1), nullable = true)).getOrElse(T(name.trim, nullable = false))
  }

  /** Metadata key carrying a stored column's declared CH type text. */
  val MetaKey = "ch.type"

  /** The name toTypeName should print for `e` (inference, falling
    * back to the Spark-derived spelling). */
  def name(e: Expression): String =
    infer(e).map(_.render)
      .getOrElse(ChTypes.toChName(e.dataType, e.nullable))

  // ---- integer lattice helpers -------------------------------------

  private val intWidth = Map(
    "UInt8" -> 8, "UInt16" -> 16, "UInt32" -> 32, "UInt64" -> 64,
    "Int8" -> 8, "Int16" -> 16, "Int32" -> 32, "Int64" -> 64)

  private def isUInt(b: String) = b.startsWith("UInt")
  private def intType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def isInt(b: String) = intWidth.contains(b)
  private def isFloat(b: String) = b == "Float32" || b == "Float64"

  private def intName(signed: Boolean, width: Int): String =
    (if (signed) "Int" else "UInt") + math.min(math.max(width, 8), 64)

  /** Smallest CH integer type holding `v` (FieldVisitors smallest-type
    * rule: non-negative → UInt, negative → Int). */
  private def intLit(v: BigInt): T = {
    val base =
      if (v >= 0) {
        if (v < 256) "UInt8"
        else if (v < 65536) "UInt16"
        else if (v < (BigInt(1) << 32)) "UInt32"
        else "UInt64"
      } else {
        if (v >= -128) "Int8"
        else if (v >= -32768) "Int16"
        else if (v >= Int.MinValue) "Int32"
        else "Int64"
      }
    T(base, nullable = false)
  }

  /** Least common supertype of integer/float bases
    * (getLeastSupertype.cpp): same-signedness ints take the max
    * width; mixed signedness needs a signed type one step wider than
    * the widest unsigned (capped at 64); any float involvement is
    * Float64 unless everything is Float32. */
  private def superBase(bases: Seq[String]): Option[String] = {
    val distinct = bases.distinct
    if (distinct.isEmpty) None
    // Array(X) supertypes elementwise (getLeastSupertype.cpp arrays)
    else if (distinct.size > 1 &&
        distinct.forall(b => b.startsWith("Array(") && b.endsWith(")")))
      superBase(distinct.map(b => b.stripPrefix("Array(").stripSuffix(")")))
        .map(i => s"Array($i)")
    else if (distinct.size == 1) Some(distinct.head)
    else if (distinct.forall(b => isInt(b) || isFloat(b))) {
      if (distinct.exists(isFloat)) {
        Some(if (distinct.forall(b => b == "Float32" || intWidth.getOrElse(b, 64) <= 16)) "Float32" else "Float64")
      } else {
        val anySigned = distinct.exists(b => !isUInt(b))
        val anyUnsigned = distinct.exists(isUInt)
        val maxSignedW = distinct.filter(b => !isUInt(b)).map(intWidth).foldLeft(0)(math.max)
        val maxUnsignedW = distinct.filter(isUInt).map(intWidth).foldLeft(0)(math.max)
        if (anySigned && anyUnsigned)
          Some(intName(signed = true, math.max(maxSignedW, math.min(maxUnsignedW * 2, 64))))
        else Some(intName(signed = anySigned, math.max(maxSignedW, maxUnsignedW)))
      }
    } else None
  }

  // ---- structural inference ----------------------------------------

  /** Inferred CH type of `e`, or None when not provable. */
  /** exprId → CH type for attributes whose defining Alias lives in
    * another plan node; see the AttributeReference arm of [[infer]]. */
  private val scopeTypes = new ThreadLocal[Map[Long, T]] {
    override def initialValue(): Map[Long, T] = Map.empty
  }

  def withScope[A](m: Map[Long, T])(f: => A): A = {
    val old = scopeTypes.get()
    scopeTypes.set(m)
    try f finally scopeTypes.set(old)
  }

  def infer(e: Expression): Option[T] = e match {
    case ChTypeTag(c, n) =>
      val t = parse(n)
      if (t.nullable) Some(t)
      else Some(t.copy(nullable = chNullable(c)))
    case _: ToTypeName => Some(T("String", nullable = false))
    case Alias(c, _) => infer(c)
    // CH-boolean plumbing is transparent: an actual boolean child is
    // the reference's UInt8, a numeric child passes through unchanged
    case graft.functions.BoolToUInt8(c) =>
      if (c.dataType == BooleanType) Some(T("UInt8", chNullable(c)))
      else infer(c)
    case graft.functions.UInt8ToBool(c) => infer(c)
    case KnownNullable(c) => Some(inferOr(c).copy(nullable = true))
    case KnownNotNull(c) => Some(inferOr(c).copy(nullable = false))
    // BEFORE the RuntimeReplaceable fallthrough: the enum cast names
    // its Enum type (DataTypeEnum), not the replacement's String
    case ec: graft.functions.ChEnumCast =>
      Some(T(ec.enumDef.typeName, nullable = false))
    // length() returns UInt64 in the reference (FunctionsString.h
    // FunctionLength), not the replacement Length's Int32
    case graft.functions.ChLength(c) => Some(T("UInt64", chNullable(c)))
    case r: RuntimeReplaceable => infer(r.replacement)

    case Literal(null, NullType) => Some(T("Null", nullable = false))
    case Literal(v, ByteType | ShortType | IntegerType | LongType) if v != null =>
      Some(intLit(BigInt(v.toString)))
    case Literal(v: Decimal, t: DecimalType) if t.scale == 0 =>
      Some(intLit(BigInt(v.toJavaBigDecimal.toBigInteger)))
    case Literal(_, DoubleType) => Some(T("Float64", nullable = false))
    case Literal(_, FloatType) => Some(T("Float32", nullable = false))
    case Literal(_, StringType) => Some(T("String", nullable = false))
    case Literal(_, BooleanType) => Some(T("UInt8", nullable = false))

    case a: AttributeReference if a.metadata.contains(MetaKey) =>
      Some(parse(a.metadata.getString(MetaKey)))
    // attributes born from an alias elsewhere in the plan resolve
    // through the scope map [[withScope]] (populated per rule
    // invocation by ChTypeNameResolution) — system.numbers' `number`
    // arrives here via the ch_type_tag the rewrite plants, NOT by
    // name, so a user column that happens to be called `number`
    // keeps its own type
    case a: AttributeReference if scopeTypes.get.contains(a.exprId.id) =>
      Some(scopeTypes.get()(a.exprId.id))

    case UnaryMinus(c, _) =>
      c match {
        // fold the sign into a literal first (-1 is Int8, not
        // negate(UInt8))
        case Literal(v, ByteType | ShortType | IntegerType | LongType)
            if v != null =>
          Some(intLit(-BigInt(v.toString)))
        case Literal(v: Decimal, t: DecimalType) if t.scale == 0 =>
          Some(intLit(-BigInt(v.toJavaBigDecimal.toBigInteger)))
        case _ =>
          infer(c).flatMap { t =>
            if (isUInt(t.base))
              Some(t.copy(base = intName(signed = true, math.min(intWidth(t.base) * 2, 64))))
            else if (isInt(t.base) || isFloat(t.base)) Some(t)
            else None
          }
      }

    case Cast(c, StringType, _, _) => Some(T("String", chNullable(c)))
    // temporal conversions: the reference's toDate/toDateTime THROW on
    // bad input rather than producing NULL, so nullability follows
    // the argument (Spark's cast is nullable-on-failure)
    case Cast(c, DateType, _, _) => Some(T("Date", chNullable(c)))
    case Cast(c, TimestampType | TimestampNTZType, _, _) =>
      Some(T("DateTime", chNullable(c)))
    // coercion-inserted numeric widenings are invisible to the
    // reference's typing: an untagged numeric cast reports its
    // CHILD's CH type (explicit conversions carry a ChTypeTag above
    // the cast, so they never reach this arm)
    case Cast(c, dt, _, _)
        if intType(dt) || dt == DoubleType || dt == FloatType ||
          dt.isInstanceOf[DecimalType] =>
      infer(c)
    // same for coercion-inserted ARRAY widenings (array<int> →
    // array<bigint> around a branch of if/multiIf)
    case Cast(c, ArrayType(dt, _), _, _)
        if intType(dt) || dt == DoubleType || dt == FloatType =>
      infer(c)

    case Coalesce(args) => combine(args, ifNullRule = true)
    case If(_, t, f) => combine(Seq(t, f), ifNullRule = false)
    case CaseWhen(branches, elseValue) =>
      combine(branches.map(_._2) ++ elseValue, ifNullRule = false,
        forceNullable = elseValue.isEmpty)

    case l: Least => leastGreatest(l.children, greatest = false)
    case g: Greatest => leastGreatest(g.children, greatest = true)

    // modulo takes the DIVISOR's width, intDiv the DIVIDEND's
    // (NumberTraits.h ResultOfModulo / ResultOfIntegerDivision) —
    // `number % 10` is UInt8, intDiv(number, 10) UInt64
    case Remainder(a, b, _) => divLike(a, b, widthOf = b)
    case IntegralDivide(a, b, _) => divLike(a, b, widthOf = a)

    // tuple literals: Tuple(per-element CH types)
    case cs: CreateNamedStruct if cs.valExprs.nonEmpty =>
      val ts = cs.valExprs.map(v => infer(v).map(_.render)
        .orElse(Some(graft.types.ChTypes.toChName(v.dataType, v.nullable))))
      if (ts.exists(_.isEmpty)) None
      else Some(T(s"Tuple(${ts.flatten.mkString(", ")})", nullable = false))

    // array literals: Array(least supertype of the elements); range()
    // (Spark Sequence) is Array(UInt64) in the reference
    case CreateArray(children, _) if children.nonEmpty =>
      combine(children, ifNullRule = false).map(t =>
        T(s"Array(${t.base})", nullable = false))
    case _: org.apache.spark.sql.catalyst.expressions.Sequence =>
      Some(T("Array(UInt64)", nullable = false))

    // `/` is always Float64 and never null-producing in the reference
    // (÷0 yields inf/nan, not NULL — corpus 00031 toTypeName(0/0)).
    // During analysis the node is still Spark's Divide (the
    // ChFloatDivide swap happens post-analysis in ChSql.apply).
    case graft.functions.ChFloatDivide(a, b) =>
      Some(T("Float64", chNullable(a) || chNullable(b)))
    case Divide(a, b, _) =>
      Some(T("Float64", chNullable(a) || chNullable(b)))

    // DateTime−DateTime / Date−Date difference is Int32
    // (FunctionsDateTime minus; the implicit-cast rule has already
    // lowered the operands to Long/DateDiff)
    case Subtract(a, b, _)
        if Seq(a, b).forall(e => infer(e).exists(t =>
          t.base == "DateTime" || t.base == "Date")) =>
      Some(T("Int32", chNullable(a) || chNullable(b)))
    case _: DateDiff => Some(T("Int32", nullable = false))

    case Add(a, b, _) => arith(Seq(a, b), signedResult = false)
    case Multiply(a, b, _) => arith(Seq(a, b), signedResult = false)
    case Subtract(a, b, _) => arith(Seq(a, b), signedResult = true)

    case ae: AggregateExpression => inferAgg(ae.aggregateFunction)

    case _ => None
  }

  private def inferAgg(f: AggregateFunction): Option[T] = f match {
    case Sum(c, _) =>
      infer(c).flatMap { t =>
        if (isInt(t.base)) Some(T(if (isUInt(t.base)) "UInt64" else "Int64", t.nullable))
        else if (isFloat(t.base)) Some(T("Float64", t.nullable))
        else None
      }
    case _: Count => Some(T("UInt64", nullable = false))
    case Min(c) => infer(c)
    case Max(c) => infer(c)
    case Average(c, _) =>
      infer(c).flatMap(t =>
        if (isInt(t.base) || isFloat(t.base)) Some(T("Float64", nullable = true)) else None)
    case _ => None
  }

  /** Spark-derived fallback as a T (used where only nullability or a
    * wrapper is being adjusted). */
  private def inferOr(c: Expression): T =
    infer(c).getOrElse(parse(ChTypes.toChName(c.dataType, c.nullable)))

  /** CH-level nullability of `e` (the tag/inferred view where known,
    * Spark's nullable bit otherwise). */
  private def chNullable(e: Expression): Boolean =
    infer(e).map(_.nullable).getOrElse(e.nullable)

  /** Reference-level nullability of an expression: Spark marks e.g.
    * `%` nullable (zero divisor → NULL) where the reference's UInt8
    * modulo is plain non-null — builders deciding on NULL-guard
    * shapes should ask this, not Spark's `.nullable`. */
  def isChNullable(e: Expression): Boolean = chNullable(e)

  /** Type of a pick-one-of-the-values combinator. Null-typed values
    * drop out of the base computation. With `ifNullRule` (coalesce /
    * ifNull — FunctionsNull.cpp) the result is Nullable only when
    * every remaining candidate is; branch constructs (if/multiIf) are
    * Nullable when ANY branch is Null-typed or Nullable. */
  /** A NULL literal, possibly under coercion-inserted casts/aliases
    * (type coercion rewrites `NULL` to `CAST(NULL AS t)` before the
    * resolution rule sees it). */
  private def isNullLit(e: Expression): Boolean = e match {
    case Literal(null, _) => true
    case Cast(c, _, _, _) => isNullLit(c)
    case Alias(c, _) => isNullLit(c)
    case _ => false
  }

  private def combine(values: Seq[Expression], ifNullRule: Boolean,
      forceNullable: Boolean = false): Option[T] = {
    val (nulls, rest0) = values.partition(v => v.dataType == NullType || isNullLit(v))
    // `[]` (Array(Nothing)) unifies with any array without forcing
    // nullability — drop it from the base computation like the
    // reference's getLeastSupertype does
    val rest = {
      val r = rest0.filterNot(_.dataType == ArrayType(NullType, containsNull = true))
        .filterNot(_.dataType == ArrayType(NullType, containsNull = false))
      if (r.nonEmpty) r else rest0
    }
    if (rest.isEmpty) return Some(T("Null", nullable = false))
    val ts = rest.map(infer)
    if (ts.exists(_.isEmpty)) return None
    val bases = ts.flatten.map(_.base)
    superBase(bases).map { b =>
      val nullable =
        if (ifNullRule) ts.flatten.forall(_.nullable)
        else forceNullable || nulls.nonEmpty || ts.flatten.exists(_.nullable)
      T(b, nullable)
    }
  }

  /** least/greatest with the reference's accurate-comparison typing
    * (FunctionsConditional "new behavior", corpus 00413): over mixed
    * signedness at full width the result type keeps the side that can
    * represent the answer — least can only be ≤ every signed value
    * (Int64), greatest ≥ every unsigned value (UInt64). */
  private def leastGreatest(args: Seq[Expression], greatest: Boolean): Option[T] = {
    val ts = args.map(infer)
    if (ts.exists(_.isEmpty)) return None
    val flat = ts.flatten
    val bases = flat.map(_.base)
    val nullable = flat.exists(_.nullable)
    if (bases.forall(isInt) && bases.exists(isUInt) && bases.exists(b => !isUInt(b))
        && bases.map(intWidth).max == 64)
      Some(T(if (greatest) "UInt64" else "Int64", nullable))
    else superBase(bases).map(T(_, nullable))
  }

  /** Modulo / integral division: sign from either operand, width
    * from the designated one (NumberTraits.h). */
  private def divLike(a: Expression, b: Expression, widthOf: Expression): Option[T] = {
    val ta = infer(a); val tb = infer(b)
    if (ta.isEmpty || tb.isEmpty) return None
    val (x, y) = (ta.get, tb.get)
    if (!isInt(x.base) || !isInt(y.base)) return None
    val signed = !isUInt(x.base) || !isUInt(y.base)
    val w = intWidth(if (widthOf eq a) x.base else y.base)
    Some(T(intName(signed, w), x.nullable || y.nullable))
  }

  /** Binary plus/minus/times widen to twice the wider operand, capped
    * at 64 (NumberTraits::ResultOfAdditionMultiplication /
    * OfSubtraction); minus is always signed. */
  private def arith(args: Seq[Expression], signedResult: Boolean): Option[T] = {
    val ts = args.map(infer)
    if (ts.exists(_.isEmpty)) return None
    val flat = ts.flatten
    val bases = flat.map(_.base)
    val nullable = flat.exists(_.nullable)
    if (bases.forall(isInt)) {
      val signed = signedResult || bases.exists(b => !isUInt(b))
      Some(T(intName(signed, math.min(bases.map(intWidth).max * 2, 64)), nullable))
    } else if (bases.forall(b => isInt(b) || isFloat(b)))
      Some(T("Float64", nullable))
    else None
  }
}
