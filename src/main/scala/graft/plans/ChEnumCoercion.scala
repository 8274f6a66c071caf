package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BinaryComparison, CaseWhen, Cast, Concat, EqualTo, Expression, FormatString, In, Literal, RaiseError}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, First, Last, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, ShortType, StringType}

import graft.types.ChEnum

/** Enum columns are stored numerically with the name map on the
  * attribute's metadata (see [[graft.types.ChEnum]]); the reference
  * lets SQL text address them by NAME (DataTypeEnum castToValue /
  * serializeText). Spark's type coercion would instead cast both
  * sides of `enum = 'name'` to double (yielding null), so this
  * resolution rule rewrites, wherever an enum-tagged attribute meets
  * a string:
  *
  *  - `e = 'hello'` / `e < 'b'` / `e != toString(1)` — the string
  *    side (any deterministic reference-free expression) evaluates to
  *    a name and becomes the numeric value literal;
  *  - `e IN ('a', 'd')` — each list element maps;
  *  - `toString(e)` / `CAST(e AS String)` — becomes the value→name
  *    CASE decode;
  *  - `any(e)` / `min(e)` / `max(e)` aliases inherit the enum
  *    metadata so the render layer still sees the enum.
  *
  * Coercion may already have wrapped either side in Cast by the time
  * this rule runs in the resolution fixpoint, so both matchers peel
  * casts. (Reference: corpus 00294/00386 semantics.)
  */
object ChEnumCoercion extends Rule[LogicalPlan] {

  private def enumSide(e: Expression): Option[(AttributeReference, ChEnum.Def)] =
    e match {
      case a: AttributeReference if a.dataType == ByteType || a.dataType == ShortType =>
        ChEnum.of(a.metadata).map(a -> _)
      case c: Cast => enumSide(c.child)
      case _ => None
    }

  /** A string-typed side whose value is known statically — a literal
    * or a foldable/reference-free deterministic expression
    * (`toString(0)`). */
  private def strSide(e: Expression): Option[String] = e match {
    case c: Cast if c.child.resolved && c.child.dataType == StringType =>
      strSide(c.child)
    case s if s.resolved && s.dataType == StringType &&
        s.deterministic && s.references.isEmpty =>
      try Option(s.eval(null)).map(_.toString)
      catch { case scala.util.control.NonFatal(_) => None }
    case _ => None
  }

  private def valueLit(d: ChEnum.Def, dt: DataType, name: String): Literal = {
    val v =
      if (d.hasName(name)) d.valueOf(name)
      else name.trim.toIntOption.getOrElse(
        throw new IllegalArgumentException(s"unknown Enum${d.bits} name: '$name'"))
    dt match {
      case ByteType => Literal(v.toByte)
      case _ => Literal(v.toShort)
    }
  }

  /** value → name decode as a CASE chain (small maps; codegen'd).
    * An out-of-map value THROWS like the reference's serializer
    * (DataTypeEnum::serializeText "Unexpected value ... in enum"),
    * not a silent NULL. */
  private def decode(a: AttributeReference, d: ChEnum.Def): Expression =
    CaseWhen(d.values.zip(d.names).map { case (v, n) =>
      (EqualTo(a, valueLit(d, a.dataType, n)).asInstanceOf[Expression],
        Literal(n).asInstanceOf[Expression])
    }, Some(Cast(new RaiseError(
      // format_string renders the numeral: ANY Cast-to-string here
      // would re-match this very rule's decode case (enumSide peels
      // casts) and loop the analyzer
      FormatString(Literal(s"unexpected value in Enum${d.bits}: %s"), a)),
      StringType)))

  private def enumChildOf(fn: Expression): Option[(AttributeReference, ChEnum.Def)] =
    fn match {
      case f: First => enumSide(f.child)
      case l: Last => enumSide(l.child)
      case m: Min => enumSide(m.child)
      case m: Max => enumSide(m.child)
      case a: graft.functions.ChAny => enumSide(a.child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case p => p.transformExpressionsUp {
        case cmp: BinaryComparison =>
          (enumSide(cmp.left), strSide(cmp.right),
            enumSide(cmp.right), strSide(cmp.left)) match {
            case (Some((a, d)), Some(n), _, _) =>
              cmp.withNewChildren(Seq(a, valueLit(d, a.dataType, n)))
            case (_, _, Some((a, d)), Some(n)) =>
              cmp.withNewChildren(Seq(valueLit(d, a.dataType, n), a))
            case _ => cmp
          }
        case in @ In(v, list) if list.nonEmpty =>
          enumSide(v) match {
            case Some((a, d)) if list.forall(strSide(_).isDefined) =>
              In(a, list.map(e => valueLit(d, a.dataType, strSide(e).get)))
            case _ => in
          }
        case c: Cast if c.dataType == StringType && enumSide(c.child).isDefined =>
          val (a, d) = enumSide(c.child).get
          decode(a, d)
        case t: graft.functions.ChToStringExpr if enumSide(t.child).isDefined =>
          val (a, d) = enumSide(t.child).get
          decode(a, d)
        // any/min/max over an enum keep the tag on their output so
        // the render layer still maps value → name
        case al: Alias if !al.metadata.contains(ChEnum.key) =>
          al.child match {
            case ae: AggregateExpression =>
              enumChildOf(ae.aggregateFunction) match {
                case Some((_, d)) =>
                  // merge with whatever the analyzer already tagged
                  // (e.g. __autoGeneratedAlias)
                  Alias(al.child, al.name)(al.exprId, al.qualifier,
                    Some(ChEnum.tag(al.metadata, d)), al.nonInheritableMetadataKeys)
                case None => al
              }
            case _ => al
          }
      }
    }
}
