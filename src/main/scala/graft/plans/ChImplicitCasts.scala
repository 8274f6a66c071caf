package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Alias, ArrayExists, BinaryComparison, Cast, CaseWhen, CreateStruct, DateAdd, DateSub, EvalMode, Expression, If, In, LambdaFunction, NamedLambdaVariable, ScalarSubquery, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DateType, IntegerType, LongType, ShortType, StructType, TimestampType}

/** The reference's date arithmetic is plain integer arithmetic on the
  * underlying day / second counts (FunctionsArithmetic.h over
  * DataTypeDate=UInt16, DataTypeDateTime=UInt32): `date + n` shifts n
  * days, `datetime + n` shifts n seconds, for ANY integer width.
  * Spark resolves `date + int` to DateAdd but rejects a bigint shift
  * and has no timestamp+int form at all, so corpus queries like
  * `toDate('2000-01-01') + number` (number is Int64) fail analysis.
  * This resolution rule widens the seats:
  *
  *  - DateAdd/DateSub with a non-Int integral shift → cast shift to Int
  *  - timestamp ± integral → via epoch seconds (LEGACY long↔timestamp
  *    cast pair), returning DateTime like the reference
  */
object ChImplicitCasts extends Rule[LogicalPlan] {

  private def intCast(e: Expression): Expression = Cast(e, IntegerType)

  private def tsToLong(ts: Expression): Expression =
    Cast(ts, LongType, None, EvalMode.LEGACY)
  private def longToTs(e: Expression): Expression =
    Cast(e, TimestampType, None, EvalMode.LEGACY)

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def integral(e: Expression): Boolean =
    e.resolved && isIntegral(e.dataType)
  private def nonIntShift(e: Expression): Boolean =
    e.resolved && isIntegral(e.dataType) && e.dataType != IntegerType
  private def ts(e: Expression): Boolean =
    e.resolved && e.dataType == TimestampType
  private def date(e: Expression): Boolean =
    e.resolved && e.dataType == DateType

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp { case p =>
      // top-down so `NOT IN` over an array is seen before its inner IN
      p.transformExpressionsDown {
        case DateAdd(d, n) if nonIntShift(n) => DateAdd(d, intCast(n))
        case DateSub(d, n) if nonIntShift(n) => DateSub(d, intCast(n))
        // date + long arrives as Add when Spark's own date rewrite
        // doesn't fire (e.g. both sides non-foldable)
        case Add(d, n, _) if date(d) && nonIntShift(n) => DateAdd(d, intCast(n))
        case Add(n, d, _) if date(d) && nonIntShift(n) => DateAdd(d, intCast(n))
        case Subtract(d, n, _) if date(d) && nonIntShift(n) => DateSub(d, intCast(n))
        case Add(t, n, _) if ts(t) && integral(n) => longToTs(Add(tsToLong(t), n))
        case Add(n, t, _) if ts(t) && integral(n) => longToTs(Add(tsToLong(t), n))
        case Subtract(t, n, _) if ts(t) && integral(n) =>
          longToTs(Subtract(tsToLong(t), n))
        // DateTime − DateTime is the SECOND difference (Int), Date −
        // Date the DAY difference — never Spark's interval (corpus
        // 00192 `greatest(now(), now() + 10) - now()` = 10). Spark's
        // operator resolution may already have picked
        // SubtractTimestamps/SubtractDates — unwrap those too.
        case Subtract(a, b, _) if ts(a) && ts(b) =>
          Subtract(tsToLong(a), tsToLong(b))
        case Subtract(a, b, _) if date(a) && date(b) =>
          org.apache.spark.sql.catalyst.expressions.DateDiff(a, b)
        case st: org.apache.spark.sql.catalyst.expressions.SubtractTimestamps
            if ts(st.left) && integral(st.right) =>
          longToTs(Subtract(tsToLong(st.left), st.right))
        case st: org.apache.spark.sql.catalyst.expressions.SubtractTimestamps
            if ts(st.left) && ts(st.right) =>
          Subtract(tsToLong(st.left), tsToLong(st.right))
        case sd: org.apache.spark.sql.catalyst.expressions.SubtractDates
            if date(sd.left) && date(sd.right) =>
          org.apache.spark.sql.catalyst.expressions.DateDiff(sd.left, sd.right)

        // CH scalar subqueries may return several columns — the value
        // is then a tuple (ExpressionAnalyzer scalar subquery →
        // DataTypeTuple; corpus 00205). Spark requires one output
        // column, so project the outputs into a struct.
        case s: ScalarSubquery if s.plan.resolved && s.plan.output.length > 1 =>
          val tuple = Alias(CreateStruct(s.plan.output), "__tuple")()
          s.copy(plan = Project(Seq(tuple), s.plan))

        // CH tuples compare positionally; Spark structs unify by field
        // name, so same-shape tuples with different element names
        // (e.g. the two branches of `cond ? (a,b) : (c,d)`) fail to
        // type-merge. Cast every same-shape struct seat to the first
        // struct operand's type (corpus 00132/00346/00347).
        case i @ If(p, t, e) if structMismatch(t, e) =>
          If(p, t, Cast(e, t.dataType))
        case cw @ CaseWhen(branches, elseV)
            if unifyStruct(branches.map(_._2) ++ elseV).isDefined =>
          val ref = unifyStruct(branches.map(_._2) ++ elseV).get
          CaseWhen(
            branches.map { case (c, v) => (c, castIfShape(v, ref)) },
            elseV.map(castIfShape(_, ref)))
        case arr: org.apache.spark.sql.catalyst.expressions.CreateArray
            if unifyStruct(arr.children).isDefined &&
              arr.children.exists(c => structMismatch(unifyStructRef(arr.children), c)) =>
          arr.withNewChildren(
            arr.children.map(castIfShape(_, unifyStructRef(arr.children))))
        case c: BinaryComparison if structMismatch(c.left, c.right) =>
          c.withNewChildren(Seq(c.left, Cast(c.right, c.left.dataType)))
        // `(a,b) IN ((t1, t2, …))` — one parenthesized struct whose
        // fields are ALL tuples of the left arity is a membership
        // LIST of tuples, not a single value (corpus 00132)
        case In(v, Seq(x: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct))
            if v.resolved && x.resolved &&
            v.dataType.isInstanceOf[StructType] &&
            x.valExprs.nonEmpty &&
            x.valExprs.forall(c => c.dataType match {
              case ct: StructType =>
                ct.length == v.dataType.asInstanceOf[StructType].length
              case _ => false
            }) =>
          In(v, x.valExprs.map(c =>
            if (c.dataType == v.dataType) c else Cast(c, v.dataType)))
        case In(v, list) if v.resolved && v.dataType.isInstanceOf[StructType] &&
            list.nonEmpty &&
            list.forall(x => x.resolved && x.dataType.isInstanceOf[StructType] &&
              x.dataType.asInstanceOf[StructType].length ==
                v.dataType.asInstanceOf[StructType].length) &&
            list.exists(_.dataType != v.dataType) =>
          In(v, list.map(x =>
            if (x.dataType == v.dataType) x else Cast(x, v.dataType)))
        // `(a,b,c) IN (1,2,3)` — a flat RHS of matching arity (not
        // itself a list of same-arity tuples) is ONE tuple in the
        // reference, not a membership list
        case In(v, list) if v.resolved && v.dataType.isInstanceOf[StructType] &&
            list.nonEmpty && list.forall(_.resolved) &&
            list.length == v.dataType.asInstanceOf[StructType].length &&
            !list.forall(_.dataType match {
              case ct: StructType =>
                ct.length == v.dataType.asInstanceOf[StructType].length
              case _ => false
            }) &&
            list.exists(x => !x.dataType.isInstanceOf[StructType]) =>
          org.apache.spark.sql.catalyst.expressions.EqualTo(
            v, Cast(CreateStruct(list), v.dataType))
        // `(a,b) IN (SELECT one-tuple-column)` — the reference
        // compares the left tuple against the subquery's tuple rows;
        // Spark wants as many output columns as left values, so
        // project the struct column's fields out (corpus 00132)
        case isq @ org.apache.spark.sql.catalyst.expressions.InSubquery(
            values, lq: org.apache.spark.sql.catalyst.expressions.ListQuery)
            if lq.plan.resolved && lq.plan.output.length == 1 &&
              values.forall(_.resolved) &&
              (lq.plan.output.head.dataType match {
                case st: StructType =>
                  st.length > 1 && st.length == values.map(v => v.dataType match {
                    case vt: StructType if values.length == 1 => vt.length
                    case _ => 1
                  }).sum
                case _ => false
              }) =>
          val out = lq.plan.output.head
          val st = out.dataType.asInstanceOf[StructType]
          val fields = st.fields.zipWithIndex.map { case (f, i) =>
            Alias(org.apache.spark.sql.catalyst.expressions.GetStructField(
              out, i, Some(f.name)), f.name)()
          }
          val p2 = Project(fields.toSeq, lq.plan)
          isq.copy(query = lq.copy(plan = p2, numCols = p2.output.length))

        // has(array-of-tuples, tuple) with positional-name drift
        case ac @ org.apache.spark.sql.catalyst.expressions.ArrayContains(arr, v)
            if arr.resolved && v.resolved &&
              (arr.dataType match {
                case ArrayType(et: StructType, _) => v.dataType match {
                  case vt: StructType => et != vt && et.length == vt.length
                  case _ => false
                }
                case _ => false
              }) =>
          ac.withNewChildren(Seq(arr,
            Cast(v, arr.dataType.asInstanceOf[ArrayType].elementType)))

        // CH `array IN set` is element-wise: true when any element is
        // in the set; `array NOT IN set` when any element is NOT in
        // it (corpus 00132)
        case org.apache.spark.sql.catalyst.expressions.Not(In(arr, list))
            if arr.resolved && arr.dataType.isInstanceOf[ArrayType] &&
            list.forall(x => x.resolved && !x.dataType.isInstanceOf[ArrayType]) =>
          val et = arr.dataType.asInstanceOf[ArrayType]
          val lv = NamedLambdaVariable("__el", et.elementType, et.containsNull)
          ArrayExists(arr, LambdaFunction(
            org.apache.spark.sql.catalyst.expressions.Not(In(lv, list)), Seq(lv)))
        case In(arr, list) if arr.resolved && arr.dataType.isInstanceOf[ArrayType] &&
            list.forall(x => x.resolved && !x.dataType.isInstanceOf[ArrayType]) =>
          val et = arr.dataType.asInstanceOf[ArrayType]
          val lv = NamedLambdaVariable("__el", et.elementType, et.containsNull)
          ArrayExists(arr, LambdaFunction(In(lv, list), Seq(lv)))
      }
    }

  /** Both sides resolved structs of the same arity with differing
    * types (field names or widths) — the positional-tuple seats the
    * reference unifies and Spark doesn't. */
  private def structMismatch(l: Expression, r: Expression): Boolean =
    l.resolved && r.resolved && ((l.dataType, r.dataType) match {
      case (a: StructType, b: StructType) =>
        a != b && a.length == b.length
      case _ => false
    })

  /** First struct-typed value among the seats, when at least one other
    * same-arity seat disagrees with it. */
  private def unifyStructRef(values: Seq[Expression]): Expression =
    values.find(v => v.resolved && v.dataType.isInstanceOf[StructType]).get
  private def unifyStruct(values: Seq[Expression]): Option[Expression] = {
    val structs = values.filter(v => v.resolved && v.dataType.isInstanceOf[StructType])
    structs.headOption.filter(ref => structs.exists(structMismatch(ref, _)))
  }

  private def castIfShape(v: Expression, ref: Expression): Expression =
    if (structMismatch(ref, v)) Cast(v, ref.dataType) else v
}
