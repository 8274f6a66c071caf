package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.ToTypeName
import graft.types.ChTypeInfer

/** Folds `toTypeName(e)` to its reference-spelled name during
  * ANALYSIS — while the [[graft.functions.ChTypeTag]] markers
  * are still in the tree (the
  * optimizer's ReplaceExpressions erases them; the tags carry UInt
  * and declared-CAST type names). Fires once the
  * argument is fully resolved; a ToTypeName that somehow survives
  * analysis still folds via its own RuntimeReplaceable fallback
  * (Spark-derived spelling). */
object ChTypeNameResolution extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, Expression}

  /** Expressions whose Long output is the reference's UInt64 — their
    * DECIMAL rendering must be unsigned (FunctionsHashing.h hash64
    * family; the TSV writer prints 10577349846663553072, not the
    * wrapped negative). */
  private def uint64Producer(e: Expression): Boolean = e match {
    case k: graft.functions.KernelExpr =>
      Set("inthash64", "cityhash64", "farmhash64", "metrohash64",
        "urlhash", "halfmd5")(k.kernel)
    case _: graft.functions.SipHash64Expr => true
    case _: graft.functions.ChMultiHash64 => true
    // re-aliasing chains: a tagged attribute, or a join-fill wrapper
    // (coalesce / conditional) over one, stays UInt64
    case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
      a.metadata.contains(ChTypeInfer.MetaKey) &&
        a.metadata.getString(ChTypeInfer.MetaKey).startsWith("UInt64")
    case c: org.apache.spark.sql.catalyst.expressions.Coalesce =>
      c.children.exists(uint64Producer)
    case i: org.apache.spark.sql.catalyst.expressions.If =>
      uint64Producer(i.trueValue) || uint64Producer(i.falseValue)
    case _ => false
  }

  /** Struct argument → variadic key over its fields. */
  private def structKey(c: Expression): graft.functions.UniqVariadicKeyExpr = c match {
    case cs: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct =>
      graft.functions.UniqVariadicKeyExpr(cs.valExprs, Nil)
    case other =>
      val st = other.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      graft.functions.UniqVariadicKeyExpr(
        st.fields.indices.map(i =>
          org.apache.spark.sql.catalyst.expressions.GetStructField(other, i)).toSeq,
        Nil)
  }

  /** getDataAt byte width of an argument under its DECLARED CH type
    * (-1 = string/raw bytes). */
  private def chWidth(e: Expression): Int = {
    import org.apache.spark.sql.types._
    val byBase = ChTypeInfer.infer(e).map(_.base).flatMap {
      case "UInt8" | "Int8" => Some(1)
      case "UInt16" | "Int16" | "Date" => Some(2)
      case "UInt32" | "Int32" | "Float32" | "DateTime" => Some(4)
      case "UInt64" | "Int64" | "Float64" => Some(8)
      case "String" => Some(-1)
      case _ => None
    }
    byBase.getOrElse(e.dataType match {
      case ByteType => 1
      case ShortType => 2
      case IntegerType => 4
      case LongType => 8
      case FloatType => 4
      case DoubleType => 8
      case DateType => 2
      case _: TimestampType | TimestampNTZType => 4
      case StringType | BinaryType => -1
      case _ => 8
    })
  }

  /** exprId → CH type for every resolved Alias in the plan (and its
    * subquery plans), built bottom-up so later aliases see earlier
    * ones. Lets [[ChTypeInfer.infer]] type an attribute by its
    * DEFINING expression — e.g. system.numbers' `number` via the
    * ch_type_tag the rewrite plants — instead of by column name. */
  private def aliasScope(plan: LogicalPlan): Map[Long, ChTypeInfer.T] = {
    val m = scala.collection.mutable.Map.empty[Long, ChTypeInfer.T]
    def walk(p: LogicalPlan): Unit = {
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
      // explode/posexplode outputs carry the array's ELEMENT type
      // (arrayJoin of an Array(UInt8) literal is UInt8 — corpus 00397
      // prints it in the TSVWithNamesAndTypes header)
      p match {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate
            if g.resolved =>
          val arrChild = g.generator match {
            case e: org.apache.spark.sql.catalyst.expressions.Explode => Some(e.child)
            case e: org.apache.spark.sql.catalyst.expressions.PosExplode => Some(e.child)
            case _ => None
          }
          arrChild.foreach { c =>
            ChTypeInfer.withScope(m.toMap)(ChTypeInfer.infer(c)).foreach { t =>
              if (t.base.startsWith("Array(") && t.base.endsWith(")"))
                g.generatorOutput.lastOption.foreach(a =>
                  m(a.exprId.id) = graft.types.ChTypeInfer.T(
                    t.base.stripPrefix("Array(").stripSuffix(")"),
                    nullable = false))
            }
          }
        case _ => ()
      }
      p.expressions.foreach(_.foreach {
        case al: Alias if al.resolved && !m.contains(al.exprId.id) =>
          ChTypeInfer.withScope(m.toMap)(ChTypeInfer.infer(al.child))
            .foreach(t => m(al.exprId.id) = t)
        case _ => ()
      })
    }
    walk(plan)
    m.toMap
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    ChTypeInfer.withScope(aliasScope(plan))(applyScoped(plan))

  private def applyScoped(plan: LogicalPlan): LogicalPlan = {
    val p1 = plan.resolveOperatorsUp {
      // a sort key that is reference-UInt64 (stored in LongType with
      // wraparound) orders UNSIGNED: flipping the sign bit converts
      // unsigned order to the executor's signed comparator — exactly
      // the reference's UInt64 ORDER BY (corpus 00110 sorts by
      // number * 1234567890123456789, a wrapped product). Same-sign
      // inputs order identically, so untagged non-negative keys are
      // unaffected.
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort =>
        val newOrder = s.order.map { so =>
          if (so.resolved &&
              so.child.dataType == org.apache.spark.sql.types.LongType &&
              ChTypeInfer.infer(so.child)
                .exists(t => t.base == "UInt64" && !t.nullable))
            so.copy(child = org.apache.spark.sql.catalyst.expressions
              .BitwiseXor(so.child, Literal(Long.MinValue)))
          else if (!so.resolved) so
          else so.child.dataType match {
            // NULL elements INSIDE an array sort key compare as the
            // GREATEST value in the reference (same rule as top-level
            // NULLS LAST — getLeastSupertype/sortBlock null_direction);
            // Spark's array comparator puts nulls first. Lift each
            // element to (isNull, value): the flag dominates, so nulls
            // land last ascending / first descending, and the struct's
            // lexicographic array compare keeps everything else same.
            case at: org.apache.spark.sql.types.ArrayType
                if so.resolved && at.containsNull &&
                  !at.elementType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
                  org.apache.spark.sql.catalyst.expressions.RowOrdering
                    .isOrderable(at.elementType) =>
              import org.apache.spark.sql.catalyst.expressions._
              val lv = NamedLambdaVariable("__e", at.elementType, nullable = true)
              so.copy(child = ArrayTransform(so.child,
                LambdaFunction(
                  CreateNamedStruct(Seq(
                    Literal("n"), IsNull(lv), Literal("v"), lv)),
                  Seq(lv))))
            case _ => so
          }
        }
        if (newOrder == s.order) s else s.copy(order = newOrder)
    }.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        // IN (SELECT …): the reference's Set::insertFromBlock SKIPS
        // rows containing NULL when building the set, so `2 IN
        // {1, NULL, 3}` is 0, not SQL's three-valued NULL (corpus
        // 00441). Filter the subquery on all-outputs-not-null; NOT IN
        // gets the ordinary complement for the same reason.
        case in @ org.apache.spark.sql.catalyst.expressions.InSubquery(
            _, lq: org.apache.spark.sql.catalyst.expressions.ListQuery)
            if lq.plan.resolved && lq.plan.output.exists(_.nullable) &&
              !lq.plan.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter] =>
          val cond = lq.plan.output
            .map(o => org.apache.spark.sql.catalyst.expressions.IsNotNull(o): Expression)
            .reduce(org.apache.spark.sql.catalyst.expressions.And)
          val filtered = in.copy(query = lq.copy(plan =
            org.apache.spark.sql.catalyst.plans.logical.Filter(cond, lq.plan)))
          // a NULL scalar needle still yields NULL (the reference's
          // three-valued outer compare survives; only the SET drops
          // nulls) — Spark's ExistenceJoin rewrite would say false.
          // A null-component TUPLE needle is plain 0 in the reference.
          in.values match {
            case Seq(v) if v.nullable =>
              org.apache.spark.sql.catalyst.expressions.If(
                org.apache.spark.sql.catalyst.expressions.IsNull(v),
                Literal.create(null, org.apache.spark.sql.types.BooleanType),
                filtered)
            case _ => filtered
          }
        // multi-argument uniq family: a struct argument unpacks into
        // the variadic key; widths resolve from declared CH types
        // while tags are visible (UniqVariadicHash.h getDataAt width)
        case u: graft.functions.UniqHLL12
            if !u.trivial && u.child.resolved &&
              u.child.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
          u.copy(child = structKey(u.child), trivial = true)
        case u: graft.functions.UniqCombined
            if !u.variadic && u.child.resolved &&
              u.child.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
          u.copy(child = structKey(u.child), variadic = true)
        // `%` over a reference-UInt64 left side divides UNSIGNED —
        // wrapped products stay in the UInt64 ring
        // ((number + K1) * K2 % 131, corpus 00264's shard key)
        case r @ org.apache.spark.sql.catalyst.expressions.Remainder(a, b, _)
            if r.resolved && r.dataType == org.apache.spark.sql.types.LongType &&
              ChTypeInfer.infer(a).exists(t => t.base == "UInt64" && !t.nullable) &&
              !a.isInstanceOf[org.apache.spark.sql.catalyst.expressions.AttributeReference] =>
          val si = org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
            classOf[java.lang.Long], org.apache.spark.sql.types.LongType,
            "remainderUnsigned",
            Seq(a, org.apache.spark.sql.catalyst.expressions.Cast(
              b, org.apache.spark.sql.types.LongType)),
            Seq(org.apache.spark.sql.types.LongType,
              org.apache.spark.sql.types.LongType),
            returnNullable = false)
          // keep the modulo's CH type visible (the rewrite would
          // otherwise erase it and downstream width/render inference
          // falls back to the Long storage)
          ChTypeInfer.infer(r) match {
            case Some(t) => graft.functions.ChTypeTag(si, t.render)
            case None => si
          }
        // carry the DECLARED/inferred CH type across Project
        // boundaries as alias metadata: downstream attributes keep
        // the unsigned/width identity their Spark storage erases
        // (variadic uniq widths, UInt64 rendering/ordering)
        // attribute children participate too when the SCOPE knows
        // their defining type (a lateral-view output re-aliased at
        // the top — corpus 00397's arrayJoin AS arr header)
        case al @ Alias(c, n) if al.explicitMetadata.isEmpty && c.resolved &&
            (!c.isInstanceOf[org.apache.spark.sql.catalyst.expressions.AttributeReference] ||
              !c.asInstanceOf[org.apache.spark.sql.catalyst.expressions.AttributeReference]
                .metadata.contains(ChTypeInfer.MetaKey)) && {
              uint64Producer(c) || ChTypeInfer.infer(c).exists(t =>
                t.render != graft.types.ChTypes.toChName(c.dataType, c.nullable))
            } =>
          val chName =
            if (uint64Producer(c)) "UInt64"
            else ChTypeInfer.infer(c).get.render
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
            .putString(ChTypeInfer.MetaKey, chName)
          // an enum CAST result keeps Enum identity (right alignment,
          // DESCRIBE name) through the same metadata channel
          val meta = c match {
            case ec: graft.functions.ChEnumCast =>
              graft.types.ChEnum.tag(mb.build(), ec.enumDef)
            case _ => mb.build()
          }
          Alias(c, n)(al.exprId, al.qualifier, Some(meta),
            al.nonInheritableMetadataKeys)
      }
    }
    // AttributeReferences created BEFORE the alias was tagged carry a
    // stale (empty) metadata snapshot — refresh them by exprId so the
    // UInt64 mark survives joins/aggregates to the output schema
    val tags: Map[org.apache.spark.sql.catalyst.expressions.ExprId, String] =
      p1.collect { case pl =>
        pl.expressions.flatMap(_.collect {
          case al: Alias if al.explicitMetadata
              .exists(_.contains(ChTypeInfer.MetaKey)) =>
            al.exprId -> al.explicitMetadata.get.getString(ChTypeInfer.MetaKey)
        })
      }.flatten.toMap
    val p2 =
      if (tags.isEmpty) p1
      else p1.resolveOperatorsUp { case pl =>
        pl.transformExpressionsUp {
          case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
              if tags.contains(a.exprId) &&
                !a.metadata.contains(ChTypeInfer.MetaKey) =>
            a.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(a.metadata)
              .putString(ChTypeInfer.MetaKey, tags(a.exprId)).build())(
              a.exprId, a.qualifier)
        }
      }
    // variadic uniq widths resolve LAST — after attribute metadata is
    // refreshed, so a `number % 10 AS x` subquery alias reads back as
    // UInt8 (1 byte) rather than its widened Long storage
    p2.resolveOperatorsUp { case pl =>
      pl.transformExpressionsUp {
        case k: graft.functions.UniqVariadicKeyExpr
            if k.widths.isEmpty && k.childrenResolved =>
          k.copy(widths = k.children.map(chWidth))
        // fold toTypeName LAST — after attribute metadata refresh, so
        // a same-SELECT sibling alias (`1 AS x, toTypeName(least(x,…))`)
        // reads the tagged CH type, not the widened storage; a
        // still-unrewritten lateral alias reference defers the fold to
        // a later fixed-point iteration (corpus 00192)
        case t @ ToTypeName(c) if c.resolved && !c.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.LateralColumnAliasReference]) =>
          Literal.create(ChTypeInfer.name(c),
            org.apache.spark.sql.types.StringType)
        // finalizeAggregation over a bare uniq-family state column:
        // the state is the distinct set, the finalized value its SIZE
        // (corpus 00334); every other state finalizes as the identity
        // (the marker's RuntimeReplaceable default)
        // unsigned Float64 view of a tagged UInt64 Long (corpus 00232)
        case u @ graft.functions.ChUnsignedToDouble(c)
            if c.resolved && c.dataType == org.apache.spark.sql.types.LongType &&
              ChTypeInfer.infer(c).exists(t => t.base == "UInt64" && !t.nullable) => {
          import org.apache.spark.sql.catalyst.expressions._
          val d = Cast(c, org.apache.spark.sql.types.DoubleType)
          If(LessThan(c, Literal(0L)),
            Add(d, Literal(1.8446744073709552e19)), d)
        }
        // plain uniq state is the serialized sketch → decode+estimate;
        // the exact-set spellings (uniqExact/HLL12/Combined arrays)
        // finalize as the set's SIZE
        case f @ graft.functions.FinalizeAggregation(c)
            if c.resolved && c.dataType == org.apache.spark.sql.types.BinaryType &&
              ChTypeInfer.infer(c).exists(t =>
                t.base.startsWith("AggregateFunction(uniq,")) =>
          graft.functions.UniqStateFinalize(c)
        case f @ graft.functions.FinalizeAggregation(c)
            if c.resolved && ChTypeInfer.infer(c).exists(t =>
              t.base.startsWith("AggregateFunction(uniq") &&
                !t.base.startsWith("AggregateFunction(uniq,") &&
                !t.base.startsWith("AggregateFunction(uniqUpTo")) =>
          org.apache.spark.sql.catalyst.expressions.Cast(
            org.apache.spark.sql.catalyst.expressions.Size(c),
            org.apache.spark.sql.types.LongType)
      }
    }
  }
}
