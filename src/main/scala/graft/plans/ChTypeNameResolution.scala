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

  override def apply(plan: LogicalPlan): LogicalPlan = {
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
          else so
        }
        if (newOrder == s.order) s else s.copy(order = newOrder)
    }.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case t @ ToTypeName(c) if c.resolved =>
          Literal.create(ChTypeInfer.name(c),
            org.apache.spark.sql.types.StringType)
        case al @ Alias(c, n) if uint64Producer(c) &&
            al.explicitMetadata.isEmpty =>
          Alias(c, n)(al.exprId, al.qualifier,
            Some(new org.apache.spark.sql.types.MetadataBuilder()
              .putString(ChTypeInfer.MetaKey, "UInt64").build()),
            al.nonInheritableMetadataKeys)
      }
    }
    // AttributeReferences created BEFORE the alias was tagged carry a
    // stale (empty) metadata snapshot — refresh them by exprId so the
    // UInt64 mark survives joins/aggregates to the output schema
    val ids = p1.collect { case pl =>
      pl.expressions.flatMap(_.collect {
        case al: Alias if al.explicitMetadata
            .exists(_.contains(ChTypeInfer.MetaKey)) => al.exprId
      })
    }.flatten.toSet
    if (ids.isEmpty) p1
    else p1.resolveOperatorsUp { case pl =>
      pl.transformExpressionsUp {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
            if ids.contains(a.exprId) &&
              !a.metadata.contains(ChTypeInfer.MetaKey) =>
          a.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(a.metadata)
            .putString(ChTypeInfer.MetaKey, "UInt64").build())(
            a.exprId, a.qualifier)
      }
    }
  }
}
