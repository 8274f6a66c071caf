package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Sparse file index: prune a parquet relation's FILE LIST on the
  * driver using cached footer min/max before any task is scheduled —
  * the analog of the reference's in-RAM primary index
  * (MergeTreeData loads each part's `primary.idx` at startup and
  * PKCondition selects mark ranges without touching data,
  * dbms/src/Storages/MergeTree/PKCondition.cpp).
  *
  * Spark's own row-group pruning reaches the same stats, but only
  * AFTER scheduling one task per split: a 128-file table pays 128
  * task launches + footer opens per query even when the predicate
  * selects one file. On a PK-sorted layout (our hits table sorts by
  * (CounterID, EventDate); MergeTree tables sort by their key) a
  * selective predicate maps to a contiguous handful of files, and
  * pruning the listing itself removes both the tasks and the I/O —
  * at 10⁵ files (100 TB) this is the difference between a scheduler
  * storm and a driver map lookup.
  *
  * Conservative by construction: only conjuncts it fully understands
  * (=, <, <=, >, >=, IN over exact-stat fixed-width columns, both
  * operand orders, same-type literals) participate; a file is dropped
  * only when one such conjunct PROVES it empty (range disjoint, or
  * the column is all-null in that file — null never matches a
  * comparison). Unknown conjuncts, casts, inexact stats keep the
  * file. The rewritten relation preserves the original output
  * attributes, so the plan above is untouched.
  */
object FilePruning {

  /** Counter + last prune ratio for plan-shape tests. */
  @volatile private[graft] var applied = 0L
  @volatile private[graft] var lastKept: Int = -1
  @volatile private[graft] var lastTotal: Int = -1

  /** Below this many files the scheduler overhead is negligible. */
  private[graft] var minFiles = 8

  def maybeRewrite(spark: SparkSession, df: DataFrame): DataFrame =
    try {
      val plan = df.queryExecution.analyzed
      var changed = false
      val pruned = plan.transformUp {
        case f @ Filter(cond, child) =>
          stripAlias(child) match {
            case rel @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
                if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
              rewriteFilter(spark, cond, rel, fs) match {
                case Some(nf) => changed = true; nf
                case None => f
              }
            case _ => f
          }
      }
      if (changed) Bridge.ofRows(spark, pruned) else df
    } catch { case scala.util.control.NonFatal(_) => df }

  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case s: SubqueryAlias => stripAlias(s.child)
    case v: View => stripAlias(v.child)
    case other => other
  }

  // ---- predicate → per-file emptiness proof -------------------------

  /** Column types whose footer stats can be trusted (given a matching
    * parquet encoding, checked per-file via [[FooterStats.encodingOk]]).
    * Float/Double are deliberately excluded: writers skip or misorder
    * NaN in min/max while Spark orders NaN above every value, so a
    * file whose only matching rows are NaN could be wrongly pruned. */
  private def statType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Catalyst literal internal value → comparable double domain.
    * All supported types order correctly through double EXCEPT long
    * values beyond 2^53 — compared in the long domain instead. */
  private sealed trait Bound
  private case class LongB(v: Long) extends Bound
  private case class DoubleB(v: Double) extends Bound

  private def literalBound(v: Any): Option[Bound] = v match {
    case b: Byte => Some(LongB(b.toLong))
    case s: Short => Some(LongB(s.toLong))
    case i: Int => Some(LongB(i.toLong))
    case l: Long => Some(LongB(l))
    case f: Float => Some(DoubleB(f.toDouble))
    case d: Double => Some(DoubleB(d))
    case _ => None
  }

  private def statBound(v: Any): Option[Bound] = v match {
    case n: java.lang.Integer => Some(LongB(n.longValue))
    case n: java.lang.Long => Some(LongB(n.longValue))
    case n: java.lang.Float => Some(DoubleB(n.doubleValue))
    case n: java.lang.Double => Some(DoubleB(n.doubleValue))
    case _ => None
  }

  private def cmp(a: Bound, b: Bound): Int = (a, b) match {
    case (LongB(x), LongB(y)) => java.lang.Long.compare(x, y)
    case _ =>
      val x = a match { case LongB(v) => v.toDouble; case DoubleB(v) => v }
      val y = b match { case LongB(v) => v.toDouble; case DoubleB(v) => v }
      java.lang.Double.compare(x, y)
  }

  /** One understood conjunct: column + a test on its (min, max).
    * `dt` is the column's Catalyst type — min/max proofs require the
    * file's parquet encoding to match it exactly. */
  private sealed trait Test { def col: String; def dt: DataType }
  private case class EqTest(col: String, dt: DataType, v: Bound) extends Test
  private case class LtTest(col: String, dt: DataType, v: Bound, orEq: Boolean) extends Test
  private case class GtTest(col: String, dt: DataType, v: Bound, orEq: Boolean) extends Test
  private case class InTest(col: String, dt: DataType, vs: Seq[Bound]) extends Test

  private def attrOf(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference if statType(a.dataType) => Some(a)
    case _ => None
  }

  private def litOf(e: Expression, dt: DataType): Option[Bound] = e match {
    // analyzed plans carry Cast(lit)/foldable calls — fold them here
    // (the optimizer would, but the rewrite reads the analyzed plan)
    case e2 if e2.foldable && e2.dataType == dt && e2.deterministic =>
      Option(e2.eval(null)).flatMap(literalBound)
    case _ => None
  }

  private def tests(cond: Expression): Seq[Test] =
    splitConjuncts(cond).flatMap {
      case EqualTo(l, r) => eqTest(l, r).orElse(eqTest(r, l))
      case LessThan(l, r) => rangeTest(l, r, lt = true, orEq = false)
      case LessThanOrEqual(l, r) => rangeTest(l, r, lt = true, orEq = true)
      case GreaterThan(l, r) => rangeTest(l, r, lt = false, orEq = false)
      case GreaterThanOrEqual(l, r) => rangeTest(l, r, lt = false, orEq = true)
      case In(a, vs) => for {
        attr <- attrOf(a)
        bounds <- sequence(vs.map(litOf(_, attr.dataType)))
      } yield InTest(attr.name, attr.dataType, bounds)
      case _ => None
    }

  private def sequence[T](xs: Seq[Option[T]]): Option[Seq[T]] =
    if (xs.forall(_.isDefined)) Some(xs.flatten) else None

  private def eqTest(a: Expression, l: Expression): Option[Test] = for {
    attr <- attrOf(a)
    b <- litOf(l, attr.dataType)
  } yield EqTest(attr.name, attr.dataType, b)

  /** `l OP r` where OP is </<= (lt=true) or >/>= — either side may be
    * the column; flipping sides flips the test direction. */
  private def rangeTest(l: Expression, r: Expression,
      lt: Boolean, orEq: Boolean): Option[Test] =
    (attrOf(l), attrOf(r)) match {
      case (Some(attr), None) =>
        litOf(r, attr.dataType).map(b =>
          if (lt) LtTest(attr.name, attr.dataType, b, orEq)
          else GtTest(attr.name, attr.dataType, b, orEq))
      case (None, Some(attr)) =>
        litOf(l, attr.dataType).map(b =>
          if (lt) GtTest(attr.name, attr.dataType, b, orEq)
          else LtTest(attr.name, attr.dataType, b, orEq))
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** True when the file provably has NO row matching `t`. */
  private def provesEmpty(t: Test, st: FooterStats.FileStat): Boolean =
    st.cols.get(t.col) match {
      case Some(c) if c.exact =>
        if (!c.hasValues) true // all null: no comparison matches
        // min/max proofs additionally require the file's parquet
        // encoding to match the Catalyst type — a TIMESTAMP(MILLIS) or
        // unsigned-int writer's stats misorder against micros/signed
        // literals (the all-null proof above is encoding-independent)
        else if (!FooterStats.encodingOk(t.dt, c.enc)) false
        else (statBound(c.min), statBound(c.max)) match {
          case (Some(lo), Some(hi)) => t match {
            case EqTest(_, _, v) => cmp(v, lo) < 0 || cmp(v, hi) > 0
            case LtTest(_, _, v, orEq) => // col < v (or <=): empty if min >= v (or >)
              if (orEq) cmp(lo, v) > 0 else cmp(lo, v) >= 0
            case GtTest(_, _, v, orEq) =>
              if (orEq) cmp(hi, v) < 0 else cmp(hi, v) <= 0
            case InTest(_, _, vs) =>
              vs.forall(v => cmp(v, lo) < 0 || cmp(v, hi) > 0)
          }
          case _ => false
        }
      case _ => false
    }

  // ---- the rewrite ---------------------------------------------------

  private def rewriteFilter(spark: SparkSession,
      cond: Expression, rel: LogicalRelation,
      fs: HadoopFsRelation): Option[Filter] = {
    val partitioned = fs.partitionSchema.nonEmpty
    // partitioned relations (MergeTree month layout) rebuild with a
    // basePath so partition values keep deriving from the paths; a
    // multi-root partitioned listing is left alone
    if (partitioned && fs.location.rootPaths.length != 1) return None
    val files = fs.location.inputFiles
    if (files.length < minFiles) return None
    // partition columns live in PATHS, not footers — a footer lookup
    // would misread their absence as all-null and prune everything;
    // Spark's own partition pruning covers them already
    val dataCols = fs.dataSchema.fieldNames.toSet
    val ts = tests(cond).filter(t => dataCols.contains(t.col))
    if (ts.isEmpty) return None
    val wanted = ts.map(_.col).toSet
    val conf = spark.sessionState.newHadoopConf()
    val hfs = new Path(files.head).getFileSystem(conf)
    val stats = FooterStats.getAll(conf, hfs, files.toSeq, wanted)
    val kept = files.toSeq.zip(stats).collect {
      case (p, st) if !ts.exists(provesEmpty(_, st)) => p
    }
    if (kept.length >= files.length) return None
    // empty keep-set: retain one file — the filter still removes every
    // row, and the relation keeps a valid (non-empty) listing
    val keptFiles = if (kept.isEmpty) files.take(1).toSeq else kept
    lastKept = keptFiles.length; lastTotal = files.length
    // carry the original relation's read options (datetimeRebaseMode,
    // int96RebaseMode, …) so kept files decode identically — minus the
    // path keys, which conflict with the explicit .parquet(files) form
    val carried = fs.options.filter { case (k, _) =>
      val lk = k.toLowerCase; lk != "path" && lk != "paths" }
    val reader0 = spark.read.options(carried).schema(
      if (partitioned) org.apache.spark.sql.types.StructType(
        fs.dataSchema.fields ++ fs.partitionSchema.fields)
      else fs.dataSchema)
    val reader =
      if (partitioned)
        reader0.option("basePath", fs.location.rootPaths.head.toString)
      else reader0
    val newRel = reader.parquet(keptFiles: _*)
      .queryExecution.analyzed.collectFirst {
        case lr @ LogicalRelation(nfs: HadoopFsRelation, _, _, _, _)
            if nfs.fileFormat.isInstanceOf[ParquetFileFormat] => lr
      }.getOrElse(return None)
    // the rebuilt relation must line up column-for-column with the
    // original before the exprId-preserving output swap
    if (newRel.output.map(_.name) != rel.output.map(_.name)) return None
    applied += 1
    // preserve the ORIGINAL output attributes so cond and every plan
    // node above keep resolving against the same exprIds
    Some(Filter(cond, newRel.copy(output = rel.output)))
  }
}
