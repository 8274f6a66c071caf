package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

/** Metadata-only aggregates: `count()`, `min(col)`, `max(col)` over an
  * unfiltered parquet relation answer from the file footers instead of
  * scanning — the reference serves `SELECT count() FROM t` from part
  * metadata without touching a single column
  * (dbms/src/Storages/StorageMergeTree counts via part index sizes),
  * and Spark itself does the same under DSv2 aggregate push-down
  * (ParquetScanBuilder.pushAggregation). The dialect path reads
  * through v1 relations, so this applies the identical optimization
  * one level up.
  *
  * Scope is strictly what footer statistics answer EXACTLY:
  *   - count(*) / count(1): sum of row-group row counts;
  *   - min/max over fixed-width types (int/long/short/byte/float/
  *     double/date/timestamp-micros) where parquet stats are exact —
  *     strings/binary are excluded because their stats may be
  *     truncated;
  *   - no WHERE, no GROUP BY, no DISTINCT.
  * Any row group lacking exact stats aborts the rewrite (falls back
  * to the scan). Footers are cached by (path, size, mtime), so a
  * repeated aggregate is a driver-side map lookup.
  *
  * At 100 TB this turns "schedule 10⁵ tasks to read 10⁵ footers" into
  * one driver loop per cold file — and nothing at all when warm.
  */
object MetadataAggregate {

  /** Counter for plan-shape tests: number of rewrites applied. */
  @volatile private[graft] var applied = 0L

  def maybeRewrite(spark: SparkSession, df: DataFrame): Option[DataFrame] =
    try rewrite(spark, df)
    catch { case scala.util.control.NonFatal(_) => None }

  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case s: SubqueryAlias => stripAlias(s.child)
    case v: View => stripAlias(v.child)
    case other => other
  }

  /** Types whose footer stats can be trusted (given a matching parquet
    * encoding, verified per-file in [[evaluate]]). Float/Double are
    * deliberately excluded: writers skip or misorder NaN in min/max
    * while Spark orders NaN above every value, so a footer max can
    * disagree with the scan's answer. */
  private def exactStatType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private sealed trait Spec
  private case object CountAll extends Spec
  private case class MinOf(col: String, dt: DataType) extends Spec
  private case class MaxOf(col: String, dt: DataType) extends Spec

  private def rewrite(spark: SparkSession, df: DataFrame): Option[DataFrame] = {
    val plan = df.queryExecution.analyzed
    plan match {
      // two global-aggregate spellings: bare (Spark semantics, one
      // row even on empty input) and the dialect's GROUP BY '__all'
      // constant (reference semantics, empty input -> empty result)
      case Aggregate(groups, aggs, child, _)
          if groups.isEmpty ||
            (groups.lengthCompare(1) == 0 &&
              groups.head.isInstanceOf[Literal]) =>
        val emptyInEmptyOut = groups.nonEmpty
        stripAlias(child) match {
          case LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
              if fs.fileFormat.isInstanceOf[ParquetFileFormat] &&
                fs.partitionSchema.isEmpty =>
            val specs: Option[Seq[(Spec, String, DataType)]] =
              traverseAggs(aggs)
            specs.flatMap(evaluate(spark, fs, _, emptyInEmptyOut))
          case _ => None
        }
      case _ => None
    }
  }

  /** The dialect wraps aggregate args in identity coercions for
    * non-boolean inputs; min/max stats see through them. */
  private def unwrapIdentity(e: Expression): Expression = e match {
    case graft.functions.BoolToUInt8(c)
        if c.dataType != BooleanType => unwrapIdentity(c)
    case other => other
  }

  private def traverseAggs(aggs: Seq[NamedExpression])
      : Option[Seq[(Spec, String, DataType)]] = {
    val out = aggs.map {
      case a @ Alias(AggregateExpression(fn, _, false, None, _), name) =>
        fn match {
          case Count(Seq(Literal(_, _))) => Some((CountAll, name, LongType))
          case Min(e) => unwrapIdentity(e) match {
            case attr: AttributeReference if exactStatType(attr.dataType) =>
              Some((MinOf(attr.name, attr.dataType), name, a.dataType))
            case _ => None
          }
          case Max(e) => unwrapIdentity(e) match {
            case attr: AttributeReference if exactStatType(attr.dataType) =>
              Some((MaxOf(attr.name, attr.dataType), name, a.dataType))
            case _ => None
          }
          case _ => None
        }
      case _ => None
    }
    if (out.forall(_.isDefined)) Some(out.flatten) else None
  }

  /** Physical parquet value → Catalyst external value of `dt`. */
  private def toExternal(v: Any, dt: DataType): Any = dt match {
    case ByteType => v.asInstanceOf[Number].byteValue()
    case ShortType => v.asInstanceOf[Number].shortValue()
    case IntegerType => v.asInstanceOf[Number].intValue()
    case LongType => v.asInstanceOf[Number].longValue()
    case FloatType => v.asInstanceOf[Number].floatValue()
    case DoubleType => v.asInstanceOf[Number].doubleValue()
    case DateType =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
        v.asInstanceOf[Number].longValue()))
    case TimestampType =>
      java.sql.Timestamp.from(java.time.Instant.EPOCH.plus(
        v.asInstanceOf[Number].longValue(), java.time.temporal.ChronoUnit.MICROS))
    case TimestampNTZType =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(v.asInstanceOf[Number].longValue(), 1000000L),
        (Math.floorMod(v.asInstanceOf[Number].longValue(), 1000000L) * 1000).toInt,
        java.time.ZoneOffset.UTC)
    case _ => v
  }

  private def evaluate(spark: SparkSession, fs: HadoopFsRelation,
      specs: Seq[(Spec, String, DataType)],
      emptyInEmptyOut: Boolean): Option[DataFrame] = {
    val wanted = specs.collect {
      case (MinOf(c, _), _, _) => c
      case (MaxOf(c, _), _, _) => c
    }.toSet
    val conf = spark.sessionState.newHadoopConf()
    val files = fs.location.inputFiles
    if (files.isEmpty) return None
    val hfs = new Path(files.head).getFileSystem(conf)
    // cold footers read in parallel — a large table is O(10^4) files
    // and a serial driver loop would undo the optimization's point
    val stats = FooterStats.getAll(conf, hfs, files.toSeq, wanted)
    // this rewrite needs EXACT stats for every requested column AND a
    // parquet encoding matching the Catalyst type it answers for — a
    // TIMESTAMP(MILLIS) or unsigned-int writer's stats are off by
    // scale/sign; anything untrustworthy falls back to the scan
    // (all-null files contribute nothing, so their encoding is moot)
    val dtOf: Map[String, DataType] = specs.collect {
      case (MinOf(c, dt), _, _) => c -> dt
      case (MaxOf(c, dt), _, _) => c -> dt
    }.toMap
    if (stats.exists(_.cols.exists { case (n, c) =>
      wanted(n) && (!c.exact ||
        (c.hasValues && !FooterStats.encodingOk(dtOf(n), c.enc)))
    })) return None
    val totalRows = stats.map(_.rows).sum
    val schema0 = StructType(specs.map { case (_, name, dt) =>
      StructField(name, dt, nullable = true)
    })
    if (totalRows == 0 && emptyInEmptyOut) {
      applied += 1
      return Some(spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema0))
    }
    val values: Seq[Any] = specs.map {
      case (CountAll, _, _) => totalRows
      case (MinOf(c, dt), _, _) =>
        val vs = stats.flatMap(s => s.cols.get(c).filter(_.hasValues).map(_.min))
        if (vs.isEmpty) null
        else toExternal(vs.reduce((a, b) =>
          if (a.asInstanceOf[Comparable[Any]].compareTo(b) <= 0) a else b), dt)
      case (MaxOf(c, dt), _, _) =>
        val vs = stats.flatMap(s => s.cols.get(c).filter(_.hasValues).map(_.max))
        if (vs.isEmpty) null
        else toExternal(vs.reduce((a, b) =>
          if (a.asInstanceOf[Comparable[Any]].compareTo(b) >= 0) a else b), dt)
    }
    applied += 1
    Some(spark.createDataFrame(
      java.util.Collections.singletonList(Row.fromSeq(values)), schema0))
  }
}
