package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.FileStatus
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.spark.sql.types._

/** Driver-side parquet footer statistics, shared by the metadata-only
  * aggregate ([[MetadataAggregate]]) and the sparse file index
  * ([[FilePruning]]) — the in-memory analog of the reference's
  * primary-index `.idx` files, which live in RAM per part
  * (MergeTreeData loads them at startup; PKCondition consults them
  * without touching data).
  *
  * One entry per (path, size, mtime): total row count and per-column
  * min/max merged over row groups. A column is `exact` only when
  * every row group either carried usable statistics or was all-null —
  * consumers must check it before trusting min/max or emptiness.
  * Entries are LRU-bounded and merge newly requested columns into the
  * cached map, so repeated queries over the same immutable files do
  * no I/O.
  */
object FooterStats {

  /** Per-column summary over all row groups of one file.
    * `exact`: every row group had trustworthy stats (or was all-null).
    * `hasValues`: at least one non-null value exists (min/max set).
    * `enc`: the column's physical+logical parquet encoding (see
    * [[encOf]]) — consumers must verify it matches the Catalyst type
    * they are answering for via [[encodingOk]], or a TIMESTAMP(MILLIS)
    * / unsigned-int / INT96 writer silently misorders stats. */
  final case class ColStat(min: Any, max: Any, hasValues: Boolean,
      exact: Boolean, enc: String)
  final case class FileStat(rows: Long, cols: Map[String, ColStat])

  /** Compact tag for the parquet encodings whose footer min/max are
    * EXACT and order-compatible with the matching Catalyst type.
    * Anything else — TIMESTAMP MILLIS/NANOS, INT96, unsigned ints,
    * decimals, strings (truncatable stats), floats/doubles (NaN is
    * skipped or misordered by writers, and Spark orders NaN above all
    * values) — tags "other" and is never trusted. */
  private[graft] def encOf(pt: PrimitiveType): String = {
    import PrimitiveType.PrimitiveTypeName._
    val ann = pt.getLogicalTypeAnnotation
    pt.getPrimitiveTypeName match {
      case INT32 => ann match {
        case null => "i32"
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
            if i.isSigned && i.getBitWidth <= 32 => "i32"
        case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => "date"
        case _ => "other"
      }
      case INT64 => ann match {
        case null => "i64"
        case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation
            if i.isSigned && i.getBitWidth == 64 => "i64"
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
            if t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS => "ts_micros"
        case _ => "other"
      }
      case _ => "other"
    }
  }

  /** True when a footer stat tagged `enc` is exact and order-compatible
    * with Catalyst type `dt`. Floats/doubles are deliberately ABSENT:
    * parquet writers skip or misorder NaN in min/max while Spark orders
    * NaN above every value, so a footer max can disagree with a scan. */
  def encodingOk(dt: DataType, enc: String): Boolean = dt match {
    case ByteType | ShortType | IntegerType => enc == "i32"
    case LongType => enc == "i64"
    case DateType => enc == "date"
    // UTC-adjustment doesn't change the stored micros value or order
    case TimestampType | TimestampNTZType => enc == "ts_micros"
    case _ => false
  }

  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Long, Long), FileStat](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long), FileStat]): Boolean =
        size() > 8192
    })

  /** Stats for one file covering at least `wanted` columns. */
  def get(conf: Configuration, f: FileStatus,
      wanted: Set[String]): FileStat = {
    val key = (f.getPath.toString, f.getLen, f.getModificationTime)
    val hit = cache.get(key)
    if (hit != null && wanted.subsetOf(hit.cols.keySet)) return hit
    val need = if (hit == null) wanted else wanted -- hit.cols.keySet
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
    try {
      val blocks = reader.getFooter.getBlocks
      var rows = 0L
      val mins = scala.collection.mutable.Map[String, Any]()
      val maxs = scala.collection.mutable.Map[String, Any]()
      val seen = scala.collection.mutable.Map[String, Boolean]()
      val bad = scala.collection.mutable.Set[String]()
      val encs = scala.collection.mutable.Map[String, String]()
      val it = blocks.iterator()
      while (it.hasNext) {
        val b = it.next()
        rows += b.getRowCount
        val cit = b.getColumns.iterator()
        while (cit.hasNext) {
          val c = cit.next()
          val name = c.getPath.toDotString
          if (need.contains(name) && !bad.contains(name)) {
            if (!encs.contains(name)) encs(name) = encOf(c.getPrimitiveType)
            val st = c.getStatistics
            if (st == null || st.isEmpty) {
              if (b.getRowCount > 0) bad += name
            } else if (st.hasNonNullValue) {
              val lo = st.genericGetMin.asInstanceOf[Comparable[Any]]
              val hi = st.genericGetMax.asInstanceOf[Comparable[Any]]
              if (!seen.getOrElse(name, false)) {
                mins(name) = lo; maxs(name) = hi; seen(name) = true
              } else {
                if (lo.compareTo(mins(name)) < 0) mins(name) = lo
                if (hi.compareTo(maxs(name)) > 0) maxs(name) = hi
              }
            } else if (st.getNumNulls != b.getRowCount) {
              // no recorded values yet not all-null: untrustworthy
              bad += name
            }
          }
        }
      }
      val newCols = need.map(n => n -> ColStat(
        mins.getOrElse(n, null), maxs.getOrElse(n, null),
        seen.getOrElse(n, false), exact = !bad.contains(n),
        enc = encs.getOrElse(n, "other"))).toMap
      val merged = FileStat(rows,
        (if (hit == null) Map.empty[String, ColStat] else hit.cols) ++ newCols)
      cache.put(key, merged)
      merged
    } finally reader.close()
  }

  /** Parallel stats for many files (cold footers are independent). */
  def getAll(conf: Configuration,
      fsys: org.apache.hadoop.fs.FileSystem, paths: Seq[String],
      wanted: Set[String]): Seq[FileStat] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(
      Future.traverse(paths)(p => Future(
        get(conf, fsys.getFileStatus(new org.apache.hadoop.fs.Path(p)), wanted))),
      scala.concurrent.duration.Duration(10, "min"))
  }
}
