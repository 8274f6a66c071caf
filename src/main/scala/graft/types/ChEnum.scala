package graft.types

import org.apache.spark.sql.types._

/** Enum8/Enum16 (reference: dbms/src/DataTypes/DataTypeEnum.cpp).
  * Stored as the numeric value (Int8/Int16 channel — exactly the
  * reference's storage layout), rendered by name. The name↔value map
  * rides on StructField metadata under key `ch.enum`, so it survives
  * projections, temp-view round trips, and parquet snapshots without
  * a custom Spark type; at 100 TB the column is a plain narrow
  * integer column with all the usual encodings and pushdowns.
  */
object ChEnum {

  val key = "ch.enum"

  /** Entries are kept sorted by value — the reference sorts at
    * construction (DataTypeEnum ctor fillMaps) and DESCRIBE renders
    * that order; the first entry (minimum value) is the type default. */
  final case class Def(bits: Int, names: Seq[String], values: Seq[Int]) {
    private lazy val byValue: Map[Int, String] = values.zip(names).toMap
    private lazy val byName: Map[String, Int] = names.zip(values).toMap

    def nameOf(v: Long): String = byValue.getOrElse(v.toInt,
      throw new IllegalArgumentException(s"unknown Enum$bits value: $v"))
    def valueOf(name: String): Int = byName.getOrElse(name,
      throw new IllegalArgumentException(s"unknown Enum$bits name: '$name'"))
    def hasName(name: String): Boolean = byName.contains(name)

    def defaultName: String = names.head
    def defaultValue: Int = values.head

    def storageType: DataType = if (bits == 8) ByteType else ShortType

    /** `Enum8('a' = 0, 'b' = 1)` — the DESCRIBE rendering. */
    def typeName: String =
      s"Enum$bits(" + names.zip(values).map { case (n, v) =>
        val esc = n.replace("\\", "\\\\").replace("'", "\\'")
          .replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r")
        s"'$esc' = $v"
      }.mkString(", ") + ")"

    def toMetadata: Metadata = new MetadataBuilder()
      .putLong("bits", bits.toLong)
      .putStringArray("names", names.toArray)
      .putLongArray("values", values.map(_.toLong).toArray)
      .build()
  }

  /** Parse the `'a' = 1, 'b' = 2` entry list of an EnumN(...) type. */
  def parseDef(bits: Int, body: String): Def = {
    val entryRe = "^'((?:[^'\\\\]|\\\\.)*)'\\s*=\\s*(-?\\d+)$".r
    val entries = splitEntries(body).map { e =>
      entryRe.findFirstMatchIn(e.trim) match {
        case Some(m) =>
          // full CH string unescape, left-to-right (ReadHelpers:
          // \\ \' \t \n \r \0; unknown \c keeps c) — chained
          // replace() would double-process (corpus 00298 '\t\\t')
          val raw = m.group(1)
          val sb = new StringBuilder
          var i = 0
          while (i < raw.length) {
            val c = raw.charAt(i)
            if (c == '\\' && i + 1 < raw.length) {
              raw.charAt(i + 1) match {
                case 't' => sb += '\t'
                case 'n' => sb += '\n'
                case 'r' => sb += '\r'
                case '0' => sb += '\u0000'
                case o => sb += o
              }
              i += 2
            } else { sb += c; i += 1 }
          }
          (sb.toString, m.group(2).toInt)
        case None =>
          throw new IllegalArgumentException(s"bad Enum$bits entry: $e")
      }
    }.sortBy(_._2)
    Def(bits, entries.map(_._1), entries.map(_._2))
  }

  /** The enum def tagged on a field's metadata, if any. */
  def of(meta: Metadata): Option[Def] =
    if (meta != null && meta.contains(key)) {
      val m = meta.getMetadata(key)
      Some(Def(m.getLong("bits").toInt,
        m.getStringArray("names").toIndexedSeq,
        m.getLongArray("values").map(_.toInt).toIndexedSeq))
    } else None

  def of(f: StructField): Option[Def] = of(f.metadata)

  /** Merge the enum tag into existing metadata. */
  def tag(meta: Metadata, d: Def): Metadata =
    new MetadataBuilder().withMetadata(meta).putMetadata(key, d.toMetadata).build()

  def metadata(d: Def): Metadata = tag(Metadata.empty, d)

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  private def nameToValueMap(d: Def): Column =
    map(d.names.zip(d.values).flatMap { case (n, v) =>
      Seq(lit(n), lit(v).cast(d.storageType)) }: _*)

  private def valueToNameMap(d: Def): Column =
    map(d.values.zip(d.names).flatMap { case (v, n) =>
      Seq(lit(v), lit(n)) }: _*)

  private def encodeElem(x: Column, d: Def): Column =
    // a name wins; anything else (a number, a numeric string) falls
    // through to the numeric cast — DataTypeEnum accepts both channels
    coalesce(element_at(nameToValueMap(d), x.cast("string")),
      x.cast(d.storageType))

  private def decodeElem(x: Column, d: Def): Column =
    element_at(valueToNameMap(d), x.cast("int"))

  /** Incoming (string-name or numeric) column → stored numeric form. */
  def encodeCol(c: Column, f: StructField): Column = of(f) match {
    case None => c
    case Some(d) => f.dataType match {
      case _: ArrayType => transform(c, x => encodeElem(x, d))
      case _ => encodeElem(c, d)
    }
  }

  /** Stored numeric column → rendered name form (type String). */
  def decodeCol(c: Column, f: StructField): Column = of(f) match {
    case None => c
    case Some(d) => f.dataType match {
      // a column already rendered to its NAME decodes to itself
      case org.apache.spark.sql.types.StringType => c
      case _: ArrayType => transform(c, x => decodeElem(x, d))
      case _ => decodeElem(c, d)
    }
  }

  /** Split `'a' = 1, 'b' = 2` on commas outside quotes. */
  private def splitEntries(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var inQuote = false
    var escaped = false
    val cur = new StringBuilder
    s.foreach { c =>
      if (escaped) { cur += c; escaped = false }
      else c match {
        case '\\' if inQuote => cur += c; escaped = true
        case '\'' => inQuote = !inQuote; cur += c
        case ',' if !inQuote => out += cur.toString; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
