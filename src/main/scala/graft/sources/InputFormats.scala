package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** INPUT-side row formats with the reference's parsing semantics —
  * the surface the `.sh` corpus exercises that the `.sql` corpus
  * cannot (data arrives as client bytes, not SQL literals):
  *
  *  - TabSeparated: `\N` nulls, C-style escapes, per-row error
  *    tolerance (input_format_allow_errors_num / _ratio —
  *    00418_input_format_allow_errors.sh)
  *  - CSV: quoted fields with `""` escapes spanning newlines,
  *    whitespace around fields, trailing delimiter, quoted numbers,
  *    UTF-8 BOM stripping (00301_csv.sh, 00335_bom.sh)
  *  - TSKV: key=value fields in any order, bare `tskv` marker,
  *    missing keys → column defaults, value escapes incl. `\0`
  *    (00310_tskv.sh)
  *  - JSONEachRow: skip-unknown-fields over arbitrarily nested junk,
  *    quoted numerics, null/missing → defaults
  *    (00374_json_each_row_input_with_noisy_fields.sh)
  *  - parsing of `\N`/NULL across all of the above
  *    (00407_parsing_nulls.sh)
  *
  * All parsers are PER-PARTITION functions of the byte payload: the
  * driver-side `parse*` entry points here take one client payload (the
  * HTTP/INSERT body — bounded by definition), while a 100 TB file load
  * routes the same row-level routines through a text datasource scan.
  */
object InputFormats {

  /** Dispatch by FORMAT name (FormatFactory.cpp input names). */
  def parse(spark: SparkSession, format: String, data: String,
      schema: StructType, tol: Tolerance = Tolerance(),
      skipUnknown: Boolean = false): DataFrame =
    format.toLowerCase match {
      case "tabseparated" | "tsv" | "tabseparatedraw" | "tsvraw" =>
        parseTsv(spark, data, schema, tol)
      case "csv" => parseCsv(spark, data, schema)
      case "tskv" => parseTskv(spark, data, schema)
      case "jsoneachrow" => parseJsonEachRow(spark, data, schema, skipUnknown)
      case "values" => Formats.parseValues(
        spark, stripBom(data).trim.stripSuffix(";"), schema)
      case other =>
        throw new IllegalArgumentException(s"unsupported input format: $other")
    }

  /** input_format_allow_errors_num / input_format_allow_errors_ratio:
    * a malformed row is skipped while
    * `errors <= num || errors <= ratio * rowsSoFar`; otherwise the
    * whole insert throws (nothing of the batch lands). */
  final case class Tolerance(num: Long = 0L, ratio: Double = 0.0)

  private def typeDefault(dt: DataType, nullable: Boolean): Any =
    if (nullable) null
    else dt match {
      case StringType => ""
      case ByteType => 0.toByte
      case ShortType => 0.toShort
      case IntegerType => 0
      case LongType => 0L
      case FloatType => 0f
      case DoubleType => 0d
      case _: DecimalType => java.math.BigDecimal.ZERO
      case DateType => new java.sql.Date(0L)
      case TimestampType => new java.sql.Timestamp(0L)
      case BooleanType => false
      case _ => null
    }

  /** Text → typed value per the reference's ReadHelpers: trimmed
    * numerics, date / datetime literals, digit-runs into DateTime as
    * unix seconds. Throws on malformed text (callers turn that into
    * a row error). */
  private def convert(raw: String, dt: DataType): Any = dt match {
    case StringType => raw
    // an EMPTY numeric field parses as the type's zero (ReadHelpers
    // readIntText on an exhausted buffer — 00407's `\N\t\t2000-…`
    // middle field lands 0, not NULL and not an error)
    case _ if raw.trim.isEmpty && (dt match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType => true
      case _: DecimalType => true
      case _ => false
    }) => typeDefault(dt, nullable = false)
    case ByteType => raw.trim.toByte
    case ShortType => raw.trim.toShort
    case IntegerType => raw.trim.toInt
    case LongType => raw.trim.toLong
    case FloatType => raw.trim.toFloat
    case DoubleType => raw.trim.toDouble
    case d: DecimalType => new java.math.BigDecimal(raw.trim)
    case BooleanType => raw.trim match {
      case "1" | "true" => true
      case "0" | "false" => false
    }
    case DateType => java.sql.Date.valueOf(raw.trim)
    case TimestampType =>
      val t = raw.trim
      if (t.matches("\\d{5,}"))
        new java.sql.Timestamp(t.toLong * 1000L)
      else {
        // "YYYY-MM-DD hh:mm:ss" in the session zone (UTC here)
        val ldt = java.time.LocalDateTime.parse(t.replace(' ', 'T'))
        new java.sql.Timestamp(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000L)
      }
    case other =>
      throw new IllegalArgumentException(s"input format: unsupported type $other")
  }

  private def toDf(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)

  /** Strip a leading UTF-8 BOM (the reference skips it at the head of
    * client data — 00335_bom.sh). */
  def stripBom(s: String): String =
    if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s

  /** Unescape one TSV/TSKV text field (ReadHelpers
    * parseComplexEscapeSequence): \n \t \r \0 \b \f \a \v \\ \' and a
    * backslash before anything else keeps the character. */
  private def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        i += 1
        b.append(s.charAt(i) match {
          case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
          case '0' => '\u0000'; case 'b' => '\b'; case 'f' => '\f'
          case 'a' => '\u0007'; case 'v' => '\u000B'
          case other => other
        })
      } else b.append(c)
      i += 1
    }
    b.toString
  }

  private def splitLines(data: String): Seq[String] = {
    val ls = data.split("\n", -1).toSeq
    if (ls.nonEmpty && ls.last.isEmpty) ls.init else ls
  }

  /** FORMAT TabSeparated input: one row per line, fields separated by
    * a single tab, `\N` = NULL, C escapes in values. A line with the
    * wrong field count or an unparseable value is a row ERROR,
    * tolerated per [[Tolerance]]. */
  /** One TSV line → Row (throws on malformed — callers apply the
    * tolerance policy). Serializable row-level routine shared by the
    * driver-side [[parseTsv]] and the distributed [[scan]]. */
  private[sources] def tsvRow(line: String, schema: StructType): Row = {
    val fields = line.split("\t", -1)
    require(fields.length == schema.length,
      s"expected ${schema.length} fields, got ${fields.length}")
    Row.fromSeq(fields.zip(schema.fields).map { case (f, sf) =>
      if (f == "\\N") {
        require(sf.nullable, s"NULL into non-nullable ${sf.name}")
        null
      } else convert(unescape(f), sf.dataType)
    }.toIndexedSeq)
  }

  def parseTsv(spark: SparkSession, data: String, schema: StructType,
      tol: Tolerance = Tolerance()): DataFrame = {
    var errors = 0L
    var total = 0L
    val rows = Seq.newBuilder[Row]
    splitLines(stripBom(data)).foreach { line =>
      total += 1
      try rows += tsvRow(line, schema)
      catch { case e: Exception =>
        errors += 1
        if (errors > tol.num && errors > tol.ratio * total)
          throw new IllegalArgumentException(
            s"TSV parse: $errors errors in $total rows " +
              s"(allow num=${tol.num} ratio=${tol.ratio}): ${e.getMessage}")
      }
    }
    toDf(spark, rows.result(), schema)
  }

  /** FORMAT CSV input (CSVRowInputStream semantics): quoted fields
    * escape quotes by doubling and may span newlines; whitespace
    * around fields is skipped; a trailing delimiter before the row
    * end is tolerated; numeric fields may arrive quoted; `\N`
    * (unquoted) is NULL. Accepts the raw client text (BOM stripped). */
  def parseCsv(spark: SparkSession, data0: String, schema: StructType,
      delimiter: Char = ','): DataFrame = {
    val data = stripBom(data0)
    val rows = Seq.newBuilder[Row]
    var i = 0
    val n = data.length
    def atRowEnd: Boolean = i >= n || data.charAt(i) == '\n' || data.charAt(i) == '\r'
    def skipSpaces(): Unit =
      while (i < n && (data.charAt(i) == ' ' || data.charAt(i) == '\t')) i += 1
    while (i < n) {
      // one record
      val fields = Seq.newBuilder[(String, Boolean)] // (text, wasQuoted)
      var done = false
      while (!done) {
        skipSpaces()
        if (i < n && data.charAt(i) == '"') {
          // quoted field: "" = literal quote, newlines allowed
          i += 1
          val b = new java.lang.StringBuilder()
          var closed = false
          while (!closed && i < n) {
            val c = data.charAt(i)
            if (c == '"') {
              if (i + 1 < n && data.charAt(i + 1) == '"') { b.append('"'); i += 2 }
              else { closed = true; i += 1 }
            } else { b.append(c); i += 1 }
          }
          fields += ((b.toString, true))
        } else {
          val start = i
          while (!atRowEnd && data.charAt(i) != delimiter) i += 1
          // trim trailing whitespace of an unquoted field
          var end = i
          while (end > start && (data.charAt(end - 1) == ' ' || data.charAt(end - 1) == '\t')) end -= 1
          fields += ((data.substring(start, end), false))
        }
        skipSpaces()
        // after a (quoted) field, only the delimiter or the row end
        // may follow — `"a"x,1` is a parse error, not a 2-field row
        // (CSVRowInputStream assertChar semantics). The unquoted scan
        // stops AT the delimiter/row end, so this can only trip for
        // junk after a closing quote.
        if (!atRowEnd && data.charAt(i) != delimiter)
          throw new IllegalArgumentException(
            s"CSV: expected '$delimiter' or end of line after a quoted " +
              s"field, found '${data.charAt(i)}' at offset $i")
        if (!atRowEnd && data.charAt(i) == delimiter) {
          i += 1
          // trailing delimiter immediately before the row end closes
          // the record (00301 line 2/4)
          skipSpaces()
          if (atRowEnd) done = true
        } else done = true
      }
      // consume the row terminator
      if (i < n && data.charAt(i) == '\r') i += 1
      if (i < n && data.charAt(i) == '\n') i += 1
      val fs = fields.result()
      if (!(fs.length == 1 && fs.head._1.isEmpty && !fs.head._2)) {
        require(fs.length == schema.length,
          s"CSV: expected ${schema.length} fields, got ${fs.length}: $fs")
        rows += Row.fromSeq(fs.zip(schema.fields).map { case ((f, quoted), sf) =>
          if (!quoted && f == "\\N") {
            require(sf.nullable, s"NULL into non-nullable ${sf.name}")
            null
          } else convert(if (quoted) f else unescape(f), sf.dataType)
        }.toIndexedSeq)
      }
    }
    toDf(spark, rows.result(), schema)
  }

  /** FORMAT TSKV input: tab-separated `key=value` pairs in any order;
    * the bare `tskv` marker field is skipped; unknown keys are
    * skipped; keys absent from a line take the column default; values
    * unescape like TSV (incl. `\0`). An empty line is a full-defaults
    * row (TSKVRowInputStream — 00310_tskv.sh). */
  /** One TSKV line → Row (shared by [[parseTskv]] and [[scan]]). */
  private[sources] def tskvRow(line: String, schema: StructType,
      idx: Map[String, Int]): Row = {
    val vals = new Array[Any](schema.length)
    schema.fields.zipWithIndex.foreach { case (sf, j) =>
      vals(j) = typeDefault(sf.dataType, sf.nullable)
    }
    if (line.nonEmpty) line.split("\t", -1).foreach { tok =>
      val eq = tok.indexOf('=')
      if (eq >= 0) {
        val key = unescape(tok.substring(0, eq))
        idx.get(key).foreach { j =>
          val sf = schema.fields(j)
          val raw = tok.substring(eq + 1)
          vals(j) =
            if (raw == "\\N" && sf.nullable) null
            else convert(unescape(raw), sf.dataType)
        }
      } // a key-less token (the leading `tskv` marker) is skipped
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  def parseTskv(spark: SparkSession, data: String, schema: StructType): DataFrame = {
    val idx = schema.fieldNames.zipWithIndex.toMap
    val rows = Seq.newBuilder[Row]
    splitLines(stripBom(data)).foreach(line =>
      rows += tskvRow(line, schema, idx))
    toDf(spark, rows.result(), schema)
  }

  // ----- JSONEachRow -------------------------------------------------

  /** Minimal recursive JSON scanner: parses one value starting at `i`,
    * returning (value, next index). Unknown-field SKIPPING needs the
    * full grammar (nested arrays/objects of junk — 00374). */
  private final class JsonCursor(s: String) {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def eof: Boolean = { ws(); i >= s.length }
    def expect(c: Char): Unit = {
      ws()
      require(i < s.length && s.charAt(i) == c, s"expected '$c' at $i")
      i += 1
    }
    def peek: Char = { ws(); s.charAt(i) }
    def parseString(): String = {
      expect('"')
      val b = new java.lang.StringBuilder()
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => b.append('\n'); case 't' => b.append('\t')
            case 'r' => b.append('\r'); case 'b' => b.append('\b')
            case 'f' => b.append('\f'); case '/' => b.append('/')
            case '\\' => b.append('\\'); case '"' => b.append('"')
            case 'u' =>
              b.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => b.append(other)
          }
        } else b.append(c)
        i += 1
      }
      i += 1
      b.toString
    }
    def parseValue(): Any = {
      ws()
      peek match {
        case '"' => parseString()
        case '{' =>
          expect('{'); ws()
          val m = scala.collection.mutable.LinkedHashMap[String, Any]()
          if (peek != '}') {
            var more = true
            while (more) {
              val k = parseString(); expect(':')
              m(k) = parseValue()
              ws()
              if (peek == ',') { i += 1 } else more = false
            }
          }
          expect('}')
          m
        case '[' =>
          expect('['); ws()
          val arr = Seq.newBuilder[Any]
          if (peek != ']') {
            var more = true
            while (more) {
              arr += parseValue()
              ws()
              if (peek == ',') { i += 1 } else more = false
            }
          }
          expect(']')
          arr.result()
        case 't' => require(s.startsWith("true", i)); i += 4; true
        case 'f' => require(s.startsWith("false", i)); i += 5; false
        case 'n' => require(s.startsWith("null", i)); i += 4; null
        case _ =>
          val start = i
          while (i < s.length && "+-.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
          java.lang.Double.parseDouble(s.substring(start, i))
      }
    }
  }

  /** FORMAT JSONEachRow input: a stream of JSON objects (whitespace/
    * comma separated); with `skipUnknown`, keys outside the schema are
    * parsed and discarded whatever their nesting; numeric columns
    * accept quoted numbers; null / missing keys take the column
    * default. */
  /** One parsed JSON object → Row (shared by [[parseJsonEachRow]] and
    * [[scan]]). */
  private def jsonObjRow(obj: scala.collection.Map[String, Any],
      schema: StructType, idx: Map[String, Int], skipUnknown: Boolean): Row = {
    val vals = new Array[Any](schema.length)
    schema.fields.zipWithIndex.foreach { case (sf, j) =>
      vals(j) = typeDefault(sf.dataType, sf.nullable)
    }
    obj.foreach { case (k, v) =>
      idx.get(k) match {
        case Some(j) =>
          val sf = schema.fields(j)
          vals(j) = v match {
            case null => typeDefault(sf.dataType, sf.nullable)
            case s: String if sf.dataType != StringType => convert(s, sf.dataType)
            case s: String => s
            case d: Double => sf.dataType match {
              case LongType => d.toLong
              case IntegerType => d.toInt
              case ShortType => d.toShort
              case ByteType => d.toByte
              case FloatType => d.toFloat
              case DoubleType => d
              case StringType => Formats.renderDouble(d)
              case other => convert(d.toString, other)
            }
            case b: Boolean => sf.dataType match {
              case BooleanType => b
              case StringType => b.toString
              case _ => convert(if (b) "1" else "0", sf.dataType)
            }
            case other =>
              throw new IllegalArgumentException(
                s"JSONEachRow: bad value for ${sf.name}: $other")
          }
        case None =>
          if (!skipUnknown)
            throw new IllegalArgumentException(s"JSONEachRow: unknown field $k")
      }
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  private def parseOneObject(text: String): scala.collection.Map[String, Any] =
    new JsonCursor(text).parseValue() match {
      case m: scala.collection.Map[String @unchecked, Any @unchecked] => m
      case other =>
        throw new IllegalArgumentException(s"JSONEachRow: not an object: $other")
    }

  def parseJsonEachRow(spark: SparkSession, data: String, schema: StructType,
      skipUnknown: Boolean = true): DataFrame = {
    val cur = new JsonCursor(stripBom(data))
    val idx = schema.fieldNames.zipWithIndex.toMap
    val rows = Seq.newBuilder[Row]
    while (!cur.eof) {
      if (cur.peek == ',') cur.i += 1
      if (!cur.eof) {
        val obj = cur.parseValue() match {
          case m: scala.collection.Map[String @unchecked, Any @unchecked] => m
          case other =>
            throw new IllegalArgumentException(s"JSONEachRow: not an object: $other")
        }
        rows += jsonObjRow(obj, schema, idx, skipUnknown)
      }
    }
    toDf(spark, rows.result(), schema)
  }

  // ----- distributed scan --------------------------------------------

  /** Distributed LINE-format load: the same row-level routines as the
    * driver-side `parse*` entry points, but running inside a
    * `spark.read.textFile` scan — the 100 TB path for bulk file
    * ingestion (TSV / TSKV / JSONEachRow are newline-delimited, so
    * Spark's line splitter partitions them freely; CSV is NOT served
    * here because its quoted fields may span lines — route CSV files
    * through the per-payload [[parseCsv]]).
    *
    * Error tolerance applies PER PARTITION: each task tracks its own
    * error/row counts against the same num/ratio thresholds, so a
    * file split into P partitions tolerates up to P·num absolute
    * errors. This deliberately differs from the reference, whose
    * BlockInputStreamFromRowInputStream budget is CUMULATIVE per
    * input stream — a global count here would serialize the scan
    * through a shared accumulator check. Callers that need the
    * stream-wide semantics should divide `num` by the expected
    * partition count (the ratio threshold is scale-free and applies
    * unchanged). */
  def scan(spark: SparkSession, path: String, format: String,
      schema: StructType, tol: Tolerance = Tolerance(),
      skipUnknown: Boolean = false): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = schema.fieldNames.zipWithIndex.toMap
    val fmt = format.toLowerCase
    require(Set("tabseparated", "tsv", "tskv", "jsoneachrow").contains(fmt),
      s"scan: line-delimited formats only, got $format")
    val lines = spark.read.textFile(path)
    lines.mapPartitions { it =>
      var errors = 0L
      var total = 0L
      it.flatMap { line0 =>
        // the file head's BOM arrives as the first line's first char;
        // partitions can't see file offsets, so EVERY line sheds a
        // leading U+FEFF — also a zero-width no-break space, which no
        // line-oriented format legitimately starts a value with
        val line = stripBom(line0)
        total += 1
        try Iterator.single(fmt match {
          case "tskv" => tskvRow(line, schema, idx)
          case "jsoneachrow" =>
            jsonObjRow(parseOneObject(line), schema, idx, skipUnknown)
          case _ => tsvRow(line, schema)
        })
        catch { case e: Exception =>
          errors += 1
          if (errors > tol.num && errors > tol.ratio * total)
            throw new IllegalArgumentException(
              s"$format scan: $errors errors in $total rows of a partition " +
                s"(allow num=${tol.num} ratio=${tol.ratio}): ${e.getMessage}")
          Iterator.empty
        }
      }
    }(enc)
  }
}
