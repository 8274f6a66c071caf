package graft.server

import java.io.OutputStream
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Formats
import graft.sql.ChDdl

/** HTTP query endpoint speaking the reference's HTTP protocol
  * (dbms/src/Server/HTTPHandler.cpp:162-280, HTTPRequestHandlerFactory):
  *
  *  - the query is the `query` URL parameter, a newline, then the
  *    request body (either part may be empty — GET `?query=...` and
  *    plain POST both work);
  *  - `GET /` and `GET /ping` answer `Ok.` (health probe for load
  *    balancers);
  *  - a trailing `FORMAT <name>` clause — or the `default_format`
  *    parameter — picks the wire format; the default is TabSeparated
  *    (executeQuery.cpp HTTP default);
  *  - errors return HTTP 500 with the exception text in the body,
  *    `X-ClickHouse-Exception-Code` style reduced to plain text.
  *
  * DDL / INSERT / SELECT all route through [[ChDdl.execute]], so the
  * endpoint exposes the full dialect (CREATE/INSERT/OPTIMIZE/ALTER,
  * table functions, FINAL, …). Statements are executed one at a time;
  * only the last SELECT's result is rendered (the reference rejects
  * multi-statement, we are slightly laxer for test convenience).
  *
  * Rendering collects the result to the server thread — the endpoint
  * is an interactive front door for small result sets, exactly like
  * the reference's HTTP interface (which streams, but is used for
  * human-sized outputs); bulk export goes through Formats.write's
  * distributed parquet/csv path instead.
  */
final class HttpEndpoint(spark: SparkSession, port: Int = 8123) {

  private val server: HttpServer = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/", handle _)
  server.setExecutor(null) // serial: one query at a time, like a single client

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)

  /** Which port the OS actually bound (for port=0 ephemeral tests). */
  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte],
      contentType: String = "text/tab-separated-values; charset=UTF-8"): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    val os: OutputStream = ex.getResponseBody
    try os.write(body) finally os.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&').toSeq
      .filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) URLDecoder.decode(kv, "UTF-8") -> ""
        else URLDecoder.decode(kv.substring(0, i), "UTF-8") ->
          URLDecoder.decode(kv.substring(i + 1), "UTF-8")
      }.toMap

  private val formatRe = "(?is)\\s+FORMAT\\s+([A-Za-z]+)\\s*;?\\s*$".r
  // an INSERT whose statement ends at `FORMAT <name>`: everything
  // after that line is raw ROW DATA, not SQL (HTTPHandler passes the
  // rest of the body to the format's BlockInputStream)
  private val insertDataRe =
    "(?is)^\\s*(INSERT\\s+INTO\\s+[^\\n]*?FORMAT\\s+[A-Za-z]+)\\s*\\n(.*)$".r

  private def handle(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath
      val params = queryParams(ex)
      // add_http_cors_header=1 + an Origin request header → CORS `*`
      // (HTTPHandler.cpp cors; 00372_cors_header.sh)
      if (params.get("add_http_cors_header").contains("1") &&
        ex.getRequestHeaders.containsKey("Origin"))
        ex.getResponseHeaders.set("Access-Control-Allow-Origin", "*")
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val queryParam = params.getOrElse("query", "")
      val full = (if (queryParam.nonEmpty) queryParam + "\n" else "") + body
      // URL-parameter settings are PER QUERY in the reference
      // (Context::setSetting from HTMLForm) — snapshot and restore so
      // one request's tolerance doesn't leak into the next (the
      // endpoint is serial, so the save/restore pair is race-free)
      val saved = (ChDdl.inputAllowErrorsNum, ChDdl.inputAllowErrorsRatio,
        ChDdl.inputSkipUnknownFields)
      params.get("input_format_allow_errors_num")
        .foreach(v => ChDdl.inputAllowErrorsNum = v.toLong)
      params.get("input_format_allow_errors_ratio")
        .foreach(v => ChDdl.inputAllowErrorsRatio = v.toDouble)
      params.get("input_format_skip_unknown_fields")
        .foreach(v => ChDdl.inputSkipUnknownFields = v != "0")
      try handleBody(ex, path, params, full)
      finally {
        ChDdl.inputAllowErrorsNum = saved._1
        ChDdl.inputAllowErrorsRatio = saved._2
        ChDdl.inputSkipUnknownFields = saved._3
      }
    } catch {
      case t: Throwable =>
        val msg = s"Code: 1000. Exception: ${Option(t.getMessage).getOrElse(t.toString)}\n"
        respond(ex, 500, msg.getBytes(UTF_8), "text/plain; charset=UTF-8")
    }

  private def handleBody(ex: HttpExchange, path: String,
      params: Map[String, String], full: String): Unit = {
      if (full.trim.isEmpty) {
        // health probe: `GET /` or `GET /ping` → "Ok." (HTTPHandler.cpp:444)
        if (path == "/" || path == "/ping")
          respond(ex, 200, "Ok.\n".getBytes(UTF_8), "text/html; charset=UTF-8")
        else respond(ex, 404, s"There is no handle $path\n".getBytes(UTF_8),
          "text/plain; charset=UTF-8")
      } else full match {
        case insertDataRe(stmt, data)
            if !"(?is)\\bFORMAT\\s+Values\\s*$".r.findFirstIn(stmt).isDefined ||
              data.trim.nonEmpty =>
          ChDdl.insertWithData(spark, stmt, data)
          respond(ex, 200, Array.emptyByteArray, "text/plain; charset=UTF-8")
        case _ =>
          val format = formatRe.findFirstMatchIn(full).map(_.group(1))
            .orElse(params.get("default_format"))
            .getOrElse("TabSeparated")
          var last: Option[DataFrame] = None
          graft.sql.ChSql.statements(full).foreach { stmt =>
            last = ChDdl.execute(spark, stmt)
          }
          val bytes: Array[Byte] = last match {
            case None => Array.emptyByteArray
            case Some(df) => render(df, format)
          }
          respond(ex, 200, bytes, contentTypeOf(format))
      }
  }

  private def contentTypeOf(format: String): String = format.toLowerCase match {
    case "json" | "jsoncompact" | "jsoneachrow" => "application/json; charset=UTF-8"
    case "xml" => "application/xml; charset=UTF-8"
    case "rowbinary" | "odbcdriver" | "native" => "application/octet-stream"
    case "csv" | "csvwithnames" => "text/csv; charset=UTF-8"
    // Pretty*/Vertical are human-readable text, not TSV
    // (getContentType in FormatFactory — 00265_content_type.sh)
    case f if f.startsWith("pretty") || f.startsWith("vertical") =>
      "text/plain; charset=UTF-8"
    case _ => "text/tab-separated-values; charset=UTF-8"
  }

  /** Dispatch to the Formats renderers (FormatFactory.cpp names). */
  private def render(df: DataFrame, format: String): Array[Byte] =
    format.toLowerCase match {
      case "rowbinary" => Formats.rowBinary(df)
      case "odbcdriver" => Formats.odbcDriver(df)
      case "native" =>
        // the engine's columnar native layout is parquet (Formats
        // registry); serve the single-file encoding of the result
        val dir = java.nio.file.Files.createTempDirectory("native_out")
        try {
          df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
          val part = java.nio.file.Files.list(dir).toArray.map(_.toString)
            .find(p => p.endsWith(".parquet")).get
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(part))
        } finally {
          java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        }
      case other =>
        val s = other match {
          case "tabseparated" | "tsv" => Formats.tabSeparated(df)
          case "tabseparatedwithnames" | "tsvwithnames" =>
            Formats.tabSeparatedWithNames(df)
          case "tabseparatedwithnamesandtypes" | "tsvwithnamesandtypes" =>
            Formats.tabSeparatedWithNames(df, withTypes = true)
          case "csv" => Formats.csv(df)
          case "csvwithnames" => Formats.csv(df, withNames = true)
          case "json" => Formats.json(df)
          case "jsoncompact" => Formats.jsonCompact(df)
          case "jsoneachrow" => Formats.jsonEachRow(df)
          case "tskv" => Formats.tskv(df)
          case "values" => Formats.values(df)
          case "pretty" | "prettycompact" | "prettyspace" => Formats.pretty(df)
          case "vertical" | "verticalraw" => Formats.vertical(df)
          case "xml" => Formats.xml(df)
          case "blocktabseparated" =>
            // one line per COLUMN, values tab-joined (BlockTabSeparated)
            val rows = df.limit(1000000).collect()
            df.columns.indices.map(c => rows.map(r =>
              Formats.renderRow(Seq(r.get(c)))).mkString("\t")).mkString("\n")
          case unknown =>
            throw new IllegalArgumentException(s"Unknown format $unknown")
        }
        (s + (if (s.nonEmpty) "\n" else "")).getBytes(UTF_8)
    }
}
