package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Scalar-function parity layer (SURVEY.md §2.9).
  *
  * Thin, codegen-preserving wrappers: each helper composes built-in
  * `org.apache.spark.sql.functions` (all whole-stage-codegen'd), so
  * none of these introduce UDF boundaries in the hot path. Reference
  * surface: dbms/src/Functions (FunctionFactory registrations).
  */
object ch {

  /** transform(x, from, to, default) — value remap
    * (reference: Functions/FunctionsTransform.cpp). Chained `when`s
    * keep it inside codegen; for large maps prefer a broadcast join.
    */
  def transform[T](x: Column, from: Seq[T], to: Seq[T], default: T): Column = {
    require(from.length == to.length, "transform: from/to length mismatch")
    from.zip(to).foldRight(lit(default)) { case ((f, v), acc) =>
      when(x === lit(f), lit(v)).otherwise(acc)
    }
  }

  /** multiIf(c1, v1, c2, v2, …, default)
    * (reference: Functions/FunctionsConditional.h multiIf). */
  def multiIf(branches: Seq[(Column, Column)], default: Column): Column =
    branches.foldRight(default) { case ((c, v), acc) => when(c, v).otherwise(acc) }

  /** if(cond, then, else) (reference: FunctionsConditional.h). */
  def iif(cond: Column, t: Column, f: Column): Column = when(cond, t).otherwise(f)

  // --- date/time family (reference: Functions/FunctionsDateTime.h) ---

  /** toYYYYMM(d) — the reference's MergeTree month-partition key. */
  def toYYYYMM(d: Column): Column = (year(d) * 100 + month(d)).cast("int")

  /** toStartOfMonth / toMonday / toStartOfHour / toStartOfMinute. */
  // returns Date (DataTypeDate) in the reference, whatever the input
  def toStartOfMonth(d: Column): Column = trunc(d, "month")
  def toMonday(d: Column): Column = to_date(date_trunc("week", d))
  def toStartOfHour(d: Column): Column = date_trunc("hour", d)
  def toStartOfMinute(d: Column): Column = date_trunc("minute", d)

  /** toStartOfFiveMinute(ts) — 5-minute bucket. */
  def toStartOfFiveMinute(ts: Column): Column = timeBucket(ts, 300L)

  /** timeSlot(ts) — half-hour bucket (FunctionsDateTime.h timeSlot). */
  def timeSlot(ts: Column): Column = timeBucket(ts, 1800L)

  /** Generic epoch-aligned bucket of `seconds` width. */
  def timeBucket(ts: Column, seconds: Long): Column =
    timestamp_seconds(
      (unix_timestamp(ts.cast(TimestampType)) / seconds).cast(LongType) * seconds)

  /** toRelativeHourNum etc. — epoch-relative bucket ordinals. */
  def toRelativeSecondNum(ts: Column): Column = unix_timestamp(ts.cast(TimestampType))
  def toRelativeMinuteNum(ts: Column): Column = (toRelativeSecondNum(ts) / 60).cast(LongType)
  def toRelativeHourNum(ts: Column): Column = (toRelativeSecondNum(ts) / 3600).cast(LongType)
  def toRelativeDayNum(ts: Column): Column = (toRelativeSecondNum(ts) / 86400).cast(LongType)
  /** toRelativeMonthNum = year*12 + month; WeekNum counts Mondays
    * since epoch ((dayNum - (dow-1)) / 7); YearNum is the year
    * itself (DateLUTImpl.h:114-135). */
  def toRelativeYearNum(ts: Column): Column = year(ts.cast(TimestampType)).cast(LongType)
  def toRelativeMonthNum(ts: Column): Column =
    (year(ts.cast(TimestampType)) * 12 + month(ts.cast(TimestampType))).cast(LongType)
  def toRelativeWeekNum(ts: Column): Column =
    ((toRelativeDayNum(ts) - (chDayOfWeek(ts) - 1)) / 7).cast(LongType)
  /** CH day-of-week: Monday=1 … Sunday=7 (Spark's Sunday=1). */
  def chDayOfWeek(ts: Column): Column = (dayofweek(ts.cast(TimestampType)) + 5) % 7 + 1
  /** toTime: time-of-day mapped onto 1970-01-02 (DateLUTImpl toTime —
    * renders as `1970-01-02 HH:MM:SS`). */
  def toTime(ts: Column): Column = to_timestamp(
    concat(lit("1970-01-02 "), date_format(ts.cast(TimestampType), "HH:mm:ss")))

  // --- arithmetic (reference: Functions/FunctionsArithmetic.h) ---

  /** intDiv with divide-by-zero → error; OrZero variant yields 0.
    * True integral division (Catalyst IntegralDivide) — a
    * divide-through-double would lose exactness above 2^53. */
  def intDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.Bridge.expression(a.cast(LongType)),
        org.apache.spark.sql.graftbridge.Bridge.expression(b.cast(LongType))))
  def intDivOrZero(a: Column, b: Column): Column =
    when(b === 0, lit(0L)).otherwise(intDiv(a, b))
  def moduloOrZero(a: Column, b: Column): Column =
    when(b === 0, lit(0L)).otherwise(a.cast(LongType) % b.cast(LongType))

  // --- string helpers (reference: Functions/FunctionsString.h) ---

  def empty(c: Column): Column = length(c) === 0
  def notEmpty(c: Column): Column = length(c) > 0

  /** appendTrailingCharIfAbsent (FunctionsString.h) — empty strings
    * stay empty (the reference only appends to non-empty values). */
  def appendTrailingCharIfAbsent(c: Column, ch: String): Column =
    when(length(c) === 0 || c.endsWith(ch), c).otherwise(concat(c, lit(ch)))

  // --- URL family (reference: Functions/FunctionsURL.h) ---

  // no-match yields '' like the reference's empty substring, not NULL
  def protocol(url: Column): Column =
    coalesce(parse_url(url, lit("PROTOCOL")), lit(""))
  // byte-scan kernel (UrlFns.host) — getURLHost semantics, codegen'd;
  // parse_url's java.net.URI machinery is ~10x slower per row
  def domain(url: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(UrlHostExpr(Bridge.expression(url), withoutWww = false))
  }
  def domainWithoutWWW(url: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(UrlHostExpr(Bridge.expression(url), withoutWww = true))
  }
  def path(url: Column): Column =
    coalesce(parse_url(url, lit("PATH")), lit(""))
  def queryString(url: Column): Column =
    coalesce(parse_url(url, lit("QUERY")), lit(""))
  def fragment(url: Column): Column =
    coalesce(parse_url(url, lit("REF")), lit(""))
  def extractURLParameter(url: Column, name: String): Column =
    parse_url(url, lit("QUERY"), lit(name))
  // numeric hosts (IPs) have no TLD — the label must not be all-digit
  // (FunctionsURL.h ExtractTopLevelDomain)
  def topLevelDomain(url: Column): Column =
    regexp_extract(domain(url), "\\.((?![0-9]+\\.?$)[^.:]+)\\.?$", 1)
  def cutWWW(url: Column): Column = regexp_replace(url, "^(https?://)www\\.", "$1")
  def cutQueryString(url: Column): Column = regexp_replace(url, "\\?.*$", "")

  // --- visitParam JSON family (Functions/FunctionsVisitParam.cpp) ---

  def visitParamHas(json: Column, name: String): Column =
    get_json_object(json, s"$$.$name").isNotNull
  def visitParamExtractUInt(json: Column, name: String): Column =
    get_json_object(json, s"$$.$name").cast(LongType)
  def visitParamExtractFloat(json: Column, name: String): Column =
    get_json_object(json, s"$$.$name").cast("double")
  def visitParamExtractString(json: Column, name: String): Column =
    get_json_object(json, s"$$.$name")

  // --- domain rounding (Functions/FunctionsRound.h) ---

  /** roundAge: 0,18,25,35,45,55 buckets (FunctionsRound.h roundAge). */
  def roundAge(a: Column): Column =
    when(a < 1, 0).when(a < 18, 17).when(a < 25, 18).when(a < 35, 25)
      .when(a < 45, 35).when(a < 55, 45).otherwise(55)

  /** roundDuration: 0,1,10,30,60,...,36000 (FunctionsRound.h
    * RoundDurationImpl — the full ladder includes 1200 and 7200).
    * Ascending fold so the largest threshold is checked outermost. */
  def roundDuration(d: Column): Column = {
    val steps = Seq(1, 10, 30, 60, 120, 180, 240, 300, 600, 1200, 1800,
      3600, 7200, 18000, 36000)
    steps.foldLeft(lit(0).cast("int")) { (acc, s) =>
      when(d >= s, s).otherwise(acc)
    }
  }

  /** roundToExp2 — round down to a power of two (FunctionsRound.h).
    * Guard c<1: floor(log2) would be negative and pow fractional. */
  def roundToExp2(c: Column): Column =
    when(c < 1, 0L).otherwise(pow(lit(2.0), floor(log2(c))).cast(LongType))

  /** convertCharset(s, from, to) (FunctionsCharset.cpp) — re-encode
    * string bytes between charsets. */
  def convertCharset(s: Column, from: String, to: String): Column =
    decode(encode(s, from), to)

  /** greatCircleDistance(lon1, lat1, lon2, lat2) in meters —
    * haversine over the mean-Earth radius (FunctionsGeo.cpp). */
  def greatCircleDistance(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val r = 6372797.560856 // the reference's EARTH_RADIUS_IN_METERS (FunctionsGeo.h:21)
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2 * r) * asin(sqrt(a))
  }

  /** formatReadableSize(bytes) — '1.50 KiB' style
    * (FunctionsFormatting.cpp). */
  def formatReadableSize(bytes: Column): Column = {
    val units = Seq("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB", "ZiB", "YiB")
    // unit chosen by |bytes| so negative sizes scale too (the
    // reference formats via std::abs)
    val e = when(abs(bytes) < 1, 0)
      .otherwise(least(floor(log(2.0, abs(bytes)) / 10).cast("int"), lit(units.size - 1)))
    val scaled = bytes.cast("double") / pow(lit(2.0), e.cast("double") * 10)
    // format_string, not format_number: the latter inserts
    // thousands-separator commas (e.g. '1,000.00KiB')
    concat(format_string("%.2f ", scaled),
      element_at(array(units.map(lit): _*), e.cast("int") + 1))
  }

  /** bar(x, min, max, width) — ASCII bar chart
    * (FunctionsMiscellaneous.cpp bar). */
  def bar(x: Column, minV: Double, maxV: Double, width: Int): Column = {
    val frac = (x - minV) / (maxV - minV)
    val n = greatest(lit(0), least(lit(width), round(frac * width).cast("int")))
    repeat(lit("█"), n)
  }

  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
  import org.apache.spark.sql.graftbridge.Bridge
  import org.apache.spark.sql.types.{DoubleType, StringType}

  private def stringKernel3(method: String, s: Column, f: Column, t: Column): Column =
    Bridge.column(StaticInvoke(
      classOf[StringKernels.type], StringType, method,
      Seq(Bridge.expression(s), Bridge.expression(f), Bridge.expression(t)),
      Seq(StringType, StringType, StringType)))

  /** replaceOne/replaceRegexpOne — first occurrence only
    * (FunctionsStringSearch.h). StaticInvoke = codegen'd, no UDF. */
  def replaceOne(s: Column, f: Column, t: Column): Column =
    stringKernel3("replaceOne", s, f, t)
  def replaceRegexpOne(s: Column, f: Column, t: Column): Column =
    stringKernel3("replaceRegexpOne", s, f, t)

  private def mathKernel1(method: String, x: Column): Column =
    Bridge.column(StaticInvoke(
      classOf[MathKernels.type], DoubleType, method,
      Seq(Bridge.expression(x.cast("double"))), Seq(DoubleType),
      returnNullable = false))

  /** C-math semantics the Spark builtins diverge from: Spark's
    * log/log2/log10 return NULL at 0 where C (and the reference,
    * FunctionsMath.h) return -inf; Spark has no gamma/erf. All via
    * codegen'd StaticInvoke on commons-math3 / java.lang.Math. */
  def tgamma(x: Column): Column = mathKernel1("tgamma", x)
  def lgamma(x: Column): Column = mathKernel1("lgamma", x)
  def erf(x: Column): Column = mathKernel1("erf", x)
  def erfc(x: Column): Column = mathKernel1("erfc", x)
  def logC(x: Column): Column = mathKernel1("log", x)
  def log2C(x: Column): Column = mathKernel1("log2", x)
  def log10C(x: Column): Column = mathKernel1("log10", x)
}

/** JVM double kernels (see [[ch.tgamma]]). */
object MathKernels {
  import org.apache.commons.math3.special.{Erf, Gamma}

  /** Float64 → UInt64 with the reference's x86-64 conversion shape
    * (static_cast<UInt64>(double) compiles to: x < 2^63 → cvttsd2si;
    * else cvttsd2si(x − 2^63) + 2^63 with the cvtt overflow sentinel
    * 0x8000000000000000) — so [2^63, 2^64) wraps to the unsigned
    * bit pattern and ≥ 2^64 lands on 0 (corpus 00232). */
  def toUInt64FromDouble(d: Double): Long = {
    val p63 = 9.223372036854776e18 // 2^63
    if (java.lang.Double.isNaN(d)) java.lang.Long.MIN_VALUE
    else if (d >= p63) {
      val y = d - p63
      val inner =
        if (y >= p63) java.lang.Long.MIN_VALUE else y.toLong
      inner + java.lang.Long.MIN_VALUE
    } else d.toLong
  }

  /** round(Float64, s>0) with the reference's double pipeline: scale
    * up, ties-to-even on the PRODUCT, scale down; sign restored after
    * (FunctionsRound.h Float64 PositiveScale). */
  def roundToScale(x: Double, scale: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else {
      val r = math.rint(math.abs(x) * scale) / scale
      // normalize(): zero loses the sign (round(-0.002, 1) prints 0)
      if (x < 0 && r != 0d) -r else r
    }

  /** round/ceil/floor(Float, s<0) — the reference's magnitude
    * algorithm (FunctionsRound.h Float NegativeScale): |x|/10^-s,
    * hard-zero when that falls below 0.1, round by mode, scale back,
    * restore sign (negative zero included — normalize()). mode:
    * 0 nearest-even, 1 floor, 2 ceil (_MM_FROUND_*). */
  def roundNegScale(x: Double, p: Double, mode: Int): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else {
      val v = math.abs(x) / p
      val r =
        if (v < 0.1) 0d
        else (mode match {
          case 0 => math.rint(v)
          case 1 => math.floor(v)
          case _ => math.ceil(v)
        }) * p
      // normalize(): a zero result loses the sign (golden prints 0,
      // not -0, for round(-13, -2))
      if (x < 0 && r != 0d) -r else r
    }

  /** C tgamma: pole at 0 is +inf (commons-math3 returns NaN there). */
  def tgamma(x: Double): Double =
    if (x == 0d) Double.PositiveInfinity else Gamma.gamma(x)
  def lgamma(x: Double): Double = Gamma.logGamma(x)
  def erf(x: Double): Double = Erf.erf(x)
  def erfc(x: Double): Double = Erf.erfc(x)
  def log(x: Double): Double = math.log(x)
  def log2(x: Double): Double = math.log(x) / math.log(2.0)
  def log10(x: Double): Double = math.log10(x)
}

/** JVM string kernels for functions with no Spark builtin, invoked
  * through StaticInvoke — codegen'd static calls, not UDFs.
  * Reference: FunctionsStringSearch.h replaceOne/replaceRegexpOne. */
object StringKernels {
  import org.apache.spark.unsafe.types.UTF8String

  /** UInt64 rendering: unsigned decimal (the reference's UInt64
    * toString; Spark Longs are signed). */
  def uint64ToString(x: Long): UTF8String =
    UTF8String.fromString(java.lang.Long.toUnsignedString(x))

  def replaceOne(s: UTF8String, f: UTF8String, t: UTF8String): UTF8String =
    if (s == null || f == null || t == null) null
    else UTF8String.fromString(s.toString.replaceFirst(
      java.util.regex.Pattern.quote(f.toString),
      java.util.regex.Matcher.quoteReplacement(t.toString)))

  /** CH replacement backrefs are `\0`/`\1`… (re2 style); Java wants
    * `$0`/`$1` — translate, escaping any literal `$`. */
  private def javaRepl(t: String): String =
    t.replace("$", "\\$").replaceAll("\\\\(\\d)", "\\$$1")

  def replaceRegexpOne(s: UTF8String, f: UTF8String, t: UTF8String): UTF8String =
    if (s == null || f == null || t == null) null
    else UTF8String.fromString(
      s.toString.replaceFirst(f.toString, javaRepl(t.toString)))

  def replaceRegexpAll(s: UTF8String, f: UTF8String, t: UTF8String): UTF8String =
    if (s == null || f == null || t == null) null
    else UTF8String.fromString(
      s.toString.replaceAll(f.toString, javaRepl(t.toString)))

  /** CH substring(s, start, len) on String is BYTE-based
    * (FunctionsString.cpp:516 SubstringImpl copies a raw byte range;
    * the code-point variant is substringUTF8). start is 1-based and
    * must be > 0 (FunctionsString.cpp:1410); out-of-range yields
    * empty, len is clamped to the remaining bytes. */
  def byteSubstring(s: UTF8String, start: Long, len: Long): UTF8String = {
    if (s == null) return null
    if (start <= 0) throw new IllegalArgumentException(
      "Second argument of function substring must be greater than 0.")
    if (len < 0) throw new IllegalArgumentException(
      "Third argument of function substring must be non-negative.")
    // Long args, Long math: a start/len above Int.MaxValue clamps like
    // any other out-of-range value instead of silently truncating to
    // Int. (The reference takes UInt64 here and rejects only >= 2^63
    // — unrepresentable in an Int64 engine — FunctionsString.cpp:1413.)
    val n = s.numBytes()
    if (start > n) return UTF8String.EMPTY_UTF8
    val from = (start - 1).toInt
    val take = math.min(n - (start - 1), len).toInt
    val bytes = s.getBytes
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, from + take))
  }

  /** CH reverse(String) reverses BYTES (FunctionsString.cpp:232
    * ReverseImpl; reverseUTF8 reverses code points). */
  def byteReverse(s: UTF8String): UTF8String = {
    if (s == null) return null
    val b = s.getBytes
    val out = new Array[Byte](b.length)
    var i = 0
    while (i < b.length) { out(i) = b(b.length - 1 - i); i += 1 }
    UTF8String.fromBytes(out)
  }
}
