package graft.functions

/** Coding/formatting kernels matching the reference's
  * dbms/src/Functions/FunctionsCoding.h surface: CH-style hex for
  * numbers (whole-byte, big-endian, upper case — hex(257)='0101'),
  * bitmaskToArray, IPv6 Num↔String (inet_ntop6 semantics: lowercase,
  * longest-zero-run `::` compression, embedded IPv4 forms), IPv4ToIPv6
  * mapping, UUID Num↔String, toStringCutToZero.
  */
object CodingFns {
  private final val HEX = "0123456789ABCDEF".toCharArray
  private final val hexLower = "0123456789abcdef".toCharArray

  /** CH hex(number): big-endian, leading zero BYTES trimmed (at least
    * one byte kept), upper case (FunctionsCoding.h:32-34,1266). */
  def hexNum(x: Long): String = {
    var firstByte = 7
    while (firstByte > 0 && ((x >>> (firstByte * 8)) & 0xff) == 0) firstByte -= 1
    val sb = new java.lang.StringBuilder((firstByte + 1) * 2)
    var i = firstByte
    while (i >= 0) {
      val b = ((x >>> (i * 8)) & 0xff).toInt
      sb.append(HEX(b >> 4)).append(HEX(b & 0xf))
      i -= 1
    }
    sb.toString
  }

  /** CH hex(string): per-byte upper-case hex (same as Spark hex). */
  def hexBytes(data: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(data.length * 2)
    data.foreach { b => sb.append(HEX((b >> 4) & 0xf)).append(HEX(b & 0xf)) }
    sb.toString
  }

  /** unhex: case-insensitive, odd length ⇒ implicit leading zero
    * (FunctionsCoding.h:1506-1538). */
  def unhex(s: String): Array[Byte] = {
    val n = s.length
    val out = new Array[Byte]((n + 1) / 2)
    var si = 0
    var oi = 0
    if (n % 2 == 1) { out(0) = digit(s.charAt(0)).toByte; si = 1; oi = 1 }
    while (si < n) {
      out(oi) = ((digit(s.charAt(si)) << 4) | digit(s.charAt(si + 1))).toByte
      si += 2; oi += 1
    }
    out
  }

  private def digit(c: Char): Int = c match {
    case c if c >= '0' && c <= '9' => c - '0'
    case c if c >= 'a' && c <= 'f' => c - 'a' + 10
    case c if c >= 'A' && c <= 'F' => c - 'A' + 10
    case _ => 0
  }

  /** bitmaskToArray(x): powers of two in x's binary representation,
    * ascending (FunctionsCoding.h:38,1612). */
  def bitmaskToArray(x0: Long): Array[Long] = {
    var x = x0
    val out = Array.newBuilder[Long]
    while (x != 0) {
      val low = x & -x // lowest set bit (works on the full u64 ring)
      out += low
      x ^= low
    }
    out.result()
  }

  /** bitmaskToList(x): same decomposition as a comma-joined string. */
  def bitmaskToList(x: Long): String =
    bitmaskToArray(x).map(java.lang.Long.toUnsignedString).mkString(",")

  /** IPv6NumToString over a 16-byte address — inet_ntop6 semantics
    * (FunctionsCoding.h:60-175): lowercase hex words, `::` replaces
    * the longest (first on tie, length ≥ 2) zero run, and `::a.b.c.d`
    * / `::ffff:a.b.c.d` render the embedded-IPv4 forms. */
  def ipv6NumToString(src: Array[Byte]): String = {
    require(src.length == 16, s"IPv6 address must be 16 bytes, got ${src.length}")
    val words = new Array[Int](8)
    var i = 0
    while (i < 16) { words(i / 2) |= (src(i) & 0xff) << ((1 - (i % 2)) << 3); i += 1 }

    var bestBase = -1; var bestLen = 0
    var curBase = -1; var curLen = 0
    i = 0
    while (i < 8) {
      if (words(i) == 0) {
        if (curBase == -1) { curBase = i; curLen = 1 } else curLen += 1
      } else if (curBase != -1) {
        if (bestBase == -1 || curLen > bestLen) { bestBase = curBase; bestLen = curLen }
        curBase = -1
      }
      i += 1
    }
    if (curBase != -1 && (bestBase == -1 || curLen > bestLen)) { bestBase = curBase; bestLen = curLen }
    if (bestBase != -1 && bestLen < 2) bestBase = -1

    val sb = new java.lang.StringBuilder(46)
    i = 0
    var done = false
    while (i < 8 && !done) {
      if (bestBase != -1 && i >= bestBase && i < bestBase + bestLen) {
        if (i == bestBase) sb.append(':')
      } else {
        if (i != 0) sb.append(':')
        if (i == 6 && bestBase == 0 &&
          (bestLen == 6 || (bestLen == 5 && words(5) == 0xffff))) {
          sb.append(src(12) & 0xff).append('.').append(src(13) & 0xff)
            .append('.').append(src(14) & 0xff).append('.').append(src(15) & 0xff)
          done = true
        } else {
          val w = words(i)
          if (w == 0) sb.append('0')
          else {
            var started = false
            var shift = 12
            while (shift >= 0) {
              val d = (w >> shift) & 0xf
              if (d != 0 || started) { sb.append(hexLower(d)); started = true }
              shift -= 4
            }
          }
        }
      }
      i += 1
    }
    if (!done && bestBase != -1 && bestBase + bestLen == 8) sb.append(':')
    sb.toString
  }

  /** convertCharset(s, from, to) — decode the raw bytes with `from`,
    * encode with `to` (FunctionsCharset.cpp, ucnv-based). JVM
    * charsets cover the byte-oriented pages (cp1251, koi8-r, latin1,
    * utf-8/16/32 …); the ICU-only transfer encodings the reference
    * also accepts (utf-7, bocu-1, scsu) are a DOCUMENTED DIVERGENCE —
    * Spark bundles only icu4j's core jar, not the icu4j-charset
    * converter module (corpus 00436 stays unpinned on those).
    * Substitution on malformed/unmappable input matches ucnv's
    * default. */
  def chCharset(name: String): java.nio.charset.Charset =
    java.nio.charset.Charset.forName(name)

  /** convertCharset (FunctionsCharset.cpp): decode `from`, encode
    * `to`, SUBSTITUTE on malformed/unmappable in both directions
    * (UCNV_*_CALLBACK_SUBSTITUTE). Returns raw bytes — the target
    * charset's output is not generally valid UTF-8. The Unicode
    * compression charsets the JDK lacks (UTF-7 / SCSU / BOCU-1,
    * RFC 2152 / UTS #6 / UTN #6) encode through
    * [[UnicodeCompression]]. */
  def convertCharset(src: Array[Byte],
      from: org.apache.spark.unsafe.types.UTF8String,
      to: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    import java.nio.charset.CodingErrorAction
    def norm(n: String) = n.toLowerCase.replace("-", "").replace("_", "")
    val fromCs = chCharset(from.toString)
    // single-byte charsets decode through a per-byte table whose
    // UNDEFINED entries keep the byte value as a C0/C1 control —
    // ICU's windows-125x tables do (cp1251 0x98 → U+0098), the JDK
    // substitutes U+FFFD
    val chars =
      if (fromCs.canEncode && fromCs.newEncoder().maxBytesPerChar() == 1.0f) {
        val table = new Array[Char](256)
        var b = 0
        while (b < 256) {
          val out = fromCs.decode(
            java.nio.ByteBuffer.wrap(Array(b.toByte))).toString
          table(b) =
            if (out.length == 1 && out.charAt(0) != '�') out.charAt(0)
            else b.toChar
          b += 1
        }
        val sb = new java.lang.StringBuilder(src.length)
        src.foreach(x => sb.append(table(x & 0xff)))
        sb.toString
      } else {
        val dec = fromCs.newDecoder()
          .onMalformedInput(CodingErrorAction.REPLACE)
          .onUnmappableCharacter(CodingErrorAction.REPLACE)
        dec.decode(java.nio.ByteBuffer.wrap(src)).toString
      }
    norm(to.toString) match {
      case "utf7" => UnicodeCompression.encodeUtf7(chars)
      case "scsu" => UnicodeCompression.encodeScsu(chars)
      case "bocu1" => UnicodeCompression.encodeBocu1(chars)
      case _ =>
        val toCs = chCharset(to.toString)
        if (toCs.canEncode && toCs.newEncoder().maxBytesPerChar() == 1.0f) {
          // symmetric identity fallback on ENCODE: ICU round-trips
          // the undefined control bytes (U+0098 → 0x98 in cp1251)
          var inv = Map.empty[Char, Byte]
          var b = 255
          while (b >= 0) {
            val out = toCs.decode(
              java.nio.ByteBuffer.wrap(Array(b.toByte))).toString
            val ch =
              if (out.length == 1 && out.charAt(0) != '�') out.charAt(0)
              else b.toChar
            inv += (ch -> b.toByte)
            b -= 1
          }
          val outB = new Array[Byte](chars.length)
          var i = 0
          while (i < chars.length) {
            outB(i) = inv.getOrElse(chars.charAt(i), '?'.toByte)
            i += 1
          }
          outB
        } else {
          val enc = toCs.newEncoder()
            .onMalformedInput(CodingErrorAction.REPLACE)
            .onUnmappableCharacter(CodingErrorAction.REPLACE)
          val out = enc.encode(java.nio.CharBuffer.wrap(chars))
          val arr = new Array[Byte](out.remaining())
          out.get(arr)
          arr
        }
    }
  }

  /** LEB128 unsigned varint bytes of n, as a raw-byte string —
    * the serialization of a count aggregate state (writeVarUInt;
    * corpus 00357 hex(toString(countState())) = '0A'). */
  def varintStr(n0: Long): org.apache.spark.unsafe.types.UTF8String = {
    var n = n0
    val out = Array.newBuilder[Byte]
    while (java.lang.Long.compareUnsigned(n, 0x80L) >= 0) {
      out += ((n & 0x7f) | 0x80).toByte
      n = n >>> 7
    }
    out += n.toByte
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out.result())
  }

  /** toFixedString(s, n): zero-pad the raw BYTES to n
    * (DataTypeFixedString — byte-level, so binary payloads whose
    * UTF8 char count differs from their byte count pad correctly). */
  def fixedString(s: org.apache.spark.unsafe.types.UTF8String, n: Int):
      org.apache.spark.unsafe.types.UTF8String = {
    val b = s.getBytes
    if (b.length >= n) s
    else org.apache.spark.unsafe.types.UTF8String.fromBytes(
      java.util.Arrays.copyOf(b, n))
  }

  /** cutIPv6(addr16, v6cut, v4cut): zero the trailing N bytes — N
    * chosen by IPv4-mapped detection (bytes 0-7 zero and bytes 8-11 =
    * 00 00 FF FF, FunctionsCoding.h:262-423) — then render through
    * [[ipv6NumToString]]. Invoked via codegen'd StaticInvoke. */
  def cutIPv6(src0: Array[Byte], cutV6: Int, cutV4: Int):
      org.apache.spark.unsafe.types.UTF8String = {
    val src =
      if (src0.length == 16) src0 else java.util.Arrays.copyOf(src0, 16)
    var i = 0; var headZero = true
    while (i < 8) { if (src(i) != 0) headZero = false; i += 1 }
    val mapped = headZero && src(8) == 0 && src(9) == 0 &&
      (src(10) & 0xff) == 0xff && (src(11) & 0xff) == 0xff
    val cut = math.min(math.max(if (mapped) cutV4 else cutV6, 0), 16)
    val a = src.clone()
    i = 16 - cut
    while (i < 16) { a(i) = 0; i += 1 }
    org.apache.spark.unsafe.types.UTF8String.fromString(ipv6NumToString(a))
  }

  /** IPv6StringToNum: parse full/compressed/embedded-IPv4 forms to 16
    * bytes; malformed input yields all-zero (the reference's
    * default-value convention, FunctionsCoding.h:429-490). */
  def ipv6StringToNum(s: String): Array[Byte] = {
    val out = new Array[Byte](16)
    try {
      val (head, tail) = s.indexOf("::") match {
        case -1 => (s, null)
        case ix => (s.substring(0, ix), s.substring(ix + 2))
      }
      def parseGroups(part: String): Seq[Array[Byte]] =
        if (part == null || part.isEmpty) Seq.empty
        else part.split(":", -1).toSeq.map { g =>
          if (g.contains('.')) { // embedded IPv4 tail
            val o = g.split("\\.").map(_.toInt)
            require(o.length == 4 && o.forall(b => b >= 0 && b <= 255))
            Array[Byte](o(0).toByte, o(1).toByte, o(2).toByte, o(3).toByte)
          } else {
            require(g.nonEmpty && g.length <= 4)
            val v = Integer.parseInt(g, 16)
            Array[Byte]((v >> 8).toByte, v.toByte)
          }
        }
      val h = parseGroups(head).flatten
      val t = if (tail == null) Seq.empty else parseGroups(tail).flatten
      require(h.length + t.length <= 16 && (tail != null || h.length == 16))
      var i = 0
      h.foreach { b => out(i) = b; i += 1 }
      i = 16 - t.length
      t.foreach { b => out(i) = b; i += 1 }
      out
    } catch { case _: Exception => new Array[Byte](16) }
  }

  /** IPv4ToIPv6(n): the ::ffff:a.b.c.d mapped address
    * (FunctionsCoding.h:927). */
  def ipv4ToIpv6(n: Long): Array[Byte] = {
    val out = new Array[Byte](16)
    out(10) = 0xff.toByte
    out(11) = 0xff.toByte
    out(12) = ((n >> 24) & 0xff).toByte
    out(13) = ((n >> 16) & 0xff).toByte
    out(14) = ((n >> 8) & 0xff).toByte
    out(15) = (n & 0xff).toByte
    out
  }

  /** UUIDNumToString: 16 bytes → 8-4-4-4-12 lowercase
    * (FunctionsCoding.h:988-1035). */
  def uuidNumToString(src: Array[Byte]): String = {
    require(src.length == 16, s"UUID must be 16 bytes, got ${src.length}")
    val sb = new java.lang.StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      sb.append(hexLower((src(i) >> 4) & 0xf)).append(hexLower(src(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  /** UUIDStringToNum: 36-char textual UUID → 16 bytes
    * (FunctionsCoding.h:1147); malformed yields zeros. */
  def uuidStringToNum(s: String): Array[Byte] = {
    val hex = s.replace("-", "")
    if (hex.length != 32) new Array[Byte](16) else unhex(hex)
  }

  /** toStringCutToZero: bytes up to the first NUL
    * (FunctionsCoding.h:1720). */
  def toStringCutToZero(data: Array[Byte]): String = {
    var n = 0
    while (n < data.length && data(n) != 0) n += 1
    new String(data, 0, n, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** decodeURLComponent: %XX percent-decoding only — unlike
    * java.net.URLDecoder, '+' stays '+' (FunctionsURL.h
    * DecodeURLComponentImpl). Malformed escapes pass through. */
  def decodeUrlComponent(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i)
      if (c == '%' && i + 2 < bytes.length &&
        isHexDigit(bytes(i + 1)) && isHexDigit(bytes(i + 2))) {
        out.write((digit(bytes(i + 1).toChar) << 4) | digit(bytes(i + 2).toChar))
        i += 3
      } else { out.write(c.toInt); i += 1 }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def isHexDigit(b: Byte): Boolean = {
    val c = b.toChar
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  }

  /** URLHierarchy(url) — growing URL prefixes per the reference's
    * URLParser walk (FunctionsURL.h URLHierarchyImpl): token 1 =
    * protocol + domain (+ one slash), each further token adds one
    * path/query segment; URLs without `proto://` yield the whole URL
    * as the single token. */
  def urlHierarchy(url: String): Array[String] = {
    val out = Array.newBuilder[String]
    val end = url.length
    var pos = 0
    // protocol scan: letters/digits (exclusive bounds as in the ref)
    while (pos < end && {
      val c = url.charAt(pos)
      (c > 'a' && c < 'z') || (c > '0' && c < '9')
    }) pos += 1
    val hasProto = pos != 0 && pos < end && url.charAt(pos) == ':' &&
      pos + 2 < end && url.charAt(pos + 1) == '/' && url.charAt(pos + 2) == '/' &&
      pos + 3 < end
    if (!hasProto) {
      if (end > 0) out += url
      return out.result()
    }
    pos += 3
    while (pos < end && "/?#".indexOf(url.charAt(pos)) < 0) pos += 1
    if (pos != end) pos += 1
    out += url.substring(0, pos)
    var done = false
    while (!done && pos < end) {
      while (pos < end && "/?#".indexOf(url.charAt(pos)) >= 0) pos += 1
      if (pos == end) done = true
      else {
        while (pos < end && "/?#".indexOf(url.charAt(pos)) < 0) pos += 1
        if (pos != end) pos += 1
        out += url.substring(0, pos)
      }
    }
    out.result()
  }

  /** extractURLParameterNames(url) — name tokens of the query string
    * (FunctionsURL.h:637-713 ExtractURLParameterNamesImpl): after the
    * first `?`/`#`, each run up to `=`/`&`/`#` is a name; `?` inside
    * restarts the scan; a trailing run with no delimiter after it is
    * not emitted (the reference's strpbrk-returns-null path). */
  def extractUrlParameterNames(url: String): Array[String] = {
    val out = Array.newBuilder[String]
    val n = url.length
    def pbrk(from: Int, set: String): Int = {
      var i = from
      while (i < n && set.indexOf(url.charAt(i)) < 0) i += 1
      if (i >= n) -1 else i
    }
    var pos = pbrk(0, "?#")
    var done = pos == -1
    while (!done) {
      pos += 1
      var matched = false
      while (!matched && !done) {
        val tb = pos
        val p = pbrk(pos, "=&#?")
        if (p == -1) done = true
        else if (url.charAt(p) == '?') pos = p + 1
        else { out += url.substring(tb, p); pos = p; matched = true }
      }
      if (!done) {
        pos = pbrk(pos, "&#")
        if (pos == -1) done = true
      }
    }
    out.result()
  }

  /** URLPathHierarchy(url) — growing path prefixes starting after the
    * domain (FunctionsURL.h:811-900 URLPathHierarchyImpl): requires
    * `proto://`; token k spans from the slash after the domain through
    * the k-th path/query segment (trailing delimiter kept). */
  def urlPathHierarchy(url: String): Array[String] = {
    val out = Array.newBuilder[String]
    val n = url.length
    var pos = 0
    while (pos < n && {
      val c = url.charAt(pos)
      (c > 'a' && c < 'z') || (c > '0' && c < '9')
    }) pos += 1
    if (pos == 0 || pos >= n || url.charAt(pos) != ':' ||
      pos + 2 >= n || url.charAt(pos + 1) != '/' || url.charAt(pos + 2) != '/' ||
      pos + 3 >= n) return Array.empty
    pos += 3
    while (pos < n && "/?#".indexOf(url.charAt(pos)) < 0) pos += 1
    val start = pos
    if (pos != n) pos += 1
    var done = false
    while (!done) {
      while (pos < n && "/?#".indexOf(url.charAt(pos)) >= 0) pos += 1
      if (pos >= n) done = true
      else {
        while (pos < n && "/?#".indexOf(url.charAt(pos)) < 0) pos += 1
        if (pos != n) pos += 1
        out += url.substring(start, pos)
      }
    }
    out.result()
  }

  /** firstSignificantSubdomain — the exact reference algorithm
    * (FunctionsURL.h ExtractFirstSignificantSubdomain): host after
    * `scheme://` with a leading `www.` and one trailing dot stripped;
    * 0 dots → whole host, 1 dot → first label, ≥2 dots → the label
    * before a {com., net., org., co.} second-level suffix, else the
    * label between the last two dots. */
  def firstSignificantSubdomain(url: String): String = {
    val schemeIx = url.indexOf("://")
    if (schemeIx < 0) return ""
    val start = schemeIx + 3
    var end = start
    while (end < url.length && "/?#:".indexOf(url.charAt(end)) < 0) end += 1
    var host = url.substring(start, end)
    if (host.length > 4 && host.startsWith("www.")) host = host.substring(4)
    if (host.nonEmpty && host.charAt(host.length - 1) == '.')
      host = host.substring(0, host.length - 1)
    if (host.isEmpty) return ""
    val dots = (0 until host.length).filter(host.charAt(_) == '.')
    if (dots.isEmpty) return host
    if (dots.length == 1) return host.substring(0, dots(0))
    val p0 = dots.last
    val p1 = dots(dots.length - 2)
    val p2 = if (dots.length >= 3) dots(dots.length - 3) else -1
    val afterP1 = host.substring(p1 + 1)
    if (afterP1.startsWith("com.") || afterP1.startsWith("net.") ||
      afterP1.startsWith("org.") || afterP1.startsWith("co."))
      host.substring(p2 + 1, p1)
    else host.substring(p1 + 1, p0)
  }

  // --- reinterpretAs* family (FunctionsReinterpret.h) -------------
  // The reference's memcpy semantics: a string's first
  // min(len, width) bytes read little-endian, zero-padded when
  // shorter; numbers render as their little-endian bytes with
  // trailing zero bytes stripped.

  /** First min(len, width) bytes little-endian, zero-extended. */
  def reinterpretUnsigned(data: Array[Byte], width: Int): Long = {
    var v = 0L
    val n = math.min(data.length, width)
    var i = 0
    while (i < n) { v |= (data(i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** Same read, sign-extended from the width's top bit. */
  def reinterpretSigned(data: Array[Byte], width: Int): Long = {
    val v = reinterpretUnsigned(data, width)
    if (width >= 8) v
    else {
      val shift = 64 - 8 * width
      (v << shift) >> shift
    }
  }

  def reinterpretFloat32(data: Array[Byte]): Float =
    java.lang.Float.intBitsToFloat(reinterpretUnsigned(data, 4).toInt)

  def reinterpretFloat64(data: Array[Byte]): Double =
    java.lang.Double.longBitsToDouble(reinterpretUnsigned(data, 8))

  /** reinterpretAsString(integer): little-endian bytes, trailing
    * zero bytes stripped (FunctionsReinterpret.h:60-70). */
  def reinterpretAsStringBytes(x: Long): Array[Byte] = {
    var len = 8
    while (len > 0 && ((x >>> (8 * (len - 1))) & 0xff) == 0) len -= 1
    val out = new Array[Byte](len)
    var i = 0
    while (i < len) { out(i) = ((x >>> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }
}
