package graft.functions

import java.io.ByteArrayOutputStream

/** Encoders for the Unicode compression charsets the JDK lacks,
  * used by convertCharset (FunctionsCharset.cpp converts through ICU;
  * these are ports of the PUBLISHED algorithms, verified against the
  * reference's corpus output byte-for-byte):
  *
  *  - UTF-7   — RFC 2152: direct Set D passes through, everything
  *              else in `+`…`-` runs of modified base64 over UTF-16BE;
  *  - SCSU    — UTS #6: single-byte mode over the eight predefined
  *              dynamic windows (SCn to switch, 0x80+offset in
  *              window, SQn to quote); covers every script that fits
  *              one half-block window, which is what the single-pass
  *              encoder emits;
  *  - BOCU-1  — UTN #6: the fully deterministic difference coding
  *              (no encoder freedom at all).
  */
object UnicodeCompression {

  // -------------------------------------------------------------- UTF-7

  private val b64 =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"

  /** RFC 2152 Set D plus space/tab/CR/LF — written directly. */
  private def utf7Direct(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || "'(),-./:?".indexOf(c) >= 0 ||
      c == ' ' || c == '\t' || c == '\r' || c == '\n'

  def encodeUtf7(s: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (utf7Direct(c)) { out.write(c.toInt); i += 1 }
      else if (c == '+') { out.write('+'); out.write('-'); i += 1 }
      else {
        // one shifted run of modified base64 over the UTF-16BE bits
        val run = new StringBuilder
        while (i < s.length && !utf7Direct(s.charAt(i)) && s.charAt(i) != '+') {
          run += s.charAt(i); i += 1
        }
        out.write('+')
        var bits = 0
        var nbits = 0
        run.foreach { ch =>
          bits = (bits << 16) | ch.toInt
          nbits += 16
          while (nbits >= 6) {
            out.write(b64.charAt((bits >> (nbits - 6)) & 0x3f).toInt)
            nbits -= 6
          }
        }
        if (nbits > 0) out.write(b64.charAt((bits << (6 - nbits)) & 0x3f).toInt)
        out.write('-')
      }
    }
    out.toByteArray
  }

  // -------------------------------------------------------------- SCSU

  /** The eight predefined dynamic window offsets (UTS #6 table 4). */
  private val scsuWindows = Array(
    0x0080, // Latin-1 supplement
    0x00C0, // Latin-1 letters + half of Extended-A
    0x0400, // Cyrillic
    0x0600, // Arabic
    0x0900, // Devanagari
    0x3040, // Hiragana
    0x30A0, // Katakana
    0xFF00) // Fullwidth ASCII

  def encodeScsu(s: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val offsets = scsuWindows.clone()
    var win = 0 // current dynamic window
    var i = 0
    def inWindow(w: Int, c: Char): Boolean =
      c >= offsets(w) && c < offsets(w) + 0x80
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x20) {
        // NUL/tab/CR/LF pass through; other controls quote (SQ0)
        if (c == 0 || c == '\t' || c == '\n' || c == '\r') out.write(c.toInt)
        else { out.write(0x01); out.write(c.toInt) } // SQ0
        i += 1
      } else if (c < 0x80) { out.write(c.toInt); i += 1 }
      else {
        if (inWindow(win, c)) { out.write(0x80 + (c - offsets(win))); i += 1 }
        else offsets.indices.find(inWindow(_, c)) match {
          case Some(w) =>
            // one foreign char quotes (SQn), a run switches (SCn)
            val runLen = (i until s.length)
              .takeWhile(j => inWindow(w, s.charAt(j))).size
            if (runLen > 1) { out.write(0x10 + w); win = w } // SCn
            else {
              out.write(0x01 + w) // SQn
              out.write(0x80 + (c - offsets(w)))
              i += 1
            }
          case None =>
            // outside every window: SQU quotes one BMP char raw
            out.write(0x0E) // SQU
            out.write((c >> 8) & 0xff)
            out.write(c & 0xff)
            i += 1
        }
      }
    }
    out.toByteArray
  }

  // -------------------------------------------------------------- BOCU-1

  /** BOCU-1 trail byte for a trail value 0..242 (UTN #6: the 13
    * excluded lead/control bytes shift small values). */
  private def bocuTrail(t: Int): Int =
    if (t >= 20) t + 13
    else Array(0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x10, 0x11, 0x12,
      0x13, 0x14, 0x15, 0x16, 0x17, 0x18, 0x19, 0x1C, 0x1D, 0x1E, 0x1F)(t)

  /** prev-state adjustment after encoding c (UTN #6 bocu1Prev):
    * middle of the Hiragana / CJK / Hangul blocks, else the middle of
    * the 128-block. */
  private def bocu1Prev(c: Int): Int =
    if (c >= 0x3040 && c <= 0x309F) 0x3070
    // CJK: prev = 0x4E00 - BOCU1_REACH_NEG_2, where REACH_NEG_2 =
    // -64 - 43*243 = -10513, so prev = 0x4E00 + 10513 = 0x7711 — the
    // whole Unihan block is then reachable in 2 bytes
    else if (c >= 0x4E00 && c <= 0x9FA5) 0x4E00 + (64 + 43 * 243)
    // Hangul: the (floor) middle of the block, 0xC1D1
    else if (c >= 0xAC00 && c <= 0xD7A3) (0xAC00 + 0xD7A3) / 2
    else (c & ~0x7F) + 0x40

  def encodeBocu1(s: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var prev = 0x40
    var i = 0
    // UTN #6 packDiff: reaches ±63 / ±(63 + 43·243) /
    // ±(… + 3·243²); negative splits use floor div/mod
    def emit(diff0: Int): Unit = {
      var diff = diff0
      if (diff >= -64 && diff < 64) out.write((0x90 + diff) & 0xff)
      else if (diff >= 64) {
        diff -= 64
        if (diff < 43 * 243) { // leads 0xD0..0xFA
          out.write(0xD0 + diff / 243); out.write(bocuTrail(diff % 243))
        } else if (diff < 43 * 243 + 3 * 243 * 243) { // leads 0xFB..0xFD
          diff -= 43 * 243
          out.write(0xFB + diff / (243 * 243))
          out.write(bocuTrail((diff / 243) % 243))
          out.write(bocuTrail(diff % 243))
        } else { // lead 0xFE
          diff -= 43 * 243 + 3 * 243 * 243
          out.write(0xFE)
          out.write(bocuTrail((diff / (243 * 243)) % 243))
          out.write(bocuTrail((diff / 243) % 243))
          out.write(bocuTrail(diff % 243))
        }
      } else { // diff <= -65
        diff += 64 // now in […, -1]
        if (diff >= -43 * 243) { // leads 0x4F..0x25
          val m = Math.floorMod(diff, 243)
          out.write(0x50 + Math.floorDiv(diff, 243))
          out.write(bocuTrail(m))
        } else if (diff >= -(43 * 243 + 3 * 243 * 243)) { // 0x24..0x22
          diff += 43 * 243
          val m1 = Math.floorMod(diff, 243)
          val q1 = Math.floorDiv(diff, 243)
          val m2 = Math.floorMod(q1, 243)
          out.write(0x25 + Math.floorDiv(q1, 243))
          out.write(bocuTrail(m2))
          out.write(bocuTrail(m1))
        } else { // lead 0x21
          diff += 43 * 243 + 3 * 243 * 243
          val m1 = Math.floorMod(diff, 243)
          val q1 = Math.floorDiv(diff, 243)
          val m2 = Math.floorMod(q1, 243)
          val q2 = Math.floorDiv(q1, 243)
          out.write(0x21)
          out.write(bocuTrail(Math.floorMod(q2, 243)))
          out.write(bocuTrail(m2))
          out.write(bocuTrail(m1))
        }
      }
    }
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (cp <= 0x20) {
        // C0 controls and space write as-is; a control (not space)
        // resets prev to the ASCII state
        out.write(cp)
        if (cp != 0x20) prev = 0x40
      } else {
        emit(cp - prev)
        prev = bocu1Prev(cp)
      }
    }
    out.toByteArray
  }
}
