package graft.functions

/** SipHash-2-4 with k0 = k1 = 0 — the reference's canonical 64-bit
  * string hash (dbms/src/Common/SipHash.h; exposed as `sipHash64`,
  * dbms/src/Functions/FunctionsHashing.h). Implemented from the
  * public SipHash specification (Aumasson & Bernstein); verified
  * against independently generated spec vectors in SipHashSpec.
  *
  * The reference finalizes with `current_bytes[7] = cnt` (length mod
  * 256 in the top byte of the last word) — standard SipHash padding.
  */
object SipHash64 {

  /** Static entry point (also called from generated Java code). */
  def hash(data: Array[Byte]): Long = {
    var v0 = 0x736f6d6570736575L
    var v1 = 0x646f72616e646f6dL
    var v2 = 0x6c7967656e657261L
    var v3 = 0x7465646279746573L

    @inline def round(): Unit = {
      v0 += v1; v1 = java.lang.Long.rotateLeft(v1, 13); v1 ^= v0; v0 = java.lang.Long.rotateLeft(v0, 32)
      v2 += v3; v3 = java.lang.Long.rotateLeft(v3, 16); v3 ^= v2
      v0 += v3; v3 = java.lang.Long.rotateLeft(v3, 21); v3 ^= v0
      v2 += v1; v1 = java.lang.Long.rotateLeft(v1, 17); v1 ^= v2; v2 = java.lang.Long.rotateLeft(v2, 32)
    }

    val n = data.length
    var i = 0
    while (n - i >= 8) {
      val m = littleEndianLong(data, i)
      v3 ^= m; round(); round(); v0 ^= m
      i += 8
    }
    // last word: remaining bytes, zero-padded, length in byte 7
    var last = (n & 0xff).toLong << 56
    var j = n - i - 1
    while (j >= 0) {
      last |= (data(i + j) & 0xffL) << (8 * j)
      j -= 1
    }
    v3 ^= last; round(); round(); v0 ^= last
    v2 ^= 0xff
    round(); round(); round(); round()
    v0 ^ v1 ^ v2 ^ v3
  }

  /** sipHash128 — same state machine, 16-byte output (v0^v1, v2^v3)
    * little-endian (reference SipHash.h get128; FunctionsHashing.h:139
    * FixedString(16) result). */
  def hash128(data: Array[Byte]): Array[Byte] = {
    var v0 = 0x736f6d6570736575L
    var v1 = 0x646f72616e646f6dL
    var v2 = 0x6c7967656e657261L
    var v3 = 0x7465646279746573L

    @inline def round(): Unit = {
      v0 += v1; v1 = java.lang.Long.rotateLeft(v1, 13); v1 ^= v0; v0 = java.lang.Long.rotateLeft(v0, 32)
      v2 += v3; v3 = java.lang.Long.rotateLeft(v3, 16); v3 ^= v2
      v0 += v3; v3 = java.lang.Long.rotateLeft(v3, 21); v3 ^= v0
      v2 += v1; v1 = java.lang.Long.rotateLeft(v1, 17); v1 ^= v2; v2 = java.lang.Long.rotateLeft(v2, 32)
    }

    val n = data.length
    var i = 0
    while (n - i >= 8) {
      val m = littleEndianLong(data, i)
      v3 ^= m; round(); round(); v0 ^= m
      i += 8
    }
    var last = (n & 0xff).toLong << 56
    var j = n - i - 1
    while (j >= 0) {
      last |= (data(i + j) & 0xffL) << (8 * j)
      j -= 1
    }
    v3 ^= last; round(); round(); v0 ^= last
    v2 ^= 0xff
    round(); round(); round(); round()
    val out = new Array[Byte](16)
    writeLE(out, 0, v0 ^ v1)
    writeLE(out, 8, v2 ^ v3)
    out
  }

  @inline private def writeLE(out: Array[Byte], off: Int, v: Long): Unit = {
    var k = 0
    while (k < 8) { out(off + k) = ((v >>> (8 * k)) & 0xff).toByte; k += 1 }
  }

  private def littleEndianLong(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) |
      ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 3) & 0xffL) << 24) |
      ((b(off + 4) & 0xffL) << 32) |
      ((b(off + 5) & 0xffL) << 40) |
      ((b(off + 6) & 0xffL) << 48) |
      ((b(off + 7) & 0xffL) << 56)
}
