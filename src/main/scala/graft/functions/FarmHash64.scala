package graft.functions

/** FarmHash 64-bit string hash — the reference's `farmHash64`
  * (dbms/src/Functions/FunctionsHashing.h:852 → farmhash::Hash64).
  * Reimplemented in Scala from the published FarmHash algorithm
  * (Geoff Pike, Google 2014, MIT license); behavioral vectors
  * generated from the library the reference vendors are pinned in
  * HashCodingSpec.
  *
  * Dispatch mirrors the portable build: ≤16 / ≤32 bytes use the
  * na-variant short kernels, ≤64 and ≤96 the xo-variant double-H32
  * kernels, ≤256 the na 64-byte chunk loop, longer inputs the uo
  * 64-byte chunk loop. The reference's SSE4.2 build switches to a
  * SIMD kernel only at ≥512 bytes; inputs that long hash to the
  * portable dispatch here (documented deviation — group-key hashing
  * never sees half-KB keys).
  *
  * All arithmetic is mod-2^64: JVM Long add/multiply wrap identically
  * to uint64_t; unsigned shifts are `>>>`.
  */
object FarmHash64 {
  private final val K0 = 0xc3a5c85c97cb3127L
  private final val K1 = 0xb492b66fbe98f273L
  private final val K2 = 0x9ae16a3b2f90404fL

  @inline private def fetch64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def fetch32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  @inline private def rot(v: Long, r: Int): Long = java.lang.Long.rotateRight(v, r)
  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  @inline private def hashLen16(u: Long, v: Long, mul: Long): Long = {
    var a = (u ^ v) * mul
    a ^= a >>> 47
    var b = (v ^ a) * mul
    b ^= b >>> 47
    b * mul
  }

  // --- na variant short kernels -----------------------------------

  private def naLen0to16(s: Array[Byte], len: Int): Long = {
    if (len >= 8) {
      val mul = K2 + len * 2
      val a = fetch64(s, 0) + K2
      val b = fetch64(s, len - 8)
      val c = rot(b, 37) * mul + a
      val d = (rot(a, 25) + b) * mul
      hashLen16(c, d, mul)
    } else if (len >= 4) {
      val mul = K2 + len * 2
      val a = fetch32(s, 0)
      hashLen16(len + (a << 3), fetch32(s, len - 4), mul)
    } else if (len > 0) {
      val a = s(0) & 0xffL
      val b = s(len >> 1) & 0xffL
      val c = s(len - 1) & 0xffL
      val y = (a + (b << 8)) & 0xffffffffL
      val z = (len + (c << 2)) & 0xffffffffL
      shiftMix(y * K2 ^ z * K0) * K2
    } else K2
  }

  private def naLen17to32(s: Array[Byte], len: Int): Long = {
    val mul = K2 + len * 2
    val a = fetch64(s, 0) * K1
    val b = fetch64(s, 8)
    val c = fetch64(s, len - 8) * mul
    val d = fetch64(s, len - 16) * K2
    hashLen16(rot(a + b, 43) + rot(c, 30) + d,
      a + rot(b + K2, 18) + c, mul)
  }

  /** 16-byte mix of s[off..off+32), a, b. */
  @inline private def weak32(s: Array[Byte], off: Int, a0: Long, b0: Long): (Long, Long) = {
    val w = fetch64(s, off)
    val x = fetch64(s, off + 8)
    val y = fetch64(s, off + 16)
    val z = fetch64(s, off + 24)
    var a = a0 + w
    var b = rot(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rot(a, 44)
    (a + z, b + c)
  }

  /** na Hash64 for 65..256 bytes (seed 81, 64-byte chunk loop). */
  private def naHash64(s: Array[Byte], len: Int): Long = {
    var x = 81L
    var y = 81L * K1 + 113
    var z = shiftMix(y * K2 + 113) * K2
    var v = (0L, 0L)
    var w = (0L, 0L)
    x = x * K2 + fetch64(s, 0)

    val endOff = ((len - 1) / 64) * 64
    val last64 = len - 64
    var off = 0
    while (off != endOff) {
      x = rot(x + y + v._1 + fetch64(s, off + 8), 37) * K1
      y = rot(y + v._2 + fetch64(s, off + 48), 42) * K1
      x ^= w._2
      y += v._1 + fetch64(s, off + 40)
      z = rot(z + w._1, 33) * K1
      v = weak32(s, off, v._2 * K1, x + w._1)
      w = weak32(s, off + 32, z + w._2, y + fetch64(s, off + 16))
      val t = z; z = x; x = t
      off += 64
    }
    val mul = K1 + ((z & 0xff) << 1)
    val o = last64
    var wf = w._1 + ((len - 1) & 63)
    val vf = v._1 + wf
    wf += vf
    x = rot(x + y + vf + fetch64(s, o + 8), 37) * mul
    y = rot(y + v._2 + fetch64(s, o + 48), 42) * mul
    x ^= w._2 * 9
    y += vf * 9 + fetch64(s, o + 40)
    z = rot(z + wf, 33) * mul
    v = weak32(s, o, v._2 * mul, x + wf)
    w = weak32(s, o + 32, z + w._2, y + fetch64(s, o + 16))
    val t = z; z = x; x = t
    hashLen16(hashLen16(v._1, w._1, mul) + shiftMix(y) * K0 + z,
      hashLen16(v._2, w._2, mul) + x, mul)
  }

  // --- xo variant 33..96 kernels ----------------------------------

  private def h32(s: Array[Byte], off: Int, len: Int, mul: Long,
      seed0: Long = 0, seed1: Long = 0): Long = {
    val a = fetch64(s, off) * K1
    val b = fetch64(s, off + 8)
    val c = fetch64(s, off + len - 8) * mul
    val d = fetch64(s, off + len - 16) * K2
    val u = rot(a + b, 43) + rot(c, 30) + d + seed0
    val v = a + rot(b + K2, 18) + c + seed1
    val a2 = shiftMix((u ^ v) * mul)
    shiftMix((v ^ a2) * mul)
  }

  private def xoLen33to64(s: Array[Byte], len: Int): Long = {
    val mul0 = K2 - 30
    val mul1 = K2 - 30 + 2 * len
    val h0 = h32(s, 0, 32, mul0)
    val h1 = h32(s, len - 32, 32, mul1)
    (h1 * mul1 + h0) * mul1
  }

  private def xoLen65to96(s: Array[Byte], len: Int): Long = {
    val mul0 = K2 - 114
    val mul1 = K2 - 114 + 2 * len
    val h0 = h32(s, 0, 32, mul0)
    val h1 = h32(s, 32, 32, mul1)
    val h2 = h32(s, len - 32, 32, mul1, h0, h1)
    (h2 * 9 + (h0 >>> 17) + (h1 >>> 21)) * mul1
  }

  // --- uo variant >256 loop ---------------------------------------

  @inline private def uoH(x: Long, y: Long, mul: Long, r: Int): Long = {
    var a = (x ^ y) * mul
    a ^= a >>> 47
    val b = (y ^ a) * mul
    rot(b, r) * mul
  }

  /** uo Hash64WithSeeds(81, 0) — inputs over 256 bytes. */
  private def uoHash64(s: Array[Byte], len: Int): Long = {
    val seed0 = 81L
    val seed1 = 0L
    var x = seed0
    var y = seed1 * K2 + 113
    var z = shiftMix(y * K2) * K2
    var vf = seed0; var vs = seed1
    var wf = 0L; var ws = 0L
    var u = x - z
    x *= K2
    val mul = K2 + (u & 0x82)

    val endOff = ((len - 1) / 64) * 64
    val last64 = len - 64
    var off = 0
    do {
      val a0 = fetch64(s, off)
      val a1 = fetch64(s, off + 8)
      val a2 = fetch64(s, off + 16)
      val a3 = fetch64(s, off + 24)
      val a4 = fetch64(s, off + 32)
      val a5 = fetch64(s, off + 40)
      val a6 = fetch64(s, off + 48)
      val a7 = fetch64(s, off + 56)
      x += a0 + a1
      y += a2
      z += a3
      vf += a4
      vs += a5 + a1
      wf += a6
      ws += a7

      x = rot(x, 26)
      x *= 9
      y = rot(y, 29)
      z *= mul
      vf = rot(vf, 33)
      vs = rot(vs, 30)
      wf ^= x
      wf *= 9
      z = rot(z, 32)
      z += ws
      ws += z
      z *= 9
      var t = u; u = y; y = t

      z += a0 + a6
      vf += a2
      vs += a3
      wf += a4
      ws += a5 + a6
      x += a1
      y += a7

      y += vf
      vf += x - y
      vs += wf
      wf += vs
      ws += x - y
      x += ws
      ws = rot(ws, 34)
      t = u; u = z; z = t
      off += 64
    } while (off != endOff)

    val o = last64
    u *= 9
    vs = rot(vs, 28)
    vf = rot(vf, 20)
    wf += (len - 1) & 63
    u += y
    y += u
    x = rot(y - x + vf + fetch64(s, o + 8), 37) * mul
    y = rot(y ^ vs ^ fetch64(s, o + 48), 42) * mul
    x ^= ws * 9
    y += vf + fetch64(s, o + 40)
    z = rot(z + wf, 33) * mul
    val v2 = weak32(s, o, vs * mul, x + wf)
    val w2 = weak32(s, o + 32, z + ws, y + fetch64(s, o + 16))
    uoH(hashLen16(v2._1 + x, w2._1 ^ y, mul) + z - u,
      uoH(v2._2 + y, w2._2 + z, K2, 30) ^ x, K2, 31)
  }

  /** farmhash::Hash64 portable dispatch (xo variant). */
  def hash(data: Array[Byte]): Long = {
    val n = data.length
    if (n <= 16) naLen0to16(data, n)
    else if (n <= 32) naLen17to32(data, n)
    else if (n <= 64) xoLen33to64(data, n)
    else if (n <= 96) xoLen65to96(data, n)
    else if (n <= 256) naHash64(data, n)
    else uoHash64(data, n)
  }
}
