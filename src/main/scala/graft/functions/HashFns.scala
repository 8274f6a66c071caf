package graft.functions

/** Non-cryptographic hash kernels matching the reference's hash
  * function surface (dbms/src/Functions/FunctionsHashing.h):
  * cityHash64, intHash32, intHash64, halfMD5, URLHash.
  *
  * CityHash64 is the published CityHash v1.0 algorithm (Pike &
  * Alakuijala, Google 2011, MIT license) reimplemented in Scala;
  * verified against behavioral test vectors generated from the
  * library the reference vendors (HashFnsSpec). intHash64 is the
  * MurmurHash3 finalizer, intHash32 is Thomas Wang's 64→32 bit mix
  * (www.concentric.net/~ttwang/tech/inthash.htm) with the reference's
  * salts (FunctionsHashing.h:155,165).
  */
object CityHash64 {
  private final val K0 = 0xc3a5c85c97cb3127L
  private final val K1 = 0xb492b66fbe98f273L
  private final val K2 = 0x9ae16a3b2f90404fL
  private final val K3 = 0xc949d7c7509e6557L
  private final val KMul = 0x9ddfea08eb382d69L

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

  @inline private def rotate(v: Long, shift: Int): Long =
    if (shift == 0) v else java.lang.Long.rotateRight(v, shift)

  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  /** Murmur-inspired 128→64 fold. */
  @inline private def hashLen16(u: Long, v: Long): Long = {
    var a = (u ^ v) * KMul
    a ^= a >>> 47
    var b = (v ^ a) * KMul
    b ^= b >>> 47
    b * KMul
  }

  private def hashLen0to16(s: Array[Byte], len: Int): Long = {
    if (len > 8) {
      val a = fetch64(s, 0)
      val b = fetch64(s, len - 8)
      hashLen16(a, rotate(b + len, len)) ^ b
    } else if (len >= 4) {
      val a = fetch32(s, 0)
      hashLen16(len + (a << 3), fetch32(s, len - 4))
    } else if (len > 0) {
      val a = s(0) & 0xffL
      val b = s(len >> 1) & 0xffL
      val c = s(len - 1) & 0xffL
      val y = (a + (b << 8)) & 0xffffffffL
      val z = (len + (c << 2)) & 0xffffffffL
      shiftMix(y * K2 ^ z * K3) * K2
    } else K2
  }

  private def hashLen17to32(s: Array[Byte], len: Int): Long = {
    val a = fetch64(s, 0) * K1
    val b = fetch64(s, 8)
    val c = fetch64(s, len - 8) * K2
    val d = fetch64(s, len - 16) * K0
    hashLen16(rotate(a - b, 43) + rotate(c, 30) + d,
      a + rotate(b ^ K3, 20) - c + len)
  }

  private def hashLen33to64(s: Array[Byte], len: Int): Long = {
    var z = fetch64(s, 24)
    var a = fetch64(s, 0) + (len + fetch64(s, len - 16)) * K0
    var b = rotate(a + z, 52)
    var c = rotate(a, 37)
    a += fetch64(s, 8)
    c += rotate(a, 7)
    a += fetch64(s, 16)
    val vf = a + z
    val vs = b + rotate(a, 31) + c
    a = fetch64(s, 16) + fetch64(s, len - 32)
    z = fetch64(s, len - 8)
    b = rotate(a + z, 52)
    c = rotate(a, 37)
    a += fetch64(s, len - 24)
    c += rotate(a, 7)
    a += fetch64(s, len - 16)
    val wf = a + z
    val ws = b + rotate(a, 31) + c
    val r = shiftMix((vf + ws) * K2 + (wf + vs) * K0)
    shiftMix(r * K0 + vs) * K2
  }

  /** 16-byte mix of s[off..off+32), a, b (CityHash WeakHashLen32). */
  @inline private def weakHash32(s: Array[Byte], off: Int, a0: Long, b0: Long): (Long, Long) = {
    val w = fetch64(s, off)
    val x = fetch64(s, off + 8)
    val y = fetch64(s, off + 16)
    val z = fetch64(s, off + 24)
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    (a + z, b + c)
  }

  def hash(data: Array[Byte]): Long = {
    val n = data.length
    if (n <= 16) return hashLen0to16(data, n)
    if (n <= 32) return hashLen17to32(data, n)
    if (n <= 64) return hashLen33to64(data, n)

    // >64: hash the tail first, then walk 64-byte chunks with 56
    // bytes of rolling state
    var x = fetch64(data, 0)
    var y = fetch64(data, n - 16) ^ K1
    var z = fetch64(data, n - 56) ^ K0
    var v = weakHash32(data, n - 64, n.toLong, y)
    var w = weakHash32(data, n - 32, n.toLong * K1, K0)
    z += shiftMix(v._2) * K1
    x = rotate(z + x, 39) * K1
    y = rotate(y, 33) * K1

    var len = (n - 1) & ~63
    var off = 0
    while (len != 0) {
      x = rotate(x + y + v._1 + fetch64(data, off + 16), 37) * K1
      y = rotate(y + v._2 + fetch64(data, off + 48), 42) * K1
      x ^= w._2
      y ^= v._1
      z = rotate(z ^ w._1, 33)
      v = weakHash32(data, off, v._2 * K1, x + w._1)
      w = weakHash32(data, off + 32, z + w._2, y)
      val t = z; z = x; x = t
      off += 64
      len -= 64
    }
    hashLen16(hashLen16(v._1, w._1) + shiftMix(y) * K1 + z,
      hashLen16(v._2, w._2) + x)
  }
}

object HashFns {
  /** cityHash64(string) — reference FunctionsHashing.h:843. */
  def cityHash64(data: Array[Byte]): Long = CityHash64.hash(data)

  /** intHash64(x) = murmur finalizer of (x ^ salt)
    * (FunctionsHashing.h:165; Common/HashTable/Hash.h:13). */
  /** The UNSALTED murmur finalizer (Common/HashTable/Hash.h
    * intHash64) — uniqCombined's key hash; the SQL function intHash64
    * below salts first (FunctionsHashing.h IntHash64Impl). */
  def rawIntHash64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  def intHash64(x0: Long): Long = {
    var x = x0 ^ 0x4cf2d2baae6da887L
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** intHash32(x) — Thomas Wang 64→32 mix with the reference's salt
    * (FunctionsHashing.h:155; Common/HashTable/Hash.h:144). Returned
    * as Long in [0, 2^32) (UInt32 has no unsigned JVM primitive). */
  def intHash32(key0: Long): Long =
    intHash32Salted(key0, 0x75d9543de018bf45L)

  /** The salt-templated form (Common/HashTable/Hash.h intHash32<salt>);
    * QuantileTiming's bucket jitter uses salt 0. */
  def intHash32Salted(key0: Long, salt: Long): Long = {
    var key = key0 ^ salt
    key = (~key) + (key << 18)
    key = key ^ java.lang.Long.rotateRight(key, 31)
    key = key * 21
    key = key ^ java.lang.Long.rotateRight(key, 11)
    key = key + (key << 6)
    key = key ^ java.lang.Long.rotateRight(key, 22)
    key & 0xffffffffL
  }

  /** halfMD5(s): first 8 MD5 bytes read BIG-endian
    * (FunctionsHashing.h:54-68 flipBytes "compatibility"). */
  def halfMD5(data: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(data)
    var out = 0L
    var i = 0
    while (i < 8) { out = (out << 8) | (md(i) & 0xffL); i += 1 }
    out
  }

  /** URLHash(url): cityHash64 ignoring one trailing '/', '?' or '#'
    * (FunctionsHashing.h:628-637). */
  def urlHash(data: Array[Byte]): Long = {
    val n = data.length
    if (n > 0 && (data(n - 1) == '/' || data(n - 1) == '?' || data(n - 1) == '#'))
      CityHash64.hash(java.util.Arrays.copyOfRange(data, 0, n - 1))
    else CityHash64.hash(data)
  }
}
