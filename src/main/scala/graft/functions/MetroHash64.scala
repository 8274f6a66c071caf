package graft.functions

/** MetroHash64 (variant 1, seed 0) — the reference's `metroHash64`
  * (dbms/src/Functions/FunctionsHashing.h:861 → metrohash64_1).
  * Reimplemented in Scala from the published MetroHash algorithm
  * (J. Andrew Rogers, 2015, MIT license); behavioral vectors from the
  * vendored library are pinned in HashCodingSpec.
  *
  * Unsigned uint64 arithmetic maps directly onto JVM Long: add and
  * multiply wrap mod 2^64, rotations via Long.rotateRight. The tail
  * reads (u32/u16/u8) are zero-extended, hence the & masks.
  */
object MetroHash64 {
  private final val KK0 = 0xc83a91e1L
  private final val KK1 = 0x8648dbdbL
  private final val KK2 = 0x7bdec03bL
  private final val KK3 = 0x2f5870a5L

  @inline private def u64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  @inline private def u16(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8)

  @inline private def rot(v: Long, r: Int): Long = java.lang.Long.rotateRight(v, r)

  def hash(data: Array[Byte]): Long = hash(data, 0L)

  def hash(data: Array[Byte], seed: Long): Long = {
    val len = data.length
    var h = (seed + KK2) * KK0 + len
    var i = 0

    if (len >= 32) {
      var v0 = h; var v1 = h; var v2 = h; var v3 = h
      while (len - i >= 32) {
        v0 += u64(data, i) * KK0; v0 = rot(v0, 29) + v2
        v1 += u64(data, i + 8) * KK1; v1 = rot(v1, 29) + v3
        v2 += u64(data, i + 16) * KK2; v2 = rot(v2, 29) + v0
        v3 += u64(data, i + 24) * KK3; v3 = rot(v3, 29) + v1
        i += 32
      }
      v2 ^= rot((v0 + v3) * KK0 + v1, 33) * KK1
      v3 ^= rot((v1 + v2) * KK1 + v0, 33) * KK0
      v0 ^= rot((v0 + v2) * KK0 + v3, 33) * KK1
      v1 ^= rot((v1 + v3) * KK1 + v2, 33) * KK0
      h += v0 ^ v1
    }

    if (len - i >= 16) {
      var v0 = h + u64(data, i) * KK0; v0 = rot(v0, 33) * KK1
      var v1 = h + u64(data, i + 8) * KK1; v1 = rot(v1, 33) * KK2
      i += 16
      v0 ^= rot(v0 * KK0, 35) + v1
      v1 ^= rot(v1 * KK3, 35) + v0
      h += v1
    }

    if (len - i >= 8) {
      h += u64(data, i) * KK3; i += 8
      h ^= rot(h, 33) * KK1
    }
    if (len - i >= 4) {
      h += u32(data, i) * KK3; i += 4
      h ^= rot(h, 15) * KK1
    }
    if (len - i >= 2) {
      h += u16(data, i) * KK3; i += 2
      h ^= rot(h, 13) * KK1
    }
    if (len - i >= 1) {
      h += (data(i) & 0xffL) * KK3
      h ^= rot(h, 25) * KK1
    }

    h ^= rot(h, 33)
    h *= KK0
    h ^= rot(h, 33)
    h
  }
}
