package graft.functions

/** Pure hash / sketch kernels, called from codegen'd Catalyst
  * expressions (one static call per row — stays inside whole-stage
  * codegen, no interpretation overhead).
  *
  * SipHash-2-4 is the published algorithm (Aumasson & Bernstein 2012);
  * the reference registers it as sipHash64 with a zero key
  * (dbms/src/Functions/FunctionsHashing.h). MinHash (Broder 1997) and
  * SimHash (Charikar 2002) back the near-duplicate operators.
  */
object HashAlgos {

  @inline private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

  /** SipHash-2-4 with k0=k1=0 (the reference's sipHash64 key). */
  def sipHash64(data: Array[Byte]): Long = sipHash64(0L, 0L, data)

  def sipHash64(k0: Long, k1: Long, data: Array[Byte]): Long = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = 0x646f72616e646f6dL ^ k1
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1

    @inline def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    val n = data.length
    val end = n - (n % 8)
    var i = 0
    while (i < end) {
      var m = 0L
      var j = 7
      while (j >= 0) { m = (m << 8) | (data(i + j) & 0xffL); j -= 1 }
      v3 ^= m; round(); round(); v0 ^= m
      i += 8
    }
    var m = n.toLong << 56
    var j = n - 1
    while (j >= end) { m |= (data(j) & 0xffL) << (8 * (j - end)); j -= 1 }
    v3 ^= m; round(); round(); v0 ^= m
    v2 ^= 0xff
    round(); round(); round(); round()
    v0 ^ v1 ^ v2 ^ v3
  }

  def sipHash64(s: String): Long =
    sipHash64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** splitmix64 — seeds the MinHash permutation family. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit polynomial rolling hash over UTF-8 bytes — document
    * fingerprinting (content-defined, order-sensitive). */
  def rollingFingerprint(data: Array[Byte]): Long = {
    var h = 1125899906842597L // large prime
    var i = 0
    while (i < data.length) { h = 31 * h + (data(i) & 0xffL); i += 1 }
    h
  }

  /** Word w-shingle MinHash signature of `text`, k permutations.
    *
    * One pass: shingle → sipHash64 base hash → for each permutation
    * g_i(h) = a_i*h + b_i (a_i odd, from splitmix64), keep the min.
    * Signature length k; empty/short texts hash the whole text.
    */
  def minHashSignature(text: String, k: Int, shingleSize: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var i = 0
    while (i < k) {
      a(i) = splitmix64(2L * i) | 1L
      b(i) = splitmix64(2L * i + 1)
      i += 1
    }
    val tokens = text.split("\\s+").filter(_.nonEmpty)
    val nShingles = math.max(1, tokens.length - shingleSize + 1)
    var s = 0
    while (s < nShingles) {
      val shingle =
        if (tokens.isEmpty) text
        else tokens.slice(s, math.min(tokens.length, s + shingleSize)).mkString(" ")
      val h = sipHash64(shingle)
      var p = 0
      while (p < k) {
        val g = a(p) * h + b(p)
        if (g < sig(p)) sig(p) = g
        p += 1
      }
      s += 1
    }
    sig
  }

  /** 64-bit SimHash over whitespace tokens (Charikar 2002). */
  def simHash64(text: String): Long = {
    val counts = new Array[Int](64)
    val tokens = text.split("\\s+")
    var t = 0
    while (t < tokens.length) {
      if (tokens(t).nonEmpty) {
        val h = sipHash64(tokens(t))
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
          bit += 1
        }
      }
      t += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** Random-hyperplane LSH bit signature for an embedding
    * (sign of dot products with `bits` splitmix64-seeded hyperplanes;
    * Charikar 2002 cosine LSH). Deterministic across executors. */
  def hyperplaneSignature(vec: Array[Float], bits: Int, seed: Long): Long = {
    var out = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var i = 0
      while (i < vec.length) {
        // one deterministic pseudo-gaussian-ish weight per (bit, dim)
        val r = splitmix64(seed + b.toLong * 131071L + i)
        val w = (r >> 11).toDouble / (1L << 52).toDouble // uniform [-1,1)-ish
        dot += vec(i) * w
        i += 1
      }
      if (dot >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
