package graft.functions

/** Per-document text/sketch kernels, each called as ONE static JVM
  * invocation per row from a codegen'd Catalyst expression
  * ([[graft.functions]] expressions.scala). This replaces the
  * explode-per-character / explode-per-token plans: a 100 TB corpus
  * shuffles one row per document (or none — pure projection) instead
  * of materializing the shingle/token multiset.
  *
  * Algorithms are from the published literature: SipHash-2-4
  * (Aumasson & Bernstein 2012; the reference's sipHash64,
  * dbms/src/Functions/FunctionsHashing.h), MinHash (Broder 1997),
  * SimHash (Charikar 2002). Shingling matches the SQL semantics
  * `substring(text, i, n) for i in 1..greatest(len-n+1, 1)` over
  * CODE POINTS, so results agree with both Spark and DuckDB string
  * functions on any input, not just ASCII.
  */
object TextKernels {

  /** splitmix64 (Steele et al. 2014) — seeds the permutation family. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var j = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Distinct char n-gram shingles as strings — the exact set the SQL
    * form `substring(text, i, n)` produces (one whole-text shingle for
    * texts shorter than n). */
  private def shingleSet(text: String, n: Int): java.util.HashSet[String] = {
    val cp = codePoints(text)
    val count = math.max(cp.length - n + 1, 1)
    val set = new java.util.HashSet[String](count * 2)
    var i = 0
    while (i < count) {
      set.add(new String(cp, i, math.min(n, cp.length - i)))
      i += 1
    }
    set
  }

  /** q44 kernel: |distinct char n-grams| in one pass — no explode, no
    * shuffle; the aggregate the oracle expresses as
    * `length(list_distinct(list_transform(...)))`. */
  def ngramDistinctCount(text: String, n: Int): Long =
    shingleSet(text, n).size.toLong

  /** q46 kernel: exact Jaccard |A∩B| / |A∪B| of the two docs' distinct
    * char n-gram sets, O(|a|+|b|). */
  def ngramJaccard(a: String, b: String, n: Int): Double = {
    val sa = shingleSet(a, n)
    val sb = shingleSet(b, n)
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) if (sa.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** q45/q47 kernel: k-permutation MinHash signature over char n-gram
    * shingles. Base hash = sipHash64 of the shingle's UTF-8 bytes;
    * permutation g_i(h) = a_i·h + b_i (a_i odd, splitmix64-derived),
    * minimum kept under UNSIGNED comparison (the permuted space is the
    * full 64-bit ring). Duplicated shingles can't change minima, so
    * the multiset walk needs no dedup. */
  def minHashSig(text: String, k: Int, n: Int): Array[Long] = {
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var p = 0
    while (p < k) {
      a(p) = splitmix64(2L * p) | 1L
      b(p) = splitmix64(2L * p + 1)
      p += 1
    }
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, -1L) // unsigned max
    val cp = codePoints(text)
    val count = math.max(cp.length - n + 1, 1)
    var i = 0
    while (i < count) {
      val shingle = new String(cp, i, math.min(n, cp.length - i))
      val h = SipHash64.hash(shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      p = 0
      while (p < k) {
        val g = a(p) * h + b(p)
        if (java.lang.Long.compareUnsigned(g, sig(p)) < 0) sig(p) = g
        p += 1
      }
      i += 1
    }
    sig
  }

  /** [[minHashSig]] boxed for Catalyst ArrayData return. */
  def minHashSigArray(text: String, k: Int, n: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(minHashSig(text, k, n))

  /** q48 kernel: 64-bit SimHash over whitespace tokens (Charikar
    * 2002): bit j of the output is the sign of the ±1 vote sum of all
    * token hashes' bit j. */
  def simHash64(text: String): Long = {
    val counts = new Array[Int](64)
    var start = 0
    var i = 0
    val len = text.length
    while (i <= len) {
      if (i == len || Character.isWhitespace(text.charAt(i))) {
        if (i > start) {
          val h = SipHash64.hash(
            text.substring(start, i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var bit = 0
          while (bit < 64) {
            if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
            bit += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counts(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** 64-bit polynomial rolling hash over UTF-8 bytes — order-sensitive
    * content fingerprint (h ← 31·h + byte, wrapping). */
  def rollingFingerprint(data: Array[Byte]): Long = {
    var h = 1125899906842597L // large prime
    var i = 0
    while (i < data.length) { h = 31 * h + (data(i) & 0xffL); i += 1 }
    h
  }

  /** q49 kernel: position-weighted code-point sum Σ cp_i·i (1-based) —
    * the oracle-verifiable fingerprint (`ord(substr(text,i,1))·i` on
    * both engines), computed in one pass instead of a per-character
    * explode + aggregate. */
  def charWeightedFingerprint(text: String): Long = {
    var h = 0L
    var pos = 1L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      h += cp.toLong * pos
      pos += 1
      i += Character.charCount(cp)
    }
    h
  }
}
