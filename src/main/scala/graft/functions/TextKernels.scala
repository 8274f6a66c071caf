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

  /** Lowercased alphanumeric word tokens — the exact list the SQL form
    * `list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')`
    * produces (tokens are ASCII `[a-z0-9]+` runs, so Java UTF-16 length
    * and SQL code-point length agree on every token). */
  private def tokenize(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** q103 kernel: per-document repetition statistics (the Gopher
    * repetition quality signals, Rae et al. 2021 §A1.1), one pass, all
    * exact integers so the DuckDB oracle hash-matches bit-for-bit:
    *
    *   0 n_tokens           total word tokens
    *   1 n_distinct_tokens  distinct word tokens
    *   2 dup_token_chars    Σ over tokens seen k>1 times of (k-1)·len
    *   3 total_token_chars  Σ token lengths
    *   4 top2_chars         max over bigrams  of count·(len a + len b)
    *   5 top3_chars         trigram analog
    *   6 top4_chars         4-gram analog
    *
    * The fractions Gopher thresholds on (dup_token_chars /
    * total_token_chars, topN_chars / total_token_chars) are a cheap
    * downstream division; keeping numerator and denominator exact
    * avoids float-compare drift between engines. One kernel call per
    * row — a 100 TB corpus computes this as a narrow projection, no
    * token explode, no shuffle. */
  def repetitionStats(text: String): Array[Long] = {
    val toks = tokenize(text)
    val counts = new java.util.HashMap[String, Long](toks.length * 2)
    var totalChars = 0L
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1L, _ + _)
      totalChars += toks(i).length
      i += 1
    }
    var dupChars = 0L
    counts.forEach((tok, c) => if (c > 1) dupChars += (c - 1) * tok.length)
    def topN(n: Int): Long = {
      if (toks.length < n) return 0L
      val m = new java.util.HashMap[String, Long](toks.length * 2)
      var j = 0
      while (j + n <= toks.length) {
        // key carries n-1 single-space separators; charlen = len - (n-1)
        val sb = new java.lang.StringBuilder(toks(j))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(j + k)); k += 1 }
        m.merge(sb.toString, 1L, _ + _)
        j += 1
      }
      var best = 0L
      m.forEach((g, c) => {
        val covered = c * (g.length - (n - 1))
        if (covered > best) best = covered
      })
      best
    }
    Array(toks.length.toLong, counts.size.toLong, dupChars, totalChars,
      topN(2), topN(3), topN(4))
  }

  /** ArrayData bridge for the codegen'd repetition_stats call. */
  def repetitionStatsArray(text: String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(repetitionStats(text))

  /** q104 kernel: the DISTINCT word n-gram shingle hashes of a
    * document (SipHash-2-4 of the space-joined gram), sorted for
    * determinism. One call per row — the decontamination check scans
    * the corpus as a narrow projection; the only exploded rows are the
    * few candidate documents that survive the Bloom prefilter. */
  def tokenNgramHashes(text: String, n: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < n) return Array.emptyLongArray
    val set = new java.util.HashSet[java.lang.Long](toks.length * 2)
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var k = 1
      while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
      set.add(SipHash64.hash(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** q120 kernel: n-gram CONTAINMENT |A∩B| / |A| (Broder 1997's
    * asymmetric companion to Jaccard) — the quote/subset detector:
    * a short document fully quoted inside a long one scores ~1.0
    * here while its Jaccard stays near |A|/|B|. Same single-pass
    * shingle sets as ngramJaccard. */
  def ngramContainment(a: String, b: String, n: Int): Double = {
    val sa = shingleSet(a, n)
    if (sa.isEmpty) return 0.0
    val sb = shingleSet(b, n)
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    inter.toDouble / sa.size
  }

  /** q105 kernel: canonical form for exact-duplicate detection —
    * Unicode NFC, lowercase, every non-alphanumeric run collapsed to
    * one space, trimmed; one pass per document instead of a chain of
    * three regex projections. Equals the SQL
    * `trim(regexp_replace(lower(nfc_normalize(text)), '[^a-z0-9]+', ' ', 'g'))`
    * on any input whose post-lowercase letters are ASCII (locale-edge
    * code points like U+0130 lowercase differently across engines,
    * but every such char is swallowed by the `[^a-z0-9]` collapse
    * unless it lowers INTO ascii — the one known divergence, Turkish
    * dotted capital I, is documented here rather than papered over). */
  def normalizeForDedup(text: String): String =
    java.text.Normalizer.normalize(text, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9]+", " ")
      .trim

  /** ArrayData bridge for the codegen'd token_ngram_hashes call. */
  def tokenNgramHashesArray(text: String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(tokenNgramHashes(text, n))

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
