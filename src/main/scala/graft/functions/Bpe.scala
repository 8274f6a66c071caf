package graft.functions

/** Byte-pair encoding (Sennrich, Haddow & Birch, "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) — the
  * tokenizer-training + token-counting step of a corpus pipeline.
  *
  * Distributed shape: BPE TRAINING is inherently sample-based (real
  * tokenizers train on a few GB of a multi-TB corpus), so [[train]]
  * runs on a driver-collected word-frequency map from a deterministic
  * sample; ENCODING is the part that must scale, and it does — one
  * codegen'd kernel call per document ([[BpeTokenCountExpr]] /
  * [[BpeEncodeExpr]]), with the merge table compiled once per
  * executor from the plan-literal spec (no join, no shuffle, no
  * per-row interpretation of the merge list).
  *
  * Determinism: merge selection breaks count ties by the
  * lexicographically smallest pair, so the same sample always yields
  * the same merge table on any engine/JVM.
  *
  * Reference analog: none — tokenization is beyond the reference's
  * analytics surface; part of this library's training-pipeline layer.
  */
object Bpe {

  /** End-of-word marker, appended as a standalone symbol so merges
    * can capture word-final units (the ACL'16 formulation). */
  val Eow = "</w>"

  /** Greedy merge-rank application to one word: repeatedly merge the
    * present pair with the LOWEST rank until none applies. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): List[String] = {
    var parts: List[String] = word.map(_.toString).toList ::: List(Eow)
    var done = false
    while (!done && parts.lengthCompare(1) > 0) {
      // lowest-rank adjacent pair present
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var it = parts
      while (it.tail.nonEmpty) {
        val r = ranks.getOrElse((it.head, it.tail.head), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (it.head, it.tail.head) }
        it = it.tail
      }
      if (best == null) done = true
      else {
        // merge every occurrence, left to right
        val out = List.newBuilder[String]
        var rest = parts
        while (rest.nonEmpty) {
          rest match {
            case a :: b :: t if (a, b) == best => out += a + b; rest = t
            case a :: t => out += a; rest = t
            case Nil => ()
          }
        }
        parts = out.result()
      }
    }
    parts
  }

  /** Learn `nMerges` merges from a word-frequency table (classic BPE
    * training loop; ties: highest count, then smallest pair). */
  def train(wordFreq: Map[String, Long], nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] = wordFreq
      .groupMapReduce(w => w._1.map(_.toString).toList ::: List(Eow))(_._2)(_ + _)
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + f)
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.groupMapReduce {
          case (syms, _) => mergeAll(syms, best)
        }(_._2)(_ + _)
        i += 1
      }
    }
    merges.result()
  }

  private def mergeAll(syms: List[String], pair: (String, String)): List[String] = {
    val out = List.newBuilder[String]
    var rest = syms
    while (rest.nonEmpty) {
      rest match {
        case a :: b :: t if (a, b) == pair => out += a + b; rest = t
        case a :: t => out += a; rest = t
        case Nil => ()
      }
    }
    out.result()
  }

  /** Serialize merges as a plan-literal spec: pairs ';'-separated,
    * symbols ' '-separated (symbols are [a-z0-9]+ runs and the
    * marker — never contain either separator). */
  def render(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"$a $b" }.mkString(";")

  /** Parse [[render]]'s output back into rank order. */
  def parseRanks(spec: String): Map[(String, String), Int] =
    if (spec.isEmpty) Map.empty
    else spec.split(';').iterator.zipWithIndex.map { case (p, i) =>
      val sep = p.indexOf(' ')
      (p.substring(0, sep), p.substring(sep + 1)) -> i
    }.toMap

  // ------- per-row kernels (called from codegen'd expressions) -------

  /** Compiled-ranks cache: one parse per executor per spec, not per
    * row. Specs are plan literals, so the cache has O(#queries)
    * entries. */
  private val rankCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[(String, String), Int]]()

  private def ranksFor(spec: String): Map[(String, String), Int] = {
    val hit = rankCache.get(spec)
    if (hit != null) hit
    else { val r = parseRanks(spec); rankCache.putIfAbsent(spec, r); r }
  }

  private def tokenizeWords(text: String): Array[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Kernel: BPE token count of a document under the given merges. */
  def tokenCount(text: String, spec: String): Long = {
    val ranks = ranksFor(spec)
    var n = 0L
    tokenizeWords(text).foreach(w => n += encodeWord(w, ranks).length)
    n
  }

  /** Kernel: the document's BPE token sequence (words concatenated). */
  def encode(text: String, spec: String): Array[String] = {
    val ranks = ranksFor(spec)
    val out = Array.newBuilder[String]
    tokenizeWords(text).foreach(w => out ++= encodeWord(w, ranks))
    out.result()
  }

  /** ArrayData bridge for the codegen'd bpe_encode call. */
  def encodeArray(text: String, spec: String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      encode(text, spec).map(org.apache.spark.unsafe.types.UTF8String.fromString(_))
        .asInstanceOf[Array[Any]])
}
