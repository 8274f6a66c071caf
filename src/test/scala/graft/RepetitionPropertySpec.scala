package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextKernels

/** Property pin for the repetition_stats kernel (q103): the one-pass
  * HashMap implementation must agree with an obviously-correct naive
  * reimplementation (sliding windows + groupBy) on arbitrary
  * word-soup inputs, including punctuation, casing, and empty/short
  * degenerate cases. Deterministic seed — same 500 samples each run. */
class RepetitionPropertySpec extends AnyFunSuite {

  private def naive(text: String): Seq[Long] = {
    val toks = text.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def top(n: Int): Long =
      if (toks.size < n) 0L
      else toks.sliding(n).toSeq.groupBy(identity).map {
        case (gram, occ) => occ.size.toLong * gram.map(_.length).sum
      }.max
    Seq(
      toks.size.toLong,
      counts.size.toLong,
      counts.collect { case (t, k) if k > 1 => (k - 1) * t.length }.sum,
      toks.map(_.length.toLong).sum,
      top(2), top(3), top(4))
  }

  test("repetition_stats equals the naive reimplementation on random word soup") {
    val vocab = Array("key", "agg", "row", "scan", "a", "the",
      "merge", "batch", "x1", "longertoken", "Z")
    val seps = Array(" ", "  ", ", ", ".\n", "! ", "--")
    val rnd = new scala.util.Random(42L)
    (1 to 500).foreach { _ =>
      val n = rnd.nextInt(61)
      val text = (1 to n).map { i =>
        vocab(rnd.nextInt(vocab.length)) +
          (if (i < n) seps(rnd.nextInt(seps.length)) else "")
      }.mkString
      assert(TextKernels.repetitionStats(text).toSeq === naive(text), s"text=<$text>")
    }
    // degenerate pins
    Seq("", " ", "...", "a", "a a", "A-a.a").foreach { t =>
      assert(TextKernels.repetitionStats(t).toSeq === naive(t), s"text=<$t>")
    }
  }
}
