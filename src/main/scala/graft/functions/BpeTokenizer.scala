package graft.functions

/** Byte-pair-encoding subword tokenizer — the standard public algorithm
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units"): a word is split into characters with an end-of-word
  * marker fused onto the final character, then adjacent symbol pairs are
  * merged greedily in the PRIORITY ORDER of a learned merges table until
  * no listed pair remains. Token-budget and sequence-packing fidelity for
  * training-mix assembly want real subword counts, not whitespace or
  * regex approximations — this supplies them with a fixed, checked-in
  * merges table (`src/main/resources/graft/bpe_merges.txt`, learned once
  * from the sf0.01 fixture by [[graft.tools.LearnBpe]]) so results are
  * deterministic across runs and engines.
  *
  * The merge LOOP (not just the table) defines the tokenization: at each
  * step the present pair with the LOWEST rank merges first, and all
  * occurrences merge left-to-right before re-scanning — the property
  * tests in BpeSpec pin both.
  *
  * Instances are cheap Serializable handles over the shared rank map —
  * safe to close over in expressions and task closures.
  */
final class BpeTokenizer(val merges: IndexedSeq[(String, String)])
    extends Serializable {

  private val rank: Map[(String, String), Int] =
    merges.iterator.zipWithIndex.toMap

  /** End-of-word marker, fused onto a word's final character (so "low"
    * and the prefix of "lower" tokenize differently — the point of the
    * marker in the public algorithm). */
  val EOW = "</w>"

  /** BPE pieces of one whitespace-free word. Empty input → no pieces. */
  def encodeWord(word: String): Seq[String] = {
    if (word == null || word.isEmpty) return Nil
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) {
      syms(i) = String.valueOf(word.charAt(i))
      i += 1
    }
    syms(word.length - 1) = syms(word.length - 1) + EOW
    // greedy merge loop: lowest-rank present pair first
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var p = 0
        while (p < syms.length) {
          if (p < syms.length - 1 && syms(p) == a && syms(p + 1) == b) {
            out += a + b
            p += 2
          } else {
            out += syms(p)
            p += 1
          }
        }
        syms = out.toArray
      }
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(syms)
  }

  /** BPE pieces of a whole text: whitespace-split (same single-space
    * discipline as `TextAnalysis.tokens`), each word encoded
    * independently. */
  def encode(text: String): Seq[String] = {
    if (text == null) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && text.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && text.charAt(i) != ' ') i += 1
      if (i > start) out ++= encodeWord(text.substring(start, i))
    }
    out.toSeq
  }

  def countTokens(text: String): Int = {
    // same loop as encode without materializing pieces
    if (text == null) return 0
    var count = 0
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && text.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && text.charAt(i) != ' ') i += 1
      if (i > start) count += encodeWord(text.substring(start, i)).length
    }
    count
  }
}

object BpeTokenizer {

  /** Parse a merges table: one merge per line, "left right", in priority
    * order; blank lines skipped. Only the FIRST line may be a `#` header
    * comment (the GPT-2-merges-file convention) — treating every
    * `#`-leading line as a comment would silently drop legitimate merges
    * whose left symbol starts with '#' (corpora containing `#include`,
    * `#tag`, …), reloading a DIFFERENT table than was learned. */
  def parseMerges(lines: Iterator[String]): IndexedSeq[(String, String)] =
    lines.zipWithIndex
      .filter { case (l, i) =>
        l.trim.nonEmpty && !(i == 0 && l.startsWith("#")) }
      .map { case (l0, _) =>
        val l = l0.trim
        val sp = l.indexOf(' ')
        require(sp > 0 && sp < l.length - 1, s"malformed merge line: '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }.toIndexedSeq

  /** The checked-in default table (learned from the sf0.01 fixture by
    * [[graft.tools.LearnBpe]] — re-run it to regenerate). */
  lazy val default: BpeTokenizer = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "missing resource graft/bpe_merges.txt")
    try new BpeTokenizer(parseMerges(
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()))
    finally in.close()
  }

  /** Static entry point for generated code ([[graft.expressions.BpeEncode]]). */
  def encodeUtf8(text: org.apache.spark.unsafe.types.UTF8String)
      : Array[org.apache.spark.unsafe.types.UTF8String] = {
    val pieces = default.encode(if (text == null) null else text.toString)
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](pieces.length)
    var i = 0
    while (i < pieces.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(pieces(i))
      i += 1
    }
    out
  }

  /** Learn a merges table from a word-frequency map — the public BPE
    * training loop: repeatedly merge the most frequent adjacent symbol
    * pair (ties broken lexicographically so the table is deterministic
    * for a given corpus). Driver-side utility for
    * [[graft.tools.LearnBpe]]; the corpus-scale pair counting that feeds
    * `wordFreq` is a DataFrame aggregation there. */
  def learn(wordFreq: Map[String, Long], numMerges: Int): IndexedSeq[(String, String)] = {
    var vocab: Map[Vector[String], Long] = wordFreq.collect {
      case (w, f) if w.nonEmpty =>
        val syms = w.map(String.valueOf).toVector
        (syms.init :+ (syms.last + "</w>"), f)
    }
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val (a, b) = best
        vocab = vocab.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), f)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        m += 1
      }
    }
    merges.result()
  }
}
