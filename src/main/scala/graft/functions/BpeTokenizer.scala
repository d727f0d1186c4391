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

  /** Content fingerprint of the merges table (64-bit FNV-1a over every
    * merge pair, belt-and-braces suffixed with the table LENGTH and the
    * first/last pairs — a raw-hash collision between two distinct
    * tables in one executor JVM would silently serve wrong
    * tokenizations, so the structural fields make that require a
    * same-length same-boundary collision too). The per-JVM word→pieces
    * memo key prefix; recomputed lazily after deserialization into a
    * task — two handles over the same table share one memo, two
    * different tables can never collide on a mere object identity. */
  @transient private lazy val mergesFingerprint: String = {
    var h = 0xcbf29ce484222325L
    def mix(s: String): Unit = {
      var i = 0
      while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
      h ^= 0x1F; h *= 0x100000001b3L // unit separator between fields
    }
    merges.foreach { case (a, b) => mix(a); mix(b) }
    val bound =
      if (merges.isEmpty) "-"
      else s"${merges.head._1} ${merges.head._2}|${merges.last._1} ${merges.last._2}"
    s"${java.lang.Long.toHexString(h)}:${merges.length}:$bound"
  }

  /** End-of-word marker, fused onto a word's final character (so "low"
    * and the prefix of "lower" tokenize differently — the point of the
    * marker in the public algorithm). */
  val EOW = "</w>"

  /** BPE pieces of one whitespace-free word. Empty input → no pieces.
    *
    * Memoized per JVM: natural-language corpora are Zipfian, so the same
    * head words recur millions of times per partition while the greedy
    * merge loop is O(len²·merges-present) per CALL — the standard
    * production-BPE trick (GPT-2's reference encoder keeps exactly this
    * word→pieces dict) is a cache keyed by (merges fingerprint, word).
    * Bounded fill-then-freeze (see [[BpeTokenizer.memo]]): under Zipf the
    * head fills first, which is precisely the high-hit-rate set. */
  def encodeWord(word: String): Seq[String] = {
    val a = encodeWordArray(word)
    if (a.length == 0) Nil
    else scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
  }

  private def encodeWordArray(word: String): Array[String] = {
    if (word == null || word.isEmpty) return BpeTokenizer.emptyPieces
    val table = BpeTokenizer.memoFor(mergesFingerprint)
    val hit = table.get(word)
    if (hit != null) return hit
    val syms = encodeWordUncached(word)
    // cap both table size and key length: beyond the Zipf head the hit
    // rate no longer pays for the memory, and pathological long "words"
    // (base64 blobs, URLs) would bloat the cache for one-shot keys
    if (word.length <= BpeTokenizer.memoMaxWordLen &&
        table.size < BpeTokenizer.memoMaxEntries)
      table.putIfAbsent(word, syms)
    syms
  }

  private def encodeWordUncached(word: String): Array[String] = {
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
    syms
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
      if (i > start) out ++= encodeWordArray(text.substring(start, i))
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
      if (i > start) count += encodeWordArray(text.substring(start, i)).length
    }
    count
  }
}

object BpeTokenizer {

  private[functions] val emptyPieces = new Array[String](0)

  /** Per-JVM word→pieces memo, one inner map per merges-table
    * fingerprint (executors can host tokenizers over different learned
    * tables in one JVM — e.g. the checked-in default and a
    * `q_bpe_train`-learned one). Fill-then-freeze bound: once an inner
    * map reaches [[memoMaxEntries]] no new keys are admitted — under a
    * Zipfian word distribution the head (the only high-hit-rate keys)
    * fills first, and skipping eviction keeps reads lock-free. ~64 k
    * entries × (≤48-char word + a handful of piece strings) is single-
    * digit MB per table per executor JVM. */
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    String,
    java.util.concurrent.ConcurrentHashMap[String, Array[String]]]()
  private[functions] val memoMaxEntries = 1 << 16
  private[functions] val memoMaxWordLen = 48

  private[functions] def memoFor(fp: String)
      : java.util.concurrent.ConcurrentHashMap[String, Array[String]] =
    memo.computeIfAbsent(fp, _ =>
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]](
        1 << 12))

  /** Test hook: drop every memoized table (BpeSpec uses it to prove
    * cached and uncached paths agree). */
  private[graft] def clearMemo(): Unit = memo.clear()

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
