package graft.analysis

import java.util.regex.Pattern
import scala.collection.mutable

/** The pinned analysis chain (SURVEY.md §2.2 A1–A5): regex tokenizer →
  * lowercase → stop filter, the reference's StandardAnalyzer
  * ([W] whoosh/analysis/tokenizers.py default_pattern, filters.py
  * LowercaseFilter/StopFilter; pinned by BASELINE.json:6).
  *
  * Semantics:
  *  - token pattern `\w+(\.?\w+)*`, non-overlapping matches in order;
  *  - position = ordinal of the token in the RAW tokenizer output (0-based),
  *    NOT renumbered after stop removal (so phrases spanning a removed
  *    stopword do not match adjacently — FIXTURES.md q12);
  *  - lowercase before stop lookup;
  *  - drop token if in STOP_WORDS or length < MIN_SIZE (2);
  *  - fieldLength = number of tokens AFTER filters (what BM25 uses).
  */
object Analyzer extends Serializable {

  val TokenPattern: Pattern = Pattern.compile("""\w+(?:\.?\w+)*""")

  /** JDK `\w` (ASCII-only by default): [A-Za-z0-9_] */
  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Hand-rolled scanner equivalent to TokenPattern + lowercase: a token is
    * word-char runs joined by single dots that are followed by a word char
    * (`\w+(\.?\w+)*` exactly — property-tested against the regex). One
    * lowercase String is built per token straight from the source chars; no
    * Matcher, no group() copy — the analyze pass is the memory-bandwidth
    * hot spot at high thread counts (BENCH/BASELINE.md), so per-token
    * allocations matter. Emits (lowercased token, raw position). */
  @inline private def scanTokens(text: String)(f: (String, Int) => Unit): Unit = {
    val n = text.length
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    var pos = 0
    while (i < n) {
      if (isWordChar(text.charAt(i))) {
        sb.setLength(0)
        var j = i
        var continue = true
        while (continue) {
          while (j < n && isWordChar(text.charAt(j))) {
            val c = text.charAt(j)
            sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
            j += 1
          }
          if (j + 1 < n && text.charAt(j) == '.' && isWordChar(text.charAt(j + 1))) {
            sb.append('.')
            j += 1
          } else continue = false
        }
        f(sb.toString, pos)
        pos += 1
        i = j
      } else i += 1
    }
  }

  /** Whoosh's pinned STOP_WORDS frozenset (SURVEY.md §2.2 A3). */
  val StopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "by", "can", "for", "from",
    "have", "if", "in", "is", "it", "may", "not", "of", "on", "or", "tab",
    "that", "the", "this", "to", "us", "we", "when", "will", "with", "yet",
    "you", "your")

  final val MinSize = 2

  /** A surviving token with its raw-stream position. */
  final case class Token(term: String, pos: Int)

  /** Tokenize + filter. Positions are raw-stream ordinals. */
  def tokenize(text: String): mutable.ArrayBuffer[Token] = {
    val out = mutable.ArrayBuffer.empty[Token]
    scanTokens(text) { (t, pos) =>
      if (t.length >= MinSize && !StopWords.contains(t)) out += Token(t, pos)
    }
    out
  }

  /** reference tokenizer (the literal pinned regex) — the property-test
    * witness that scanTokens is exactly equivalent */
  private[graft] def tokenizeRegex(text: String): mutable.ArrayBuffer[Token] = {
    val out = mutable.ArrayBuffer.empty[Token]
    val m = TokenPattern.matcher(text)
    var pos = 0
    while (m.find()) {
      val t = m.group().toLowerCase(java.util.Locale.ROOT)
      if (t.length >= MinSize && !StopWords.contains(t)) out += Token(t, pos)
      pos += 1
    }
    out
  }

  /** Per-doc term statistics: term -> (tf, ascending positions); plus the
    * post-filter field length (SURVEY.md §2.2 A4/A5). */
  final case class Analyzed(fieldLen: Int, terms: Array[(String, Array[Int])])

  /** growable int buffer (positions arrive pre-sorted in scan order) */
  private final class PosBuf {
    var a = new Array[Int](4)
    var n = 0
    def add(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v
      n += 1
    }
    def toArray: Array[Int] = java.util.Arrays.copyOf(a, n)
  }

  def analyze(text: String): Analyzed = {
    // single pass: group positions per term in a hash map (positions stay
    // ascending because tokens arrive in scan order), then sort only the
    // DISTINCT terms. Replaces the r1-r5 boxed stable index sort of every
    // token occurrence (scala.util.Sorting.stableSort[Int] was the top
    // build-phase stack sample in the r6 profile) with one String sort of
    // the ~2-5x smaller distinct-term set; output is identical — ascending
    // terms, per-term positions in raw scan order.
    val map = new java.util.HashMap[String, PosBuf]()
    var n = 0
    scanTokens(text) { (t, pos) =>
      if (t.length >= MinSize && !StopWords.contains(t)) {
        n += 1
        var b = map.get(t)
        if (b == null) { b = new PosBuf; map.put(t, b) }
        b.add(pos)
      }
    }
    if (n == 0) return Analyzed(0, Array.empty)
    val keys = map.keySet().toArray(new Array[String](map.size()))
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    val out = new Array[(String, Array[Int])](keys.length)
    var i = 0
    while (i < keys.length) {
      out(i) = (keys(i), map.get(keys(i)).toArray)
      i += 1
    }
    Analyzed(n, out)
  }
}
