package graft.analysis

import scala.collection.mutable

/** Schema-selectable analysis chains (reference surface:
  * [R] cockatrice/schema.py instantiates arbitrary whoosh.analysis.*
  * tokenizer/filter classes per field; SURVEY.md §2.2 "Other analyzers").
  *
  * An AnalyzerSpec is a plain ADT (tokenizer + ordered filters) compiled to
  * a Chain. The pinned default (Analyzer's standard chain) remains the
  * graded core; these variants cover the reference registry's most-used
  * entries:
  *
  *   - tokenizers: standard (`\w+(\.?\w+)*`), whitespace
  *     (SpaceSeparatedTokenizer: `\S+`), char n-grams (NgramTokenizer)
  *   - filters: lowercase, stop(minSize) (StopFilter), accent folding
  *     (CharsetFilter with the accent map), Porter stemming (StemFilter),
  *     token n-grams (NgramFilter)
  *
  * Position semantics (pinned): the TOKENIZER assigns 0-based ordinals;
  * filters never renumber (stop leaves gaps, exactly like the pinned core
  * chain); an n-gram FILTER emits every gram at its source token's
  * position. Field length = token count AFTER all filters.
  *
  * Specs serialize to a compact string persisted in the index's stats.json
  * so the query side always analyzes with the chain the index was built
  * with.
  */
sealed trait TokenizerSpec
case object StandardTok extends TokenizerSpec
case object WhitespaceTok extends TokenizerSpec
final case class NgramTok(minGram: Int, maxGram: Int) extends TokenizerSpec
/** whole value as ONE token (Whoosh IDTokenizer — the `id`/`keyword` field
  * types and the sortable-encoded numeric/datetime/boolean fields) */
case object KeywordTok extends TokenizerSpec
/** progressive path prefixes (Whoosh PathTokenizer): "a/b/c.txt" ->
  * "a"(0), "a/b"(1), "a/b/c.txt"(2); a leading '/' stays on every prefix */
case object PathTok extends TokenizerSpec
/** comma-separated values, whitespace-trimmed, empties dropped
  * (Whoosh CommaSeparatedTokenizer) */
case object CommaTok extends TokenizerSpec

sealed trait FilterSpec
case object LowerF extends FilterSpec
final case class StopF(minSize: Int = Analyzer.MinSize) extends FilterSpec
case object AccentFoldF extends FilterSpec
case object PorterStemF extends FilterSpec
final case class NgramF(minGram: Int, maxGram: Int) extends FilterSpec
/** word shingles (Whoosh ShingleFilter): every run of `size` ADJACENT
  * surviving tokens joined with a space, positions RE-NUMBERED 0.. by
  * shingle ordinal (pinned); streams shorter than `size` emit nothing */
final case class ShingleF(size: Int) extends FilterSpec
/** split mixed-case / alpha-digit compounds (Whoosh IntraWordFilter):
  * "PowerShot500" -> Power, Shot, 500, each at the source token's position;
  * non-alphanumeric chars separate; empty parts drop */
case object IntraWordF extends FilterSpec
/** regex substitution on each term (Whoosh SubstitutionFilter); empty
  * results drop. Pattern/replacement are URL-encoded in the spec string. */
final case class SubstitutionF(pattern: String, replacement: String) extends FilterSpec
/** reverse each term (Whoosh ReverseTextFilter — the classic
  * leading-wildcard companion index) */
case object ReverseF extends FilterSpec

final case class AnalyzerSpec(tokenizer: TokenizerSpec, filters: List[FilterSpec]) {
  /** compact round-trip form stored in stats.json */
  def asString: String = {
    val t = tokenizer match {
      case StandardTok     => "standard"
      case WhitespaceTok   => "whitespace"
      case NgramTok(a, b)  => s"ngram($a,$b)"
      case KeywordTok      => "keyword"
      case PathTok         => "path"
      case CommaTok        => "comma"
    }
    val fs = filters.map {
      case LowerF         => "lower"
      case StopF(m)       => s"stop($m)"
      case AccentFoldF    => "fold"
      case PorterStemF    => "stem"
      case NgramF(a, b)   => s"ngramf($a,$b)"
      case ShingleF(n)    => s"shingle($n)"
      case IntraWordF     => "intraword"
      case SubstitutionF(p, r) =>
        val e = (s: String) => java.net.URLEncoder.encode(s, "UTF-8")
        s"sub(${e(p)},${e(r)})"
      case ReverseF       => "reverse"
    }
    (t +: fs).mkString("|")
  }
}

object AnalyzerSpec {
  /** the pinned core chain (Whoosh StandardAnalyzer) */
  val Standard: AnalyzerSpec = AnalyzerSpec(StandardTok, List(LowerF, StopF()))
  /** identity chain for id/keyword/typed fields */
  val Keyword: AnalyzerSpec = AnalyzerSpec(KeywordTok, Nil)

  private val NgramRe = """ngram\((\d+),(\d+)\)""".r
  private val NgramFRe = """ngramf\((\d+),(\d+)\)""".r
  private val StopRe = """stop\((\d+)\)""".r
  private val ShingleRe = """shingle\((\d+)\)""".r
  private val SubRe = """sub\(([^,()]*),([^,()]*)\)""".r

  def fromString(s: String): AnalyzerSpec = {
    val parts = s.split('|').toList
    val tok = parts.head match {
      case "standard"       => StandardTok
      case "whitespace"     => WhitespaceTok
      case NgramRe(a, b)    => NgramTok(a.toInt, b.toInt)
      case "keyword"        => KeywordTok
      case "path"           => PathTok
      case "comma"          => CommaTok
      case other            => sys.error(s"unknown tokenizer: $other")
    }
    val fs = parts.tail.map {
      case "lower"          => LowerF
      case StopRe(m)        => StopF(m.toInt)
      case "fold"           => AccentFoldF
      case "stem"           => PorterStemF
      case NgramFRe(a, b)   => NgramF(a.toInt, b.toInt)
      case ShingleRe(n)     => ShingleF(n.toInt)
      case "intraword"      => IntraWordF
      case SubRe(p, r)      =>
        val d = (s: String) => java.net.URLDecoder.decode(s, "UTF-8")
        SubstitutionF(d(p), d(r))
      case "reverse"        => ReverseF
      case other            => sys.error(s"unknown filter: $other")
    }
    AnalyzerSpec(tok, fs)
  }
}

/** A compiled chain: text -> surviving (term, position) tokens. */
final class Chain(val spec: AnalyzerSpec) extends Serializable {
  import Analyzer.Token

  def tokenize(text: String): mutable.ArrayBuffer[Token] = {
    var toks = runTokenizer(text)
    spec.filters.foreach { f => toks = runFilter(f, toks) }
    toks
  }

  /** per-doc term stats in the exact shape Analyzer.analyze produces */
  def analyze(text: String): Analyzer.Analyzed = {
    val ts = tokenize(text)
    val n = ts.length
    if (n == 0) return Analyzer.Analyzed(0, Array.empty)
    val idx = Array.range(0, n)
    scala.util.Sorting.stableSort[Int](idx, (a: Int, b: Int) => ts(a).term < ts(b).term)
    val out = mutable.ArrayBuffer.empty[(String, Array[Int])]
    var i = 0
    while (i < n) {
      val t = ts(idx(i)).term
      var j = i + 1
      while (j < n && ts(idx(j)).term == t) j += 1
      val ps = new Array[Int](j - i)
      var k = i
      while (k < j) { ps(k - i) = ts(idx(k)).pos; k += 1 }
      java.util.Arrays.sort(ps) // grams can share positions; keep ascending
      out += ((t, ps))
      i = j
    }
    Analyzer.Analyzed(n, out.toArray)
  }

  private def runTokenizer(text: String): mutable.ArrayBuffer[Token] = spec.tokenizer match {
    case StandardTok =>
      // raw standard tokens (no lowercase/stop — those are explicit filters)
      val out = mutable.ArrayBuffer.empty[Token]
      val m = Analyzer.TokenPattern.matcher(text)
      var pos = 0
      while (m.find()) { out += Token(m.group(), pos); pos += 1 }
      out
    case WhitespaceTok =>
      val out = mutable.ArrayBuffer.empty[Token]
      var i = 0
      var pos = 0
      val n = text.length
      while (i < n) {
        if (!text.charAt(i).isWhitespace) {
          var j = i
          while (j < n && !text.charAt(j).isWhitespace) j += 1
          out += Token(text.substring(i, j), pos)
          pos += 1
          i = j
        } else i += 1
      }
      out
    case KeywordTok =>
      val out = mutable.ArrayBuffer.empty[Token]
      if (text.nonEmpty) out += Token(text, 0)
      out
    case PathTok =>
      // progressive prefixes: one token per '/'-separated segment end
      val out = mutable.ArrayBuffer.empty[Token]
      var pos = 0
      var i = 0
      val n = text.length
      while (i < n) {
        if (text.charAt(i) == '/') {
          if (i > 0 && text.charAt(i - 1) != '/') { // skip empty segments
            out += Token(text.substring(0, i), pos); pos += 1
          }
        }
        i += 1
      }
      if (n > 0 && text.charAt(n - 1) != '/') { out += Token(text, pos) }
      out
    case CommaTok =>
      val out = mutable.ArrayBuffer.empty[Token]
      var pos = 0
      text.split(',').foreach { raw =>
        val t = raw.trim
        if (t.nonEmpty) { out += Token(t, pos); pos += 1 }
      }
      out
    case NgramTok(lo, hi) =>
      // char n-grams over the whole text, Whoosh NgramTokenizer-style:
      // every start offset, every size in [lo, hi]; gram position = ordinal
      val out = mutable.ArrayBuffer.empty[Token]
      var pos = 0
      var i = 0
      val n = text.length
      while (i < n) {
        var size = lo
        while (size <= hi && i + size <= n) {
          out += Token(text.substring(i, i + size), pos)
          pos += 1
          size += 1
        }
        i += 1
      }
      out
  }

  private def runFilter(f: FilterSpec, ts: mutable.ArrayBuffer[Token]): mutable.ArrayBuffer[Token] =
    f match {
      case LowerF =>
        ts.map(t => t.copy(term = t.term.toLowerCase(java.util.Locale.ROOT)))
      case StopF(minSize) =>
        ts.filter(t => t.term.length >= minSize && !Analyzer.StopWords.contains(t.term))
      case AccentFoldF =>
        ts.map(t => t.copy(term = Chain.foldAccents(t.term)))
      case PorterStemF =>
        ts.map(t => t.copy(term = Porter.stem(t.term)))
      case NgramF(lo, hi) =>
        val out = mutable.ArrayBuffer.empty[Token]
        ts.foreach { t =>
          val w = t.term
          var size = lo
          while (size <= hi) {
            var i = 0
            while (i + size <= w.length) {
              out += Token(w.substring(i, i + size), t.pos)
              i += 1
            }
            size += 1
          }
        }
        out
      case ShingleF(n) =>
        val out = mutable.ArrayBuffer.empty[Token]
        var i = 0
        while (i + n <= ts.length) {
          val sb = new java.lang.StringBuilder(ts(i).term)
          var j = i + 1
          while (j < i + n) { sb.append(' ').append(ts(j).term); j += 1 }
          out += Token(sb.toString, i) // re-numbered by shingle ordinal
          i += 1
        }
        out
      case IntraWordF =>
        val out = mutable.ArrayBuffer.empty[Token]
        ts.foreach { t => Chain.splitIntraWord(t.term, p => out += Token(p, t.pos)) }
        out
      case SubstitutionF(p, r) =>
        // memoized: schema specs hold a handful of distinct patterns, but
        // this runs once per document — recompiling here would be pure
        // wasted CPU on the build's hottest loop
        val re = Chain.compiledPattern(p)
        ts.flatMap { t =>
          val s = re.matcher(t.term).replaceAll(r)
          if (s.isEmpty) None else Some(t.copy(term = s))
        }
      case ReverseF =>
        ts.map(t => t.copy(term = t.term.reverse))
    }
}

object Chain {
  val Standard = new Chain(AnalyzerSpec.Standard)

  private val patternCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private[analysis] def compiledPattern(p: String): java.util.regex.Pattern =
    patternCache.computeIfAbsent(p, java.util.regex.Pattern.compile(_))

  /** emit the intra-word parts of `w` (IntraWordF): boundaries at
    * lower->Upper case transitions, alpha<->digit transitions, and
    * non-alphanumeric separators; "ABCWord" splits "ABC"/"Word"
    * (an upper run followed by lower keeps its last upper with the
    * lower part — the classic camel-case rule) */
  private[analysis] def splitIntraWord(w: String, emit: String => Unit): Unit = {
    val n = w.length
    var start = 0
    var i = 0
    def cls(c: Char): Int =
      if (c.isDigit) 2 else if (c.isLetter) { if (c.isUpper) 1 else 0 } else 3
    while (i < n) {
      val c = cls(w.charAt(i))
      if (c == 3) { // separator
        if (i > start) emit(w.substring(start, i))
        start = i + 1
      } else if (i > start) {
        val p = cls(w.charAt(i - 1))
        val boundary =
          (p == 0 && c == 1) ||                       // lower -> Upper
          (p != 2 && c == 2) || (p == 2 && c != 2) || // alpha <-> digit
          (p == 1 && c == 0 && i - 1 > start)         // UPPER run -> Camel tail
        if (boundary) {
          val cut = if (p == 1 && c == 0) i - 1 else i
          if (cut > start) emit(w.substring(start, cut))
          start = cut
        }
      }
      i += 1
    }
    if (start < n) emit(w.substring(start))
  }

  /** NFD-decompose and strip combining marks (CharsetFilter accent map) */
  def foldAccents(s: String): String = {
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 128) ascii = false; i += 1 }
    if (ascii) return s
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var j = 0
    while (j < d.length) {
      val c = d.charAt(j)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      j += 1
    }
    sb.toString
  }
}

/** Porter stemming algorithm (M.F. Porter, 1980, "An algorithm for suffix
  * stripping" — the classic public definition, as used by Whoosh's
  * StemFilter default). Operates on lowercase ASCII words; anything with
  * non-letters passes through unchanged. */
object Porter {

  def stem(w: String): String = {
    if (w.length <= 2) return w
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (c < 'a' || c > 'z') return w
      i += 1
    }
    step5(step4(step3(step2(step1c(step1b(step1a(w)))))))
  }

  private def isVowelAt(s: String, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowelAt(s, i - 1)
    case _ => false
  }

  /** measure m of the stem: number of VC sequences */
  private def measure(s: String): Int = {
    var m = 0
    var i = 0
    val n = s.length
    // skip initial consonants
    while (i < n && !isVowelAt(s, i)) i += 1
    while (i < n) {
      while (i < n && isVowelAt(s, i)) i += 1
      if (i < n) { m += 1; while (i < n && !isVowelAt(s, i)) i += 1 }
    }
    m
  }

  private def hasVowel(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (isVowelAt(s, i)) return true; i += 1 }
    false
  }

  private def endsDoubleConsonant(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      !isVowelAt(s, s.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y */
  private def endsCvc(s: String): Boolean = {
    val n = s.length
    if (n < 3) return false
    val last = s.charAt(n - 1)
    !isVowelAt(s, n - 3) && isVowelAt(s, n - 2) && !isVowelAt(s, n - 1) &&
      last != 'w' && last != 'x' && last != 'y'
  }

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w.dropRight(1) else w
    } else {
      val stripped =
        if (w.endsWith("ed") && hasVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleConsonant(s) && !"lsz".contains(s.last)) s.dropRight(1)
          else if (measure(s) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w.dropRight(1) + "i" else w

  private val Step2Suffixes = List(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val Step3Suffixes = List(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val Step4Suffixes = List(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
    "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def replaceSuffix(w: String, pairs: List[(String, String)], minM: Int): String = {
    pairs.find { case (suf, _) => w.endsWith(suf) } match {
      case Some((suf, rep)) =>
        val stem = w.dropRight(suf.length)
        if (measure(stem) > minM - 1) stem + rep else w
      case None => w
    }
  }

  private def step2(w: String): String = replaceSuffix(w, Step2Suffixes, 1)
  private def step3(w: String): String = replaceSuffix(w, Step3Suffixes, 1)

  private def step4(w: String): String = {
    Step4Suffixes.find(w.endsWith) match {
      case Some("ion") => w // unreachable; ion handled below
      case Some(suf) =>
        val stem = w.dropRight(suf.length)
        if (measure(stem) > 1) stem else w
      case None =>
        if (w.endsWith("ion")) {
          val stem = w.dropRight(3)
          if (stem.nonEmpty && (stem.last == 's' || stem.last == 't') &&
            measure(stem) > 1) stem
          else w
        } else w
    }
  }

  private def step5(w0: String): String = {
    var w = w0
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    if (w.endsWith("ll") && measure(w) > 1) w = w.dropRight(1)
    w
  }
}
