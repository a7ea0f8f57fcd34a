package graft.search

import graft.analysis.Analyzer

/** Query AST + parser for the pinned query surface (SURVEY.md §2.6 Q1):
  * term, implicit/explicit AND, OR, quoted phrase; plus NOT (Q6 stretch)
  * and parentheses. Query text runs through the same analyzer as indexing
  * ([W] whoosh/qparser/default.py semantics): stopwords are dropped from
  * queries too, and phrase terms keep their raw-stream positions so a
  * phrase spanning a dropped stopword requires the original gap (q12).
  */
sealed trait Q extends Serializable {
  /** all leaf terms mentioned (for posting-list pruning); prefixes must be
    * expanded (QueryRewrite) before this is meaningful */
  def terms: Set[String] = this match {
    case QTerm(t)        => Set(t)
    case QPhrase(ts)     => ts.map(_._1).toSet
    case QAnd(cs)        => cs.flatMap(_.terms).toSet
    case QOr(cs)         => cs.flatMap(_.terms).toSet
    case QNot(p, n)      => p.terms ++ n.terms
    case QPrefix(_)      => Set.empty
    case QEmpty          => Set.empty
  }
  def hasPrefix: Boolean = this match {
    case QPrefix(_) => true
    case QAnd(cs)   => cs.exists(_.hasPrefix)
    case QOr(cs)    => cs.exists(_.hasPrefix)
    case QNot(p, n) => p.hasPrefix || n.hasPrefix
    case _          => false
  }
}
final case class QTerm(term: String) extends Q
/** phrase terms with raw-stream offsets, e.g. "engine is information" ->
  * List((engine,0),(information,2)) after stop removal. */
final case class QPhrase(ts: List[(String, Int)]) extends Q
final case class QAnd(cs: List[Q]) extends Q
final case class QOr(cs: List[Q]) extends Q
/** matches positive minus docs matching negative; scored by positive only */
final case class QNot(positive: Q, negative: Q) extends Q
/** `foo*`: expanded to an OR over the first MaxExpand lexicon terms with
  * the prefix (Whoosh Prefix analog, SURVEY.md §2.6 stretch set); pinned
  * expansion order = ascending term. */
final case class QPrefix(prefix: String) extends Q
object QPrefix { final val MaxExpand = 128 }
case object QEmpty extends Q

object QueryRewrite {
  /** expand every QPrefix against a (sorted-unique) global term source */
  def expandPrefixes(q: Q, lookup: String => Seq[String]): Q = q match {
    case QPrefix(p) =>
      lookup(p).take(QPrefix.MaxExpand).toList match {
        case Nil      => QEmpty
        case t :: Nil => QTerm(t)
        case ts       => QOr(ts.map(QTerm.apply))
      }
    case QAnd(cs) =>
      val es = cs.map(expandPrefixes(_, lookup))
      if (es.contains(QEmpty)) QEmpty else QAnd(es)
    case QOr(cs) =>
      es2or(cs.map(expandPrefixes(_, lookup)))
    case QNot(p, n) =>
      val pe = expandPrefixes(p, lookup)
      val ne = expandPrefixes(n, lookup)
      if (pe == QEmpty) QEmpty else if (ne == QEmpty) pe else QNot(pe, ne)
    case other => other
  }
  private def es2or(cs: List[Q]): Q = cs.filterNot(_ == QEmpty) match {
    case Nil      => QEmpty
    case c :: Nil => c
    case xs       => QOr(xs)
  }
}

object QueryParser {

  private sealed trait Tok
  private case class Word(s: String) extends Tok
  private case class Phrase(s: String) extends Tok
  private case object TAnd extends Tok
  private case object TOr extends Tok
  private case object TNot extends Tok
  private case object LP extends Tok
  private case object RP extends Tok

  private def lex(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') { out += RP; i += 1 }
      else if (c == '"') {
        val j = s.indexOf('"', i + 1)
        val end = if (j < 0) n else j
        out += Phrase(s.substring(i + 1, end))
        i = if (j < 0) n else j + 1
      } else {
        var j = i
        while (j < n && !s.charAt(j).isWhitespace && s.charAt(j) != '(' &&
          s.charAt(j) != ')' && s.charAt(j) != '"') j += 1
        val w = s.substring(i, j)
        w match {
          case "AND" => out += TAnd
          case "OR"  => out += TOr
          case "NOT" => out += TNot
          case _     => out += Word(w)
        }
        i = j
      }
    }
    out.toList
  }

  /** Parse a query string; QEmpty if nothing indexable remains. */
  def parse(s: String): Q = {
    var toks = lex(s)

    def peek: Option[Tok] = toks.headOption
    def pop(): Tok = { val t = toks.head; toks = toks.tail; t }

    // orExpr := andExpr (OR andExpr)*
    def orExpr(): Q = {
      var cs = List(andExpr())
      while (peek.contains(TOr)) { pop(); cs = cs :+ andExpr() }
      mkOr(cs)
    }

    // andExpr := unary ((AND|NOT)? unary)*  — adjacency = AND; NOT binds the
    // following unary as a negative clause of the group (Whoosh-style AndNot).
    def andExpr(): Q = {
      var pos = List.empty[Q]
      var neg = List.empty[Q]
      var continue = true
      pos = pos :+ unary()
      while (continue) {
        peek match {
          case Some(TAnd)                              => pop(); pos = pos :+ unary()
          case Some(TNot)                              => pop(); neg = neg :+ unary()
          case Some(Word(_)) | Some(Phrase(_)) | Some(LP) => pos = pos :+ unary()
          case _                                       => continue = false
        }
      }
      val p = mkAnd(pos)
      val negsLive = neg.filterNot(_ == QEmpty)
      if (negsLive.isEmpty) p
      else if (p == QEmpty) QEmpty
      else QNot(p, mkOr(negsLive))
    }

    def unary(): Q = pop() match {
      case LP =>
        val q = orExpr()
        if (peek.contains(RP)) pop()
        q
      case Word(w) if w.length > 1 && w.endsWith("*") &&
          !w.init.contains("*") =>
        // prefix query: lowercase, NOT stop-filtered (reference semantics:
        // multiterm query text is not run through the full analyzer)
        QPrefix(w.init.toLowerCase(java.util.Locale.ROOT))
      case Word(w) =>
        Analyzer.tokenize(w).toList match {
          case Nil      => QEmpty // stopword-only -> dropped from group
          case t :: Nil => QTerm(t.term)
          case ts       => mkPhrase(ts.map(t => (t.term, t.pos))) // dotted compounds etc.
        }
      case Phrase(p) =>
        Analyzer.tokenize(p).toList.map(t => (t.term, t.pos)) match {
          case Nil           => QEmpty
          case (t, _) :: Nil => QTerm(t)
          case ts            => mkPhrase(ts)
        }
      case RP   => QEmpty
      case TAnd => QEmpty
      case TOr  => QEmpty
      case TNot => QEmpty
    }

    // phrase offsets are rebased so the first surviving term sits at 0 —
    // relative gaps (incl. gaps across removed stopwords, q12) are what matters
    def mkPhrase(ts: List[(String, Int)]): Q = {
      val base = ts.head._2
      QPhrase(ts.map { case (t, p) => (t, p - base) })
    }

    // dropped (stopword-only) children vanish from their group, Whoosh-style:
    // "the search" == "search". A group that loses ALL children is QEmpty.
    def mkAnd(cs0: List[Q]): Q = cs0.filterNot(_ == QEmpty) match {
      case Nil      => QEmpty
      case c :: Nil => c
      case cs       => QAnd(cs)
    }
    def mkOr(cs0: List[Q]): Q = cs0.filterNot(_ == QEmpty) match {
      case Nil      => QEmpty
      case c :: Nil => c
      case cs       => QOr(cs)
    }

    if (toks.isEmpty) QEmpty else orExpr()
  }
}
