package graft.ref

import scala.collection.mutable
import graft.analysis.Analyzer
import graft.codec.LengthByte
import graft.search._

/** Single-threaded, obviously-correct scalar oracle (SURVEY.md §0, §5.2).
  *
  * Implements the pinned semantics (analysis chain, BM25 §2.7, phrase D3,
  * tie rule D4) by brute force: in-memory hash maps, exhaustive scoring of
  * every document for every query, no compression, no WAND, no Spark. The
  * distributed engine must be rank-identical and score-identical (±1e-6)
  * to this model on the fixture corpus + query set (FIXTURES.md §3).
  */
final class RefModel(docs: Seq[(Long, String)],
                     analyzeFn: String => Analyzer.Analyzed = Analyzer.analyze,
                     w: Weighting = BM25Weighting) {

  // term -> docId -> (tf, positions ascending)
  private val postings = mutable.HashMap.empty[String, mutable.HashMap[Long, Array[Int]]]
  private val rawLen = mutable.HashMap.empty[Long, Int]

  docs.foreach { case (docId, content) =>
    val a = analyzeFn(content)
    rawLen(docId) = a.fieldLen
    a.terms.foreach { case (term, ps) =>
      postings.getOrElseUpdate(term, mutable.HashMap.empty)(docId) = ps
    }
  }

  val numDocs: Long = docs.size.toLong
  val totalLen: Long = rawLen.values.map(_.toLong).sum
  val stats: BM25.CorpusStats = BM25.CorpusStats(numDocs, totalLen)

  def df(term: String): Long = postings.get(term).map(_.size.toLong).getOrElse(0L)
  def idf(term: String): Double = w.idf(df(term), numDocs)
  private def fl(docId: Long): Int = LengthByte.roundtrip(rawLen(docId))

  private lazy val sortedTerms: Seq[String] = postings.keys.toSeq.sorted
  /** multiterm expansion against the oracle's own lexicon (ascending terms) */
  def prefixLookup(mq: QMulti): Seq[String] = sortedTerms.filter(mq.matches)

  /** the single field this model holds (a multi-field oracle composes one
    * RefModel per field — see MultiFieldSpec) */
  val field: String = Q.DefaultField

  /** score of query q at doc, None if the doc doesn't match. Boost folds
    * into the idf factor: effIdf = idf * boost — the pinned form the kernel
    * replicates (Kernel.buildMatcher). */
  def scoreDoc(q: Q, docId: Long): Option[Double] = q match {
    case QEmpty            => None
    case _: QPureNot       => None
    case QEvery(boost, f)  => // match-all, constant score
      if (f.isEmpty) Some(boost) // all docs
      else if (f != field) None
      else if (rawLen.getOrElse(docId, 0) > 0) Some(boost) else None
    case mq: QMulti => scoreDoc(QueryRewrite.expandPrefixes(mq, prefixLookup), docId)
    case QTerm(t, f, boost) =>
      if (f != field) None
      else postings.get(t).flatMap(_.get(docId)).map { ps =>
        w.score(idf(t) * boost, ps.length, fl(docId), stats.avgFieldLen)
      }
    case QPhrase(ts, f, boost, slop) =>
      if (f != field) None
      else {
        val ptf = if (slop <= 1) phraseTf(ts, docId)
                  else sloppyTf(ts.map(_._1), slop, docId)
        if (ptf == 0) None
        else {
          val sumIdf = ts.map { case (t, _) => idf(t) }.sum * boost
          Some(w.score(sumIdf, ptf, fl(docId), stats.avgFieldLen))
        }
      }
    case QAnd(cs) =>
      val scores = cs.map(c => scoreDoc(c, docId))
      if (scores.forall(_.isDefined)) Some(scores.map(_.get).sum) else None
    case QOr(cs) =>
      val scores = cs.flatMap(c => scoreDoc(c, docId))
      if (scores.isEmpty) None else Some(scores.sum)
    case QDisMax(cs, tb) =>
      val scores = cs.flatMap(c => scoreDoc(c, docId))
      if (scores.isEmpty) None
      else Some(scores.max + tb * (scores.sum - scores.max))
    case QNot(p, n) =>
      if (scoreDoc(n, docId).isDefined) None else scoreDoc(p, docId)
    case QAndMaybe(p, m) =>
      scoreDoc(p, docId).map(s => s + scoreDoc(m, docId).getOrElse(0.0))
    case QRequire(p, f) =>
      if (scoreDoc(f, docId).isEmpty) None else scoreDoc(p, docId)
    // span queries (D15): spans FILTER which docs match; scoring is the
    // wrapped compound's (Near = sum of children, Or = sum of matching
    // children, Not = incl side)
    case QSpanNear(cs, _, _) =>
      if (spansOf(q, docId).isEmpty) None
      else Some(cs.flatMap(c => scoreDoc(c, docId)).sum)
    case QSpanOr(cs) =>
      if (spansOf(q, docId).isEmpty) None
      else Some(cs.flatMap(c => scoreDoc(c, docId)).sum)
    case QSpanNot(i, _) =>
      if (spansOf(q, docId).isEmpty) None else scoreDoc(i, docId)
    case QSpanBi(a, b, _) => // both sides required; intersection scoring
      if (spansOf(q, docId).isEmpty) None
      else Some(Seq(scoreDoc(a, docId), scoreDoc(b, docId)).flatten.sum)
    case QSpanFirst(c, _) => // spans filter; scored by the child
      if (spansOf(q, docId).isEmpty) None else scoreDoc(c, docId)
    case QConstantScore(c, sc) => scoreDoc(c, docId).map(_ => sc)
    case QOtherwise(a, b) => // pinned GLOBAL resolution (brute force here)
      if (docs.exists { case (d, _) => scoreDoc(a, d).isDefined }) scoreDoc(a, docId)
      else scoreDoc(b, docId)
  }

  /** the doc's surviving spans for a span-capable node, None/empty = no
    * match (brute force — the obviously-correct mirror of the kernel's
    * SpanNode tree) */
  private def spansOf(q: Q, docId: Long): Option[Seq[(Int, Int)]] = (q match {
    case QTerm(t, f, _) if f == field =>
      postings.get(t).flatMap(_.get(docId)).map(_.toSeq.map(p => (p, p)))
    case QSpanNear(cs, slop, ordered) =>
      val childSpans = cs.map(spansOf(_, docId))
      if (childSpans.exists(_.isEmpty)) None
      else Some(childSpans.map(_.get).reduceLeft { (as, bs) =>
        (for {
          (a1, a2) <- as
          (b1, b2) <- bs
          s <- if (b1 > a2 && b1 - a2 <= slop) Some((a1, b2))
               else if (!ordered && a1 > b2 && a1 - b2 <= slop) Some((b1, a2))
               else None
        } yield s).distinct.sorted
      })
    case QSpanOr(cs) =>
      cs.flatMap(spansOf(_, docId)) match {
        case Nil => None
        case ss  => Some(ss.flatten.distinct.sorted)
      }
    case QSpanNot(i, e) =>
      spansOf(i, docId).map { is =>
        spansOf(e, docId) match {
          case None     => is
          case Some(es) =>
            is.filterNot { case (a1, a2) =>
              es.exists { case (b1, b2) => a1 <= b2 && b1 <= a2 } }
        }
      }
    case QSpanBi(a, b, mode) =>
      for {
        as <- spansOf(a, docId)
        bs <- spansOf(b, docId)
      } yield mode match {
        case SpanConditionMode => as
        case SpanBeforeMode =>
          val maxBStart = bs.map(_._1).max
          as.filter(_._2 < maxBStart)
        case SpanContainsMode =>
          as.filter { case (a1, a2) =>
            bs.exists { case (b1, b2) => a1 <= b1 && b2 <= a2 } }
      }
    case QSpanFirst(c, l) =>
      spansOf(c, docId).map(_.filter(_._2 < l))
    case _ => None
  }).filter(_.nonEmpty)

  /** sloppy phrase tf (D8, `"..."~N` with N > 1): number of first-term
    * positions admitting an in-order chain with every consecutive gap in
    * [1, slop] — brute-force over the position lists */
  private def sloppyTf(ts: List[String], slop: Int, docId: Long): Int = {
    val posLists: List[Array[Int]] = ts.map { t =>
      postings.get(t).flatMap(_.get(docId)) match {
        case Some(ps) => ps
        case None     => return 0
      }
    }
    def chain(rest: List[Array[Int]], prev: Int): Boolean = rest match {
      case Nil => true
      case ps :: tail =>
        ps.exists(p => p > prev && p <= prev + slop && chain(tail, p))
    }
    posLists.head.count(p0 => chain(posLists.tail, p0))
  }

  /** number of occurrences of the position pattern ts in docId */
  private def phraseTf(ts: List[(String, Int)], docId: Long): Int = {
    val posLists = ts.map { case (t, off) =>
      postings.get(t).flatMap(_.get(docId)) match {
        case Some(ps) => (ps, off)
        case None     => return 0
      }
    }
    val (base, off0) = posLists.head
    base.count { p0 =>
      val start = p0 - off0
      posLists.tail.forall { case (ps, off) => ps.contains(start + off) }
    }
  }

  /** exhaustive top-k, tie rule (score desc, docId asc) — D4 */
  def search(q0: Q, k: Int): Seq[(Long, Double)] = {
    val q = if (q0.hasPrefix) QueryRewrite.expandPrefixes(q0, prefixLookup) else q0
    docs.iterator
      .flatMap { case (d, _) => scoreDoc(q, d).map(s => (d, s)) }
      .toSeq
      .sortBy { case (d, s) => (-s, d) }
      .take(k)
  }

  def search(query: String, k: Int): Seq[(Long, Double)] =
    search(QueryParser.parse(query), k)
}
