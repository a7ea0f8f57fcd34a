package graft.search

import graft.codec.{LengthByte, PostingsCodec}
import PostingsCodec.TermCursor

/** Document-at-a-time matcher tree over one segment's posting lists
  * (SURVEY.md §2.6 Q2–Q6). The reference's analog is Whoosh's matcher tree
  * ([W] whoosh/matching): LeafMatcher / IntersectionMatcher /
  * UnionMatcher / phrase wrappers, with block-quality skipping.
  *
  * Contract: `docId` is the current matched doc (Long.MaxValue when
  * exhausted); `score` is only valid at a matched doc; `advance()` moves
  * past the current doc; `skipTo(t)` moves to the first matched doc >= t.
  * `maxScore` is a static upper bound over the whole list (WAND pivot math);
  * `currentUpperBound` is a bound valid for the current doc (block-max for
  * leaves — tighter than maxScore).
  */
sealed trait Matcher {
  def docId: Long
  def advance(): Unit
  def skipTo(target: Long): Unit
  def score: Double
  def maxScore: Double
  def currentUpperBound: Double
}

object EmptyMatcher extends Matcher {
  def docId: Long = Long.MaxValue
  def advance(): Unit = ()
  def skipTo(target: Long): Unit = ()
  def score: Double = 0.0
  def maxScore: Double = 0.0
  def currentUpperBound: Double = 0.0
}

/** Leaf over one term's encoded posting list. */
final class TermMatcher(bytes: Array[Byte], idf: Double, rowMaxTf: Int,
                        avgfl: Double, w: Weighting = BM25Weighting) extends Matcher {
  private val cur = new TermCursor(bytes)
  val maxScore: Double = w.upperBound(idf, rowMaxTf)
  def docId: Long = cur.docId
  def advance(): Unit = cur.next()
  def skipTo(target: Long): Unit = cur.skipTo(target)
  def score: Double =
    w.score(idf, cur.tf, LengthByte.decode(cur.lenByte), avgfl)
  def currentUpperBound: Double =
    if (cur.docId == Long.MaxValue) 0.0 else w.upperBound(idf, cur.blockMaxTf)
  /** skip the rest of the current block (single-term block-max pruning) */
  def skipCurrentBlock(): Unit =
    if (cur.docId != Long.MaxValue) cur.skipTo(cur.blockLastDocId + 1)
}

/** Match-all over the segment's live doc list (QEvery): iterates the
  * pseudo posting list the searcher builds from the docstats sidecar;
  * CONSTANT score = boost (Whoosh Every semantics). */
final class EveryMatcher(cur: TermCursor, boost: Double) extends Matcher {
  val maxScore: Double = boost
  def docId: Long = cur.docId
  def advance(): Unit = cur.next()
  def skipTo(target: Long): Unit = cur.skipTo(target)
  def score: Double = boost
  def currentUpperBound: Double = if (cur.docId == Long.MaxValue) 0.0 else boost
}

/** Intersection: doc matches iff all children match; score = sum of child
  * scores in tree order (FP-order pinned to match RefModel). */
final class AndMatcher(children: Array[Matcher]) extends Matcher {
  val maxScore: Double = children.map(_.maxScore).sum
  private var cur: Long = Long.MaxValue

  private def align(): Unit = {
    if (children.isEmpty) return
    var target = children(0).docId
    var aligned = false
    while (!aligned && target != Long.MaxValue) {
      aligned = true
      var i = 0
      while (i < children.length) {
        val c = children(i)
        if (c.docId < target) c.skipTo(target)
        if (c.docId > target) { target = c.docId; aligned = false }
        if (c.docId == Long.MaxValue) { target = Long.MaxValue; aligned = false }
        i += 1
      }
    }
    cur = target
  }
  align()

  def docId: Long = cur
  def advance(): Unit = {
    if (cur == Long.MaxValue) return
    children(0).skipTo(cur + 1)
    align()
  }
  def skipTo(target: Long): Unit = {
    if (cur >= target) return
    children(0).skipTo(target)
    align()
  }
  def score: Double = {
    var s = 0.0
    var i = 0
    while (i < children.length) { s += children(i).score; i += 1 }
    s
  }
  def currentUpperBound: Double = {
    var s = 0.0
    var i = 0
    while (i < children.length) { s += children(i).currentUpperBound; i += 1 }
    s
  }
}

/** Union: doc matches iff any child matches; score = sum over the children
  * matching the current doc, in tree order. */
final class OrMatcher(children: Array[Matcher]) extends Matcher {
  val maxScore: Double = children.map(_.maxScore).sum
  def docId: Long = {
    var m = Long.MaxValue
    var i = 0
    while (i < children.length) {
      if (children(i).docId < m) m = children(i).docId
      i += 1
    }
    m
  }
  def advance(): Unit = {
    val d = docId
    if (d == Long.MaxValue) return
    var i = 0
    while (i < children.length) {
      if (children(i).docId == d) children(i).advance()
      i += 1
    }
  }
  def skipTo(target: Long): Unit = {
    var i = 0
    while (i < children.length) {
      if (children(i).docId < target) children(i).skipTo(target)
      i += 1
    }
  }
  def score: Double = {
    val d = docId
    var s = 0.0
    var i = 0
    while (i < children.length) {
      if (children(i).docId == d) s += children(i).score
      i += 1
    }
    s
  }
  def currentUpperBound: Double = {
    val d = docId
    var s = 0.0
    var i = 0
    while (i < children.length) {
      if (children(i).docId == d) s += children(i).currentUpperBound
      else s += children(i).maxScore // conservative: may still match later docs
      i += 1
    }
    s
  }
}

/** Disjunction-max ([W] whoosh/query/compound.py DisjunctionMax): matches
  * any child's doc; score = best matching child + tiebreak * the rest
  * (mx + tiebreak * (sum - mx), exact when tiebreak = 0). */
final class DisMaxMatcher(children: Array[Matcher], tiebreak: Double) extends Matcher {
  val maxScore: Double = combine(children.map(_.maxScore))
  private def combine(xs: Array[Double]): Double = {
    if (xs.isEmpty) return 0.0
    var sum = 0.0
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < xs.length) {
      sum += xs(i)
      if (xs(i) > mx) mx = xs(i)
      i += 1
    }
    mx + tiebreak * (sum - mx)
  }
  def docId: Long = {
    var m = Long.MaxValue
    var i = 0
    while (i < children.length) {
      if (children(i).docId < m) m = children(i).docId
      i += 1
    }
    m
  }
  def advance(): Unit = {
    val d = docId
    if (d == Long.MaxValue) return
    var i = 0
    while (i < children.length) {
      if (children(i).docId == d) children(i).advance()
      i += 1
    }
  }
  def skipTo(target: Long): Unit = {
    var i = 0
    while (i < children.length) {
      if (children(i).docId < target) children(i).skipTo(target)
      i += 1
    }
  }
  def score: Double = {
    val d = docId
    combine(children.collect { case c if c.docId == d => c.score })
  }
  def currentUpperBound: Double = {
    val d = docId
    combine(children.map(c =>
      if (c.docId == d) c.currentUpperBound
      else c.maxScore)) // conservative: may still match later docs
  }
}

/** a NOT b: positive matches with the negative's docs removed (Q6);
  * score = positive's score. */
final class NotMatcher(pos: Matcher, neg: Matcher) extends Matcher {
  val maxScore: Double = pos.maxScore
  seek()
  private def seek(): Unit = {
    var ok = false
    while (!ok && pos.docId != Long.MaxValue) {
      if (neg.docId < pos.docId) neg.skipTo(pos.docId)
      if (neg.docId == pos.docId) pos.advance() else ok = true
    }
  }
  def docId: Long = pos.docId
  def advance(): Unit = { pos.advance(); seek() }
  def skipTo(target: Long): Unit = { pos.skipTo(target); seek() }
  def score: Double = pos.score
  def currentUpperBound: Double = pos.currentUpperBound
}

/** a ANDMAYBE b (Whoosh AndMaybe): matches exactly a's docs; b's score is
  * added when b also matches the doc (an optional-boost clause). */
final class AndMaybeMatcher(pos: Matcher, maybe: Matcher) extends Matcher {
  val maxScore: Double = pos.maxScore + maybe.maxScore
  def docId: Long = pos.docId
  def advance(): Unit = pos.advance()
  def skipTo(target: Long): Unit = pos.skipTo(target)
  def score: Double = {
    val d = pos.docId
    if (maybe.docId < d) maybe.skipTo(d)
    if (maybe.docId == d) pos.score + maybe.score else pos.score
  }
  def currentUpperBound: Double = pos.currentUpperBound + maybe.maxScore
}

/** a REQUIRE b (Whoosh Require): matches docs where BOTH match, scored by
  * a only — b is a pure filter. */
final class RequireMatcher(pos: Matcher, filter: Matcher) extends Matcher {
  val maxScore: Double = pos.maxScore
  seek()
  private def seek(): Unit = {
    var ok = false
    while (!ok && pos.docId != Long.MaxValue) {
      if (filter.docId < pos.docId) filter.skipTo(pos.docId)
      if (filter.docId == Long.MaxValue) { pos.skipTo(Long.MaxValue); ok = true }
      else if (filter.docId > pos.docId) pos.skipTo(filter.docId)
      else ok = true
    }
  }
  def docId: Long = pos.docId
  def advance(): Unit = { pos.advance(); seek() }
  def skipTo(target: Long): Unit = { pos.skipTo(target); seek() }
  def score: Double = pos.score
  def currentUpperBound: Double = pos.currentUpperBound
}

/** Span matcher layer (D15, [W] whoosh/spans.py): a SpanNode iterates docs
  * carrying the doc's surviving SPANS — packed inclusive (start, end)
  * position pairs [s0,e0,s1,e1,...] — plus the node's ordinary compound
  * score. Spans only FILTER which docs match (Whoosh-faithful); scoring is
  * the wrapped compound's: Near = sum of children, Or = sum of matching
  * children, Not = incl side. A settled node's docId always has nonempty
  * spans (or Long.MaxValue). */
sealed trait SpanNode {
  def docId: Long
  def advance(): Unit
  def skipTo(target: Long): Unit
  /** packed (start, end) pairs at the current matched doc */
  def spans: Array[Int]
  def score: Double
  def maxScore: Double
}

/** term leaf: one span (p, p) per posting position */
final class SpanTermNode(bytes: Array[Byte], idf: Double, rowMaxTf: Int,
                         avgfl: Double, w: Weighting) extends SpanNode {
  private val cur = new TermCursor(bytes)
  val maxScore: Double = w.upperBound(idf, rowMaxTf)
  def docId: Long = cur.docId
  def advance(): Unit = cur.next()
  def skipTo(target: Long): Unit = cur.skipTo(target)
  def spans: Array[Int] = {
    val ps = cur.positions
    val out = new Array[Int](ps.length * 2)
    var i = 0
    while (i < ps.length) { out(2 * i) = ps(i); out(2 * i + 1) = ps(i); i += 1 }
    out
  }
  def score: Double =
    w.score(idf, cur.tf, LengthByte.decode(cur.lenByte), avgfl)
}

/** SpanNear: all children must match; spans fold left-to-right pairwise —
  * ordered: next.start - prev.end in [1, slop], merged (prev.start,
  * next.end); unordered: disjoint with gap in [1, slop] either way. The
  * per-doc combine is quadratic in the (small) per-doc position counts,
  * the same cost class as the sloppy-phrase chain probe. */
final class SpanNearNode(children: Array[SpanNode], slop: Int,
                         ordered: Boolean) extends SpanNode {
  val maxScore: Double = children.map(_.maxScore).sum
  private var cur = Long.MaxValue
  private var curSpans: Array[Int] = null
  seek(0L)

  private def combine(a: Array[Int], b: Array[Int]): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long] // packed key
    var i = 0
    while (i < a.length) {
      val as = a(i); val ae = a(i + 1)
      var j = 0
      while (j < b.length) {
        val bs = b(j); val be = b(j + 1)
        if (bs > ae && bs - ae <= slop)
          out += ((as.toLong << 32) | (be.toLong & 0xffffffffL))
        else if (!ordered && as > be && as - be <= slop)
          out += ((bs.toLong << 32) | (ae.toLong & 0xffffffffL))
        j += 2
      }
      i += 2
    }
    val keys = out.distinct.sorted
    val res = new Array[Int](keys.length * 2)
    var k = 0
    while (k < keys.length) {
      res(2 * k) = (keys(k) >> 32).toInt
      res(2 * k + 1) = keys(k).toInt
      k += 1
    }
    res
  }

  private def seek(from: Long): Unit = {
    var target = math.max(from, children(0).docId)
    var done = false
    while (!done) {
      var aligned = true
      var i = 0
      while (i < children.length && target != Long.MaxValue) {
        val c = children(i)
        if (c.docId < target) c.skipTo(target)
        if (c.docId > target) { target = c.docId; aligned = false; i = children.length }
        else if (c.docId == Long.MaxValue) { target = Long.MaxValue }
        else i += 1
      }
      if (target == Long.MaxValue) { cur = Long.MaxValue; done = true }
      else if (aligned) {
        var s = children(0).spans
        var i2 = 1
        while (i2 < children.length && s.nonEmpty) {
          s = combine(s, children(i2).spans)
          i2 += 1
        }
        if (s.nonEmpty) { cur = target; curSpans = s; done = true }
        else {
          children(0).skipTo(target + 1)
          target = children(0).docId
        }
      }
    }
  }

  def docId: Long = cur
  def advance(): Unit = if (cur != Long.MaxValue) seek(cur + 1)
  def skipTo(target: Long): Unit = if (cur < target) seek(target)
  def spans: Array[Int] = curSpans
  def score: Double = {
    var s = 0.0
    var i = 0
    while (i < children.length) { s += children(i).score; i += 1 }
    s
  }
}

/** SpanOr: union of the children's spans; score = sum over children
  * matching the current doc (tree order). */
final class SpanOrNode(children: Array[SpanNode]) extends SpanNode {
  val maxScore: Double = children.map(_.maxScore).sum
  def docId: Long = {
    var m = Long.MaxValue
    var i = 0
    while (i < children.length) {
      if (children(i).docId < m) m = children(i).docId
      i += 1
    }
    m
  }
  def advance(): Unit = {
    val d = docId
    if (d == Long.MaxValue) return
    var i = 0
    while (i < children.length) {
      if (children(i).docId == d) children(i).advance()
      i += 1
    }
  }
  def skipTo(target: Long): Unit = {
    var i = 0
    while (i < children.length) {
      if (children(i).docId < target) children(i).skipTo(target)
      i += 1
    }
  }
  def spans: Array[Int] = {
    val d = docId
    val keys = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < children.length) {
      if (children(i).docId == d) {
        val s = children(i).spans
        var j = 0
        while (j < s.length) {
          keys += ((s(j).toLong << 32) | (s(j + 1).toLong & 0xffffffffL))
          j += 2
        }
      }
      i += 1
    }
    val ks = keys.distinct.sorted
    val res = new Array[Int](ks.length * 2)
    var k = 0
    while (k < ks.length) {
      res(2 * k) = (ks(k) >> 32).toInt
      res(2 * k + 1) = ks(k).toInt
      k += 1
    }
    res
  }
  def score: Double = {
    val d = docId
    var s = 0.0
    var i = 0
    while (i < children.length) {
      if (children(i).docId == d) s += children(i).score
      i += 1
    }
    s
  }
}

/** SpanNot: incl's spans that do not OVERLAP any excl span at the same doc
  * (overlap: a.start <= b.end && b.start <= a.end); scored by incl only. */
final class SpanNotNode(incl: SpanNode, excl: SpanNode) extends SpanNode {
  val maxScore: Double = incl.maxScore
  private var curSpans: Array[Int] = null
  settle()
  private def settle(): Unit = {
    var done = false
    while (!done && incl.docId != Long.MaxValue) {
      if (excl.docId < incl.docId) excl.skipTo(incl.docId)
      if (excl.docId == incl.docId) {
        val es = excl.spans
        val is = incl.spans
        val keep = scala.collection.mutable.ArrayBuffer.empty[Int]
        var i = 0
        while (i < is.length) {
          val as = is(i); val ae = is(i + 1)
          var hit = false
          var j = 0
          while (!hit && j < es.length) {
            if (as <= es(j + 1) && es(j) <= ae) hit = true
            j += 2
          }
          if (!hit) { keep += as; keep += ae }
          i += 2
        }
        if (keep.nonEmpty) { curSpans = keep.toArray; done = true }
        else incl.advance()
      } else { curSpans = incl.spans; done = true }
    }
  }
  def docId: Long = incl.docId
  def advance(): Unit = { incl.advance(); settle() }
  def skipTo(target: Long): Unit = { incl.skipTo(target); settle() }
  def spans: Array[Int] = curSpans
  def score: Double = incl.score
}

/** SpanContains / SpanBefore / SpanCondition ([W] whoosh/spans.py): both
  * sides must match the doc (intersection scoring a + b); the surviving
  * spans are a's, filtered per mode — Contains keeps a spans containing a
  * b span, Before keeps a spans ending before some b span starts,
  * Condition keeps all (b is a pure same-doc condition). */
final class SpanBiNode(a: SpanNode, b: SpanNode,
                       mode: SpanBiMode) extends SpanNode {
  val maxScore: Double = a.maxScore + b.maxScore
  private var cur = Long.MaxValue
  private var curSpans: Array[Int] = null
  seek(0L)

  private def surviving(): Array[Int] = mode match {
    case SpanConditionMode => a.spans
    case SpanBeforeMode =>
      val as = a.spans
      val bs = b.spans
      var maxBStart = Int.MinValue
      var j = 0
      while (j < bs.length) {
        if (bs(j) > maxBStart) maxBStart = bs(j)
        j += 2
      }
      val keep = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < as.length) {
        if (as(i + 1) < maxBStart) { keep += as(i); keep += as(i + 1) }
        i += 2
      }
      keep.toArray
    case SpanContainsMode =>
      val as = a.spans
      val bs = b.spans
      val keep = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < as.length) {
        var hit = false
        var j = 0
        while (!hit && j < bs.length) {
          if (as(i) <= bs(j) && bs(j + 1) <= as(i + 1)) hit = true
          j += 2
        }
        if (hit) { keep += as(i); keep += as(i + 1) }
        i += 2
      }
      keep.toArray
  }

  private def seek(from: Long): Unit = {
    var target = math.max(from, a.docId)
    var done = false
    while (!done) {
      // leapfrog a and b to a common doc
      if (a.docId < target) a.skipTo(target)
      if (a.docId == Long.MaxValue) { cur = Long.MaxValue; done = true }
      else {
        target = a.docId
        if (b.docId < target) b.skipTo(target)
        if (b.docId == Long.MaxValue) { cur = Long.MaxValue; done = true }
        else if (b.docId > target) target = b.docId
        else {
          val s = surviving()
          if (s.nonEmpty) { cur = target; curSpans = s; done = true }
          else { a.skipTo(target + 1); target = a.docId }
        }
      }
    }
  }

  def docId: Long = cur
  def advance(): Unit = if (cur != Long.MaxValue) seek(cur + 1)
  def skipTo(target: Long): Unit = if (cur < target) seek(target)
  def spans: Array[Int] = curSpans
  def score: Double = a.score + b.score
}

/** SpanFirst ([W] whoosh/spans.py SpanFirst(q, limit), round-5): keeps the
  * child's spans ending strictly before `limit`; scored by the child. */
final class SpanFirstNode(child: SpanNode, limit: Int) extends SpanNode {
  val maxScore: Double = child.maxScore
  private var curSpans: Array[Int] = null
  settle()
  private def settle(): Unit = {
    var done = false
    while (!done && child.docId != Long.MaxValue) {
      val cs = child.spans
      val keep = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < cs.length) {
        if (cs(i + 1) < limit) { keep += cs(i); keep += cs(i + 1) }
        i += 2
      }
      if (keep.nonEmpty) { curSpans = keep.toArray; done = true }
      else child.advance()
    }
  }
  def docId: Long = child.docId
  def advance(): Unit = { child.advance(); settle() }
  def skipTo(target: Long): Unit = { child.skipTo(target); settle() }
  def spans: Array[Int] = curSpans
  def score: Double = child.score
}

/** ConstantScore ([W] whoosh ConstantScoreQuery, round-5): the child's doc
  * stream with every score pinned to `const` — upper bounds are exact, so
  * WAND/saturation pruning over it is maximally tight. */
final class ConstantScoreMatcher(child: Matcher, const: Double) extends Matcher {
  val maxScore: Double = const
  def docId: Long = child.docId
  def advance(): Unit = child.advance()
  def skipTo(target: Long): Unit = child.skipTo(target)
  def score: Double = const
  def currentUpperBound: Double = const
}

/** adapts a span tree root to the ordinary Matcher contract */
final class SpanScorer(root: SpanNode) extends Matcher {
  val maxScore: Double = root.maxScore
  def docId: Long = root.docId
  def advance(): Unit = root.advance()
  def skipTo(target: Long): Unit = root.skipTo(target)
  def score: Double = root.score
  def currentUpperBound: Double = maxScore
}

/** Sloppy phrase (`"a b"~N` with N > 1, decision D8): surviving terms must
  * occur IN ORDER with each consecutive matched pair's position gap in
  * [1, slop]; tf = number of distinct first-term positions admitting a full
  * chain; idf = sum of constituent idfs (as D3). The per-base probe is a
  * bounded depth-first search (<= slop candidates per level over sorted
  * position arrays — phrase lengths and slops are small). */
final class SloppyPhraseMatcher(terms: Array[TermCursor], slop: Int,
                                sumIdf: Double, maxTfBound: Int, avgfl: Double,
                                w: Weighting = BM25Weighting) extends Matcher {
  val maxScore: Double = w.upperBound(sumIdf, maxTfBound)
  private var cur = Long.MaxValue
  private var curTf = 0
  seek(0L)

  private def chainExists(i: Int, prev: Int): Boolean = {
    if (i == terms.length) return true
    val ps = terms(i).positions
    var k = java.util.Arrays.binarySearch(ps, prev + 1)
    if (k < 0) k = -k - 1
    while (k < ps.length && ps(k) <= prev + slop) {
      if (chainExists(i + 1, ps(k))) return true
      k += 1
    }
    false
  }

  private def phraseTfAt(): Int = {
    val base = terms(0).positions
    var count = 0
    var i = 0
    while (i < base.length) {
      if (chainExists(1, base(i))) count += 1
      i += 1
    }
    count
  }

  private def seek(from: Long): Unit = {
    var target = math.max(from, terms(0).docId)
    var done = false
    while (!done) {
      var aligned = true
      var i = 0
      while (i < terms.length && target != Long.MaxValue) {
        val c = terms(i)
        if (c.docId < target) c.skipTo(target)
        if (c.docId > target) { target = c.docId; aligned = false; i = terms.length }
        else if (c.docId == Long.MaxValue) { target = Long.MaxValue }
        else i += 1
      }
      if (target == Long.MaxValue) { cur = Long.MaxValue; done = true }
      else if (aligned) {
        val tf = phraseTfAt()
        if (tf > 0) { cur = target; curTf = tf; done = true }
        else {
          val c0 = terms(0)
          c0.skipTo(target + 1)
          target = c0.docId
        }
      }
    }
  }

  def docId: Long = cur
  def advance(): Unit = if (cur != Long.MaxValue) seek(cur + 1)
  def skipTo(target: Long): Unit = if (cur < target) seek(target)
  def score: Double = {
    val fl = LengthByte.decode(terms(0).lenByte)
    w.score(sumIdf, curTf, fl, avgfl)
  }
  def currentUpperBound: Double = maxScore
}

/** Positional phrase (Q5, decision D3): terms must occur at their
  * query-side raw-position offsets; tf = number of matching start
  * positions; idf = sum of constituent idfs. */
final class PhraseMatcher(terms: Array[(TermCursor, Int)], sumIdf: Double,
                          maxTfBound: Int, avgfl: Double,
                          w: Weighting = BM25Weighting) extends Matcher {
  val maxScore: Double = w.upperBound(sumIdf, maxTfBound)
  private var cur = Long.MaxValue
  private var curTf = 0
  seek(0L)

  private def phraseTfAt(): Int = {
    val (c0, off0) = terms(0)
    val base = c0.positions
    var count = 0
    var i = 0
    while (i < base.length) {
      val start = base(i) - off0
      var all = start >= 0
      var j = 1
      while (all && j < terms.length) {
        val (cj, offj) = terms(j)
        all = java.util.Arrays.binarySearch(cj.positions, start + offj) >= 0
        j += 1
      }
      if (all) count += 1
      i += 1
    }
    count
  }

  private def seek(from: Long): Unit = {
    // leapfrog docId alignment, then positional check; repeat until tf>0
    var target = math.max(from, terms(0)._1.docId)
    var done = false
    while (!done) {
      var aligned = true
      var i = 0
      while (i < terms.length && target != Long.MaxValue) {
        val c = terms(i)._1
        if (c.docId < target) c.skipTo(target)
        if (c.docId > target) { target = c.docId; aligned = false; i = terms.length }
        else if (c.docId == Long.MaxValue) { target = Long.MaxValue }
        else i += 1
      }
      if (target == Long.MaxValue) { cur = Long.MaxValue; done = true }
      else if (aligned) {
        val tf = phraseTfAt()
        if (tf > 0) { cur = target; curTf = tf; done = true }
        else {
          // positional miss: realign from the first cursor's NEXT doc —
          // skipping straight there avoids one wasted realignment round per
          // miss (vs target += 1, which re-probes a doc the first list
          // cannot contain)
          val c0 = terms(0)._1
          c0.skipTo(target + 1)
          target = c0.docId
        }
      }
    }
  }

  def docId: Long = cur
  def advance(): Unit = if (cur != Long.MaxValue) seek(cur + 1)
  def skipTo(target: Long): Unit = if (cur < target) seek(target)
  def score: Double = {
    val fl = LengthByte.decode(terms(0)._1.lenByte)
    w.score(sumIdf, curTf, fl, avgfl)
  }
  def currentUpperBound: Double = maxScore
}
