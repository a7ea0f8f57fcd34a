package graft.search

import graft.codec.PostingsCodec
import PostingsCodec.TermCursor

/** Partition-local top-k kernel (SURVEY.md §2.6 Q7, §2.7): evaluates the
  * query tree over ONE segment's posting lists and returns that segment's
  * top-k, to be merged across segments by the driver. Runs inside
  * `mapGroups`/`mapPartitions` on executors (BASELINE.json:6
  * "partition-local mapPartitions kernel").
  *
  * Pruning (all score-equivalent to exhaustive evaluation — property-tested):
  *  - OR root: WAND pivoting on static per-child maxScore, refined by
  *    block-max upper bounds before full evaluation (block-max WAND);
  *  - term root: whole-block skipping when the block's max-tf bound can't
  *    beat the running threshold;
  *  - AND/phrase: leapfrog intersection with header-only block skipping.
  *
  * Tie rule D4 everywhere: (score desc, docId asc). A candidate is pruned
  * only when its upper bound is STRICTLY below the current k-th score —
  * an equal-score doc could still win on docId.
  */
object Kernel {

  /** one term's segment-local list + global stats */
  final case class TermList(bytes: Array[Byte], maxTf: Int, globalDf: Long)

  final case class Hit(docId: Long, score: Double)

  /** bounded heap keeping the k best by (score desc, docId asc) */
  final class TopK(k: Int) {
    // worst element on top: smaller score first; tie -> LARGER docId first
    private val ord: Ordering[Hit] = (a: Hit, b: Hit) =>
      if (a.score != b.score) java.lang.Double.compare(b.score, a.score)
      else java.lang.Long.compare(a.docId, b.docId)
    private val pq = scala.collection.mutable.PriorityQueue.empty[Hit](ord)

    def threshold: Double = if (pq.size < k) Double.NegativeInfinity else pq.head.score
    def offer(docId: Long, score: Double): Unit = {
      if (pq.size < k) pq.enqueue(Hit(docId, score))
      else {
        val w = pq.head
        if (score > w.score || (score == w.score && docId < w.docId)) {
          pq.dequeue(); pq.enqueue(Hit(docId, score))
        }
      }
    }
    def result: Array[Hit] =
      pq.toArray.sortBy(h => (-h.score, h.docId))
  }

  /** Build the matcher tree for one segment. Terms absent from the segment
    * become EmptyMatcher; AND/phrase with an absent term match nothing. */
  def buildMatcher(q: Q, lists: Map[String, TermList],
                   stats: BM25.CorpusStats): Matcher = q match {
    case QEmpty => EmptyMatcher
    case mq: QMulti => // expansion is GLOBAL (driver-side, lexicon order)
      throw new IllegalStateException(s"unexpanded multiterm query: $mq")
    case QTerm(t) =>
      lists.get(t) match {
        case Some(tl) =>
          new TermMatcher(tl.bytes, BM25.idf(tl.globalDf, stats.numDocs),
            tl.maxTf, stats.avgFieldLen)
        case None => EmptyMatcher
      }
    case QPhrase(ts) =>
      val tls = ts.map { case (t, off) => (lists.get(t), off) }
      if (tls.exists(_._1.isEmpty)) EmptyMatcher
      else {
        val cursors = tls.map { case (tl, off) => (new TermCursor(tl.get.bytes), off) }.toArray
        val sumIdf = ts.map { case (t, _) => BM25.idf(lists(t).globalDf, stats.numDocs) }.sum
        val maxTfBound = tls.map(_._1.get.maxTf).min
        new PhraseMatcher(cursors, sumIdf, maxTfBound, stats.avgFieldLen)
      }
    case QAnd(cs) =>
      val ms = cs.map(buildMatcher(_, lists, stats))
      if (ms.exists(_ eq EmptyMatcher)) EmptyMatcher else new AndMatcher(ms.toArray)
    case QOr(cs) =>
      val ms = cs.map(buildMatcher(_, lists, stats)).filterNot(_ eq EmptyMatcher)
      ms match {
        case Nil      => EmptyMatcher
        case m :: Nil => m
        case _        => new OrMatcher(ms.toArray)
      }
    case QNot(p, n) =>
      val pm = buildMatcher(p, lists, stats)
      val nm = buildMatcher(n, lists, stats)
      if (pm eq EmptyMatcher) EmptyMatcher
      else if (nm eq EmptyMatcher) pm
      else new NotMatcher(pm, nm)
  }

  /** Segment top-k. `prune = false` forces exhaustive evaluation (the
    * WAND-equivalence property-test path). `deleted` hides tombstoned docs
    * at query time (S6) — they are purged physically only at merge. */
  def topK(q: Q, lists: Map[String, TermList], stats: BM25.CorpusStats,
           k: Int, prune: Boolean = true,
           deleted: Long => Boolean = NoDeletes): Array[Hit] = {
    val heap = new TopK(k)
    q match {
      case QOr(cs) if prune =>
        val ms = cs.map(buildMatcher(_, lists, stats)).filterNot(_ eq EmptyMatcher)
        if (ms.nonEmpty) wandOr(ms.toArray, heap, deleted)
      case QTerm(_) if prune =>
        buildMatcher(q, lists, stats) match {
          case tm: TermMatcher => singleTerm(tm, heap, deleted)
          case _               => ()
        }
      case _ =>
        val m = buildMatcher(q, lists, stats)
        while (m.docId != Long.MaxValue) {
          if (!deleted(m.docId)) heap.offer(m.docId, m.score)
          m.advance()
        }
    }
    heap.result
  }

  val NoDeletes: Long => Boolean = _ => false

  /** single-list traversal with block-max skipping */
  private def singleTerm(tm: TermMatcher, heap: TopK, deleted: Long => Boolean): Unit = {
    while (tm.docId != Long.MaxValue) {
      if (tm.currentUpperBound < heap.threshold) tm.skipCurrentBlock()
      else {
        if (!deleted(tm.docId)) heap.offer(tm.docId, tm.score)
        tm.advance()
      }
    }
  }

  /** WAND over the children of an OR root. Children are summed in tree
    * order at evaluation (FP-order identical to RefModel). */
  private def wandOr(children: Array[Matcher], heap: TopK,
                     deleted: Long => Boolean): Unit = {
    val n = children.length
    val order = children.indices.toArray // re-sorted by head docId each round
    var done = false
    while (!done) {
      scala.util.Sorting.stableSort[Int](order,
        (a: Int, b: Int) => children(a).docId < children(b).docId)
      if (children(order(0)).docId == Long.MaxValue) done = true
      else {
        // pivot: first prefix whose maxScore sum could reach the threshold
        val theta = heap.threshold
        var acc = 0.0
        var pivotIdx = -1
        var i = 0
        while (pivotIdx < 0 && i < n) {
          acc += children(order(i)).maxScore
          if (acc >= theta) pivotIdx = i
          i += 1
        }
        if (pivotIdx < 0) done = true // no list combination can reach theta
        else {
          val pivot = children(order(pivotIdx)).docId
          if (pivot == Long.MaxValue) done = true
          else if (children(order(0)).docId == pivot) {
            // every head is at >= pivot; the ones AT pivot form the match.
            // block-max refinement before full scoring:
            var ub = 0.0
            var j = 0
            while (j < n) {
              if (children(j).docId == pivot) ub += children(j).currentUpperBound
              j += 1
            }
            if (ub >= theta && !deleted(pivot)) {
              var s = 0.0
              var m = 0
              while (m < n) { // tree order for FP determinism
                if (children(m).docId == pivot) s += children(m).score
                m += 1
              }
              heap.offer(pivot, s)
            }
            var a = 0
            while (a < n) {
              if (children(a).docId == pivot) children(a).advance()
              a += 1
            }
          } else {
            // advance the laggard up to the pivot
            children(order(0)).skipTo(pivot)
          }
        }
      }
    }
  }
}
