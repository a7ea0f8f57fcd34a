package graft

import graft.codec.PostingsCodec
import graft.analysis.Analyzer
import graft.codec.LengthByte
import graft.search.{BM25, Kernel}

/** FIXTURES.md §2 micro corpus + §3 reference query set. */
object TestFixtures {

  val fixture5: Seq[(Long, String)] = Seq(
    0L -> "A search engine is an information retrieval system designed to help find information stored on a computer system",
    1L -> "The search results are usually presented in a list and are commonly called hits ranked by a scoring function",
    2L -> "def score the okapi bm25 ranking function uses term frequency and inverse document frequency to rank matching documents",
    3L -> "posting lists store document identifiers term frequency and positions compressed with delta encoding and varint coding for fast search",
    4L -> "search engines build an inverted index mapping each term to the documents containing it enabling fast full text search over large corpora"
  )

  val querySet: Seq[(String, String)] = Seq(
    "q01" -> "search",
    "q02" -> "frequency",
    "q03" -> "banana",
    "q04" -> "the search",
    "q05" -> "search engine",
    "q06" -> "term AND frequency",
    "q07" -> "search OR banana",
    "q08" -> "postings OR engine OR ranking",
    "q09" -> "\"search engine\"",
    "q10" -> "\"information retrieval\"",
    "q11" -> "\"search results\"",
    "q12" -> "\"engine is information\"",
    "q13" -> "score AND \"term frequency\""
  )

  /** Build an in-memory single-segment index: term -> TermList, via the
    * REAL codec (encode path shared with the distributed builder). */
  def memSegment(docs: Seq[(Long, String)]): (Map[String, Kernel.TermList], BM25.CorpusStats) = {
    val sorted = docs.sortBy(_._1)
    var totalLen = 0L
    val byTerm = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[PostingsCodec.Pst]]
    val everyEnc = new PostingsCodec.Encoder
    val p0 = Array(0)
    sorted.foreach { case (docId, content) =>
      val a = Analyzer.analyze(content)
      totalLen += a.fieldLen
      val lb = LengthByte.encode(a.fieldLen)
      everyEnc.add(docId, 1, lb, p0)
      a.terms.foreach { case (term, ps) =>
        byTerm.getOrElseUpdate(term,
          scala.collection.mutable.ArrayBuffer.empty) +=
          PostingsCodec.Pst(docId, ps.length, lb, ps)
      }
    }
    val lists = byTerm.map { case (term, psts) =>
      val enc = PostingsCodec.encode(psts.iterator)
      term -> Kernel.TermList(enc.bytes, enc.maxTf, enc.df.toLong)
    }.toMap
    // the match-all pseudo list, exactly as Searcher.everyRows builds it
    val ev = everyEnc.finish()
    val withEvery = lists + (graft.search.Q.EveryTerm ->
      Kernel.TermList(ev.bytes, ev.maxTf, ev.df.toLong))
    (withEvery, BM25.CorpusStats(sorted.size.toLong, totalLen))
  }

}
