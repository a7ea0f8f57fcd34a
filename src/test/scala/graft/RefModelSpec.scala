package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ref.RefModel
import graft.search._

/** Engineered-fact checks on the fixture corpus (FIXTURES.md §2-3): the
  * oracle itself must show the pinned behaviors before it can gate the
  * distributed engine. */
class RefModelSpec extends AnyFunSuite {

  private val ref = new RefModel(TestFixtures.fixture5)

  test("corpus stats") {
    assert(ref.numDocs == 5)
    assert(ref.df("search") == 4) // docs 0,1,3,4
    assert(ref.df("engine") == 1) // doc 0 only; doc 4 has "engines"
    assert(ref.df("engines") == 1)
    assert(ref.df("banana") == 0)
    assert(ref.df("the") == 0) // stopword never indexed
  }

  test("q01 term: all four docs, ranked") {
    val hits = ref.search("search", 10)
    assert(hits.map(_._1).toSet == Set(0L, 1L, 3L, 4L))
    assert(hits.map(_._2).distinct.size >= 2) // length normalization separates them
    // doc 4 has tf=2 for search -> should rank first
    assert(hits.head._1 == 4L)
  }

  test("q02 tf saturation: frequency tf=2 in doc 2, tf=1 in doc 3") {
    val hits = ref.search("frequency", 10)
    assert(hits.map(_._1) == Seq(2L, 3L))
    assert(hits(0)._2 > hits(1)._2)
  }

  test("q03 empty result") {
    assert(ref.search("banana", 10).isEmpty)
  }

  test("q04 query-side stop removal: 'the search' == 'search'") {
    assert(ref.search("the search", 10) == ref.search("search", 10))
  }

  test("q05 implicit AND: only doc 0 has both search and engine") {
    val hits = ref.search("search engine", 10)
    assert(hits.map(_._1) == Seq(0L))
    // AND score = sum of children
    val s = ref.search("search", 10).find(_._1 == 0L).get._2
    val e = ref.search("engine", 10).find(_._1 == 0L).get._2
    assert(math.abs(hits.head._2 - (s + e)) < 1e-9)
  }

  test("q07 OR with empty branch == the non-empty branch") {
    assert(ref.search("search OR banana", 10) == ref.search("search", 10))
  }

  test("q09 phrase adjacency: doc 0 only") {
    assert(ref.search("\"search engine\"", 10).map(_._1) == Seq(0L))
  }

  test("q10/q11 phrases") {
    assert(ref.search("\"information retrieval\"", 10).map(_._1) == Seq(0L))
    assert(ref.search("\"search results\"", 10).map(_._1) == Seq(1L))
  }

  test("q12 phrase across removed stopwords does NOT match adjacently") {
    // doc 0: engine(2) is(3) an(4) information(5): required gap is 2, actual 3
    assert(ref.search("\"engine is information\"", 10).isEmpty)
  }

  test("q13 boolean over phrase") {
    val hits = ref.search("score AND \"term frequency\"", 10)
    assert(hits.map(_._1) == Seq(2L)) // doc 2: score + "term frequency" adjacent
  }

  test("NOT semantics") {
    val hits = ref.search("search NOT engine", 10)
    assert(hits.map(_._1).toSet == Set(1L, 3L, 4L)) // doc 0 excluded
  }

  test("repeated-term phrase counts occurrences") {
    val ref2 = new RefModel(Seq(0L -> "go go go stop", 1L -> "go stop go"))
    val q = QueryParser.parse("\"go go\"")
    assert(ref2.scoreDoc(q, 0L).isDefined)
    assert(ref2.scoreDoc(q, 1L).isEmpty)
  }
}
