package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzer
import graft.search._

class AnalyzerSpec extends AnyFunSuite with PropSupport {

  test("scanner tokenizer == pinned regex tokenizer (exact, incl. dots/unicode)") {
    import org.scalacheck.Gen
    val tricky = Seq("a..b", "a.b.c.", ".x.y", "_", "a_b.c", "A.B..C_d",
      "..", "x.", ".x", "héllo wörld", "a\tb.c\nd", "7.5 1..2 w0001.txt")
    tricky.foreach { s =>
      assert(Analyzer.tokenize(s) == Analyzer.tokenizeRegex(s), s"on '$s'")
    }
    val genChar = Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const('.'), 2 -> Gen.const(' '),
      1 -> Gen.const('_'), 1 -> Gen.oneOf('!', '-', '/', 'é', 'ß', '\n'))
    val genText = Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, genChar).map(_.mkString))
    forSamples(genText, 400) { s =>
      assert(Analyzer.tokenize(s) == Analyzer.tokenizeRegex(s), s"on '$s'")
    }
  }

  test("regex tokenize + lowercase + stop filter, raw positions preserved") {
    val toks = Analyzer.tokenize("A search engine is an information retrieval system")
    // raw stream: a(0) search(1) engine(2) is(3) an(4) information(5) retrieval(6) system(7)
    assert(toks.map(t => (t.term, t.pos)).toList == List(
      ("search", 1), ("engine", 2), ("information", 5), ("retrieval", 6), ("system", 7)))
  }

  test("min-size filter drops single-char tokens") {
    val toks = Analyzer.tokenize("x yz q w2")
    assert(toks.map(_.term).toList == List("yz", "w2"))
  }

  test("dotted compound stays one token (whoosh default pattern)") {
    val toks = Analyzer.tokenize("calls foo.bar.baz method")
    assert(toks.map(_.term).toList == List("calls", "foo.bar.baz", "method"))
  }

  test("analyze: tf, sorted positions, post-filter field length") {
    val a = Analyzer.analyze("the cat and the cat sat on a cat")
    // raw: the(0) cat(1) and(2) the(3) cat(4) sat(5) on(6) a(7) cat(8)
    assert(a.fieldLen == 4) // cat x3 + sat
    val m = a.terms.toMap
    assert(m("cat").toList == List(1, 4, 8))
    assert(m("sat").toList == List(5))
    assert(a.terms.map(_._1).toList == List("cat", "sat")) // term-sorted
  }

  test("pinned stop words") {
    assert(Analyzer.StopWords.size == 34)
    assert(Analyzer.StopWords("the") && Analyzer.StopWords("tab") && Analyzer.StopWords("yet"))
    assert(!Analyzer.StopWords("search"))
  }

  test("parser: fixture query shapes") {
    assert(QueryParser.parse("search") == QTerm("search"))
    assert(QueryParser.parse("the search") == QTerm("search")) // q04 == q01
    assert(QueryParser.parse("search engine") == QAnd(List(QTerm("search"), QTerm("engine"))))
    assert(QueryParser.parse("term AND frequency") == QAnd(List(QTerm("term"), QTerm("frequency"))))
    assert(QueryParser.parse("search OR banana") == QOr(List(QTerm("search"), QTerm("banana"))))
    assert(QueryParser.parse("postings OR engine OR ranking") ==
      QOr(List(QTerm("postings"), QTerm("engine"), QTerm("ranking"))))
    assert(QueryParser.parse("\"search engine\"") ==
      QPhrase(List(("search", 0), ("engine", 1))))
    // q12: stopword gap preserved, offsets rebased to first surviving term
    assert(QueryParser.parse("\"engine is information\"") ==
      QPhrase(List(("engine", 0), ("information", 2))))
    assert(QueryParser.parse("score AND \"term frequency\"") ==
      QAnd(List(QTerm("score"), QPhrase(List(("term", 0), ("frequency", 1))))))
    assert(QueryParser.parse("search NOT engine") == QNot(QTerm("search"), QTerm("engine")))
    assert(QueryParser.parse("search ANDNOT engine") == QNot(QTerm("search"), QTerm("engine")))
    assert(QueryParser.parse("search ANDMAYBE engine") ==
      QAndMaybe(QTerm("search"), QTerm("engine")))
    assert(QueryParser.parse("search REQUIRE engine") ==
      QRequire(QTerm("search"), QTerm("engine")))
    assert(QueryParser.parse("search REQUIRE engine ANDMAYBE fast NOT slow") ==
      QNot(QAndMaybe(QRequire(QTerm("search"), QTerm("engine")), QTerm("fast")),
        QTerm("slow")))
    // group-leading NOT: operand is a NEGATIVE clause, never a positive one;
    // with no positive clause the group is empty (no match-all to subtract from)
    // top-level pure negation subtracts from the match-all (Whoosh Every)
    assert(QueryParser.parse("NOT search") == QNot(QEvery(), QTerm("search")))
    assert(QueryParser.parse("*") == QEvery())
    assert(QueryParser.parse("*^2") == QEvery(2.0))
    assert(QueryParser.parse("* NOT search") == QNot(QEvery(), QTerm("search")))
    assert(QueryParser.parse("path:*") == QEvery(1.0, "path")) // field-scoped
    assert(QueryParser.parse("path:*^2") == QEvery(2.0, "path"))
    assert(QueryParser.parse("alpha OR NOT search") == QTerm("alpha"))
    assert(QueryParser.parse("NOT search engine") == QNot(QTerm("engine"), QTerm("search")))
    // parenthesized pure-negative folds into the enclosing AND group
    assert(QueryParser.parse("alpha AND (NOT search)") == QNot(QTerm("alpha"), QTerm("search")))
    assert(QueryParser.parse("alpha (NOT search NOT engine)") ==
      QNot(QTerm("alpha"), QOr(List(QTerm("search"), QTerm("engine")))))
    assert(QueryParser.parse("(search OR engine) AND fast") ==
      QAnd(List(QOr(List(QTerm("search"), QTerm("engine"))), QTerm("fast"))))
    // field qualifiers + boosts (Whoosh parser surface)
    assert(QueryParser.parse("path:term") == QTerm("term", "path"))
    assert(QueryParser.parse("search^2") == QTerm("search", "content", 2.0))
    assert(QueryParser.parse("path:term^2.5") == QTerm("term", "path", 2.5))
    assert(QueryParser.parse("path:\"search engine\"") ==
      QPhrase(List(("search", 0), ("engine", 1)), "path"))
    assert(QueryParser.parse("\"search engine\"^3") ==
      QPhrase(List(("search", 0), ("engine", 1)), "content", 3.0))
    assert(QueryParser.parse("path:\"search engine\"^3") ==
      QPhrase(List(("search", 0), ("engine", 1)), "path", 3.0))
    assert(QueryParser.parse("\"search engine\"~2") ==
      QPhrase(List(("search", 0), ("engine", 1)), slop = 2))
    assert(QueryParser.parse("\"search engine\"~2^3") ==
      QPhrase(List(("search", 0), ("engine", 1)), boost = 3.0, slop = 2))
    assert(QueryParser.parse("path:\"search engine\"~4") ==
      QPhrase(List(("search", 0), ("engine", 1)), "path", slop = 4))
    assert(QueryParser.parse("\"search engine\"~0") ==
      QPhrase(List(("search", 0), ("engine", 1)))) // degenerate slop -> default
    // garbage around the new forms degrades, never crashes
    assert(QueryParser.parse("\"search engine\"~") ==
      QPhrase(List(("search", 0), ("engine", 1)))) // dangling tilde drops
    assert(QueryParser.parse("\"search engine\"~x^y") ==
      QPhrase(List(("search", 0), ("engine", 1)))) // malformed mods drop
    assert(QueryParser.parse("size:[10 TO") ==
      QRange("10", null, "size", 1.0, true, false)) // unclosed: open-ended range (r4)
    assert(QueryParser.parse("[ TO ]") == QEmpty)
    assert(QueryParser.parse("~3") == QEmpty)
    assert(QueryParser.parse("*:*") == QEmpty
      || QueryParser.parse("*:*").isInstanceOf[QWildcard]) // no crash
    assert(QueryParser.parse("path:sea*^2") == QPrefix("sea", "path", 2.0))
    assert(QueryParser.parse("title:saerch~2") == QFuzzy("saerch", 2, "title"))
    assert(QueryParser.parse("path:") == QEmpty) // dangling qualifier
    assert(QueryParser.parse("search^x") == QTerm("search^x".toLowerCase)
      || QueryParser.parse("search^x") == QTerm("search")
      || QueryParser.parse("search^x") == QPhrase(List(("search", 0), ("x", 1)))) // malformed boost degrades, never crashes
    assert(QueryParser.parse("sea*") == QPrefix("sea"))
    assert(QueryParser.parse("s?arch") == QWildcard("s?arch"))
    assert(QueryParser.parse("se*ch*") == QWildcard("se*ch*"))
    assert(QueryParser.parse("saerch~") == QFuzzy("saerch", 1))
    assert(QueryParser.parse("saerch~2") == QFuzzy("saerch", 2))
    assert(QueryParser.parse("[apple TO cherry]") == QRange("apple", "cherry"))
    // round-4 range surface: exclusive/mixed brackets, open ends, GtLt
    assert(QueryParser.parse("{aa TO cc}") ==
      QRange("aa", "cc", minIncl = false, maxIncl = false))
    assert(QueryParser.parse("[aa TO cc}") ==
      QRange("aa", "cc", maxIncl = false))
    assert(QueryParser.parse("{aa TO cc]") ==
      QRange("aa", "cc", minIncl = false))
    assert(QueryParser.parse("[aa TO]") == QRange("aa", null))
    assert(QueryParser.parse("[TO cc]") == QRange(null, "cc"))
    assert(QueryParser.parse("size:>=5") == QRange("5", null, "size"))
    assert(QueryParser.parse("size:>5") ==
      QRange("5", null, "size", 1.0, false, true))
    assert(QueryParser.parse("<=zz") == QRange(null, "zz"))
    assert(QueryParser.parse("<zz") == QRange(null, "zz", Q.DefaultField, 1.0, true, false))
    assert(QueryParser.parse(">") == QEmpty)
    // range matches(): bound semantics
    assert(QRange("b", "d", minIncl = false).matches("c"))
    assert(!QRange("b", "d", minIncl = false).matches("b"))
    assert(QRange("b", null).matches("zzz"))
    assert(!QRange(null, "d", maxIncl = false).matches("d"))
    assert(QueryParser.parse("[aa TO cc] AND search") ==
      QAnd(List(QRange("aa", "cc"), QTerm("search"))))
    assert(QueryParser.parse("SEA* AND fast") == QAnd(List(QPrefix("sea"), QTerm("fast"))))
    assert(QueryParser.parse("the a of") == QEmpty)
    assert(QueryParser.parse("") == QEmpty)
    // phrase whose leading token is a stopword: rebase to first survivor
    assert(QueryParser.parse("\"the search results\"") ==
      QPhrase(List(("search", 0), ("results", 1))))
  }

  test("span parser forms (D15): NEAR/ONEAR, OR coercion, graceful degrade") {
    assert(QueryParser.parse("alpha NEAR beta") ==
      QSpanNear(List(QTerm("alpha"), QTerm("beta")), 1, ordered = false))
    assert(QueryParser.parse("alpha NEAR/3 beta") ==
      QSpanNear(List(QTerm("alpha"), QTerm("beta")), 3, ordered = false))
    assert(QueryParser.parse("alpha ONEAR/2 beta") ==
      QSpanNear(List(QTerm("alpha"), QTerm("beta")), 2, ordered = true))
    // left-associative chain nests
    assert(QueryParser.parse("alpha NEAR/2 beta NEAR/2 gamma") ==
      QSpanNear(List(
        QSpanNear(List(QTerm("alpha"), QTerm("beta")), 2, ordered = false),
        QTerm("gamma")), 2, ordered = false))
    // a parenthesized OR of terms coerces to SpanOr
    assert(QueryParser.parse("alpha ONEAR/2 (beta OR gamma)") ==
      QSpanNear(List(QTerm("alpha"),
        QSpanOr(List(QTerm("beta"), QTerm("gamma")))), 2, ordered = true))
    // proximity binds tighter than AND
    assert(QueryParser.parse("alpha NEAR beta AND gamma") ==
      QAnd(List(
        QSpanNear(List(QTerm("alpha"), QTerm("beta")), 1, ordered = false),
        QTerm("gamma"))))
    // field-qualified leaves keep their field
    assert(QueryParser.parse("path:alpha ONEAR/4 path:beta") ==
      QSpanNear(List(QTerm("alpha", "path"), QTerm("beta", "path")), 4,
        ordered = true))
    // degrade, never crash: missing operands, non-span-capable sides
    assert(QueryParser.parse("NEAR alpha") == QTerm("alpha")
      || QueryParser.parse("NEAR alpha") == QEmpty)
    assert(QueryParser.parse("alpha NEAR") == QEmpty)
    assert(QueryParser.parse("NEAR") == QEmpty)
    // a single-surviving-token phrase IS a term -> span-capable; a real
    // multi-term phrase is not (positions pattern != span) -> degrades
    assert(QueryParser.parse("\"a phrase\" NEAR alpha") ==
      QSpanNear(List(QTerm("phrase"), QTerm("alpha")), 1, ordered = false))
    assert(QueryParser.parse("\"table scan\" NEAR alpha") == QEmpty)
    assert(QueryParser.parse("(alpha AND beta) NEAR gamma") == QEmpty)
    assert(QueryParser.parse("NEAR/0 NEAR/0") == QEmpty)
  }
}
