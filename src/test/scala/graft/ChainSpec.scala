package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.analysis._

/** Analyzer registry (SURVEY.md §2.2 "Other analyzers"): chain compilation,
  * the pinned-standard equivalence, Porter stemming vectors, n-gram and
  * fold semantics, spec round-trip, and an end-to-end non-standard-chain
  * index vs a chain-parameterized RefModel. */
class ChainSpec extends AnyFunSuite with PropSupport {

  test("Chain(Standard) == Analyzer.analyze/tokenize (pinned core equivalence)") {
    val genChar = Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const('.'), 2 -> Gen.const(' '),
      1 -> Gen.const('_'), 1 -> Gen.oneOf('!', '-', 'é', '\n'))
    val genText = Gen.chooseNum(0, 150).flatMap(n => Gen.listOfN(n, genChar).map(_.mkString))
    forSamples(genText, 300) { s =>
      assert(Chain.Standard.tokenize(s) == Analyzer.tokenize(s), s"tokenize '$s'")
      val a = Chain.Standard.analyze(s)
      val b = Analyzer.analyze(s)
      assert(a.fieldLen == b.fieldLen && a.terms.map(_._1).toSeq == b.terms.map(_._1).toSeq &&
        a.terms.map(_._2.toSeq).toSeq == b.terms.map(_._2.toSeq).toSeq, s"analyze '$s'")
    }
  }

  test("Porter stemmer: classic vectors from the 1980 paper") {
    val vectors = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "failing" -> "fail", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
      "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "formaliti" -> "formal", "sensitiviti" -> "sensit",
      "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
      "electriciti" -> "electr", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens", "irritant" -> "irrit",
      "replacement" -> "replac", "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "communism" -> "commun", "activate" -> "activ",
      "effective" -> "effect", "bowdlerize" -> "bowdler",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    vectors.foreach { case (in, want) =>
      assert(Porter.stem(in) == want, s"stem($in) = ${Porter.stem(in)}, want $want")
    }
    // non-letters pass through
    assert(Porter.stem("w0001") == "w0001")
    assert(Porter.stem("a.b") == "a.b")
  }

  test("chain semantics: whitespace tok, ngram tok/filter, fold, positions") {
    val ws = new Chain(AnalyzerSpec(WhitespaceTok, List(LowerF)))
    assert(ws.tokenize("Foo  bar-baz\tQux").map(t => (t.term, t.pos)).toList ==
      List(("foo", 0), ("bar-baz", 1), ("qux", 2)))

    val ng = new Chain(AnalyzerSpec(NgramTok(3, 3), List(LowerF)))
    assert(ng.tokenize("ABCD").map(t => (t.term, t.pos)).toList ==
      List(("abc", 0), ("bcd", 1)))
    val ng23 = new Chain(AnalyzerSpec(NgramTok(2, 3), Nil))
    assert(ng23.tokenize("abc").map(t => (t.term, t.pos)).toList ==
      List(("ab", 0), ("abc", 1), ("bc", 2)))

    // ngram FILTER: grams inherit the source token's position
    val ngf = new Chain(AnalyzerSpec(WhitespaceTok, List(LowerF, NgramF(2, 2))))
    assert(ngf.tokenize("ab cde").map(t => (t.term, t.pos)).toList ==
      List(("ab", 0), ("cd", 1), ("de", 1)))

    val fold = new Chain(AnalyzerSpec(WhitespaceTok, List(LowerF, AccentFoldF)))
    assert(fold.tokenize("Café Über naïve").map(_.term).toList ==
      List("cafe", "uber", "naive"))

    val stem = new Chain(AnalyzerSpec(StandardTok, List(LowerF, StopF(2), PorterStemF)))
    assert(stem.tokenize("the motoring caresses").map(t => (t.term, t.pos)).toList ==
      List(("motor", 1), ("caress", 2))) // stop leaves the position gap
  }

  test("spec string round-trip") {
    val specs = Seq(
      AnalyzerSpec.Standard,
      AnalyzerSpec(WhitespaceTok, List(LowerF, AccentFoldF, PorterStemF)),
      AnalyzerSpec(NgramTok(2, 4), List(LowerF)),
      AnalyzerSpec(StandardTok, List(LowerF, StopF(3), NgramF(3, 3))))
    specs.foreach(s => assert(AnalyzerSpec.fromString(s.asString) == s, s.asString))
  }

  test("end-to-end: stem-chain index rank-identical to chain-parameterized RefModel") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val spec = AnalyzerSpec(StandardTok, List(LowerF, StopF(2), PorterStemF))
    val chain = new Chain(spec)
    val rows = (0 until 80).map { i =>
      graft.model.CorpusRow("r0", f"f$i%04d.txt", f"$i%040x", "text",
        graft.corpus.SynthCorpus.doc(29L, i.toLong) +
          (if (i % 3 == 0) " motoring hopeful" else " motored hopefulness"))
    }
    val dir = SparkTestBase.tmpDir("chain")
    graft.build.IndexBuilder.build(spark, spark.createDataset(rows), dir,
      graft.build.IndexBuilder.IndexConfig(segSize = 32, analyzer = spec))
    val handle = graft.search.Searcher.open(spark, dir)
    assert(handle.chain.spec == spec) // persisted + reopened
    val ref = new graft.ref.RefModel(
      rows.sortBy(r => (r.repo, r.path, r.commit)).zipWithIndex
        .map { case (r, i) => (i.toLong, r.content) },
      chain.analyze)
    // "motors" stems to "motor" on the query side too: matches BOTH
    // surface forms motoring/motored; same for hope(fulness)
    Seq("motors", "hoped OR w0001", "\"motoring hopeful\"", "w0002 AND hopefully")
      .foreach { qs =>
        val hits = graft.search.Searcher.search(spark, handle, qs, 10).collect().toSeq
        val oracle = ref.search(
          graft.search.QueryParser.parse(qs, chainOf = _ => chain), 10)
        assert(hits.map(_.docId) == oracle.map(_._1), s"[$qs] $hits vs $oracle")
        hits.zip(oracle).foreach { case (h, (_, s)) =>
          assert(math.abs(h.score - s) <= 1e-6, s"[$qs] ${h.score} vs $s")
        }
        assert(hits.nonEmpty || oracle.isEmpty, s"[$qs] expected hits")
      }
    // the hot stem query actually matches all docs (both surface forms)
    assert(graft.search.Searcher.search(spark, handle, "motors", 100).count() == 80)
  }

  test("path/comma tokenizers and shingle filter semantics") {
    val path = new Chain(AnalyzerSpec(PathTok, Nil))
    assert(path.tokenize("a/b/c.txt").toList.map(t => (t.term, t.pos)) ==
      List(("a", 0), ("a/b", 1), ("a/b/c.txt", 2)))
    assert(path.tokenize("/usr/local/bin/").toList.map(t => (t.term, t.pos)) ==
      List(("/usr", 0), ("/usr/local", 1), ("/usr/local/bin", 2)))
    assert(path.tokenize("plain").toList.map(t => (t.term, t.pos)) ==
      List(("plain", 0)))
    assert(path.tokenize("").isEmpty)

    val comma = new Chain(AnalyzerSpec(CommaTok, List(LowerF)))
    assert(comma.tokenize("Alpha, beta ,, GAMMA ").toList.map(t => (t.term, t.pos)) ==
      List(("alpha", 0), ("beta", 1), ("gamma", 2)))

    val sh = new Chain(AnalyzerSpec(StandardTok, List(LowerF, ShingleF(2))))
    assert(sh.tokenize("One two three").toList.map(t => (t.term, t.pos)) ==
      List(("one two", 0), ("two three", 1)))
    assert(sh.tokenize("one").isEmpty) // shorter than the shingle size

    // keyword: the whole value, verbatim
    val kw = new Chain(AnalyzerSpec(KeywordTok, Nil))
    assert(kw.tokenize("Exact Value-7").toList.map(t => (t.term, t.pos)) ==
      List(("Exact Value-7", 0)))
    assert(kw.tokenize("").isEmpty)

    // spec strings round-trip for the new registry entries
    Seq(AnalyzerSpec(PathTok, Nil), AnalyzerSpec(CommaTok, List(LowerF)),
      AnalyzerSpec(KeywordTok, Nil),
      AnalyzerSpec(StandardTok, List(LowerF, StopF(), ShingleF(3)))).foreach { s =>
      assert(AnalyzerSpec.fromString(s.asString) == s, s.asString)
    }
  }

  test("intraword/substitution/reverse filters") {
    val iw = new Chain(AnalyzerSpec(WhitespaceTok, List(IntraWordF, LowerF)))
    assert(iw.tokenize("PowerShot500 ABCWord wi-fi").toList.map(t => (t.term, t.pos)) ==
      List(("power", 0), ("shot", 0), ("500", 0),
           ("abc", 1), ("word", 1),
           ("wi", 2), ("fi", 2)))
    assert(iw.tokenize("plain x9").toList.map(t => (t.term, t.pos)) ==
      List(("plain", 0), ("x", 1), ("9", 1)))

    val sub = new Chain(AnalyzerSpec(WhitespaceTok,
      List(LowerF, SubstitutionF("[0-9]+", "#"))))
    assert(sub.tokenize("abc123def 42").toList.map(_.term) == List("abc#def", "#"))
    // substitution to empty drops the token
    val sub2 = new Chain(AnalyzerSpec(WhitespaceTok,
      List(SubstitutionF("^x+$", ""))))
    assert(sub2.tokenize("xxx keep").toList.map(_.term) == List("keep"))

    val rev = new Chain(AnalyzerSpec(WhitespaceTok, List(LowerF, ReverseF)))
    assert(rev.tokenize("Search engine").toList.map(_.term) ==
      List("hcraes", "enigne"))

    // spec round-trip incl. URL-encoded substitution args (regex chars)
    Seq(
      AnalyzerSpec(WhitespaceTok, List(IntraWordF, LowerF)),
      AnalyzerSpec(StandardTok, List(SubstitutionF("[0-9]+(\\.[0-9]+)?", "#"), ReverseF)),
      AnalyzerSpec(WhitespaceTok, List(SubstitutionF("a,b|c", "(x)")))
    ).foreach { s =>
      assert(AnalyzerSpec.fromString(s.asString) == s, s.asString)
    }
  }
}
