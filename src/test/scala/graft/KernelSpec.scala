package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.ref.RefModel
import graft.search._

/** Rank-identity of the kernel (codec + matchers + WAND) against the
  * brute-force oracle, on the fixture corpus and on random corpora
  * (SURVEY.md §5.2 items 1-2). */
class KernelSpec extends AnyFunSuite with PropSupport {

  private def assertRankIdentical(hits: Seq[Kernel.Hit], oracle: Seq[(Long, Double)],
                                  ctx: String): Unit = {
    assert(hits.map(_.docId) == oracle.map(_._1), s"docId ranks differ [$ctx]:\n engine=$hits\n oracle=$oracle")
    hits.zip(oracle).foreach { case (h, (d, s)) =>
      assert(math.abs(h.score - s) <= 1e-6, s"score mismatch at doc $d [$ctx]: ${h.score} vs $s")
    }
  }

  test("fixture query set: kernel == oracle, with and without pruning") {
    val (lists, stats) = TestFixtures.memSegment(TestFixtures.fixture5)
    val ref = new RefModel(TestFixtures.fixture5)
    TestFixtures.querySet.foreach { case (qid, qs) =>
      val q = QueryParser.parse(qs)
      val oracle = ref.search(q, 10)
      assertRankIdentical(Kernel.topK(q, lists, stats, 10, prune = true).toSeq, oracle, s"$qid wand")
      assertRankIdentical(Kernel.topK(q, lists, stats, 10, prune = false).toSeq, oracle, s"$qid exhaustive")
    }
  }

  // random corpora over a small vocabulary (dense overlaps, many ties)
  private val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh",
    "the", "of", "in") // includes stopwords
  private val genDoc: Gen[String] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val genCorpus: Gen[Seq[(Long, String)]] =
    Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, genDoc).map(_.zipWithIndex.map {
      case (d, i) => (i.toLong, d)
    }))
  private val genQuery: Gen[String] = {
    val w = Gen.oneOf(vocab.filterNot(Set("the", "of", "in")))
    Gen.oneOf(
      w,
      for (a <- w; b <- w) yield s"$a $b",
      for (a <- w; b <- w) yield s"$a OR $b",
      for (a <- w; b <- w; c <- w) yield s"$a OR $b OR $c",
      for (a <- w; b <- w) yield "\"" + a + " " + b + "\"",
      for (a <- w; b <- w) yield s"$a NOT $b",
      for (a <- w; b <- w; c <- w) yield s"($a OR $b) AND $c",
      for (a <- w; b <- w) yield s"$a ANDMAYBE $b",
      for (a <- w; b <- w; c <- w) yield s"$a ANDMAYBE ($b OR $c)",
      for (a <- w; b <- w) yield s"$a REQUIRE $b",
      for (a <- w; b <- w; c <- w) yield s"($a OR $b) REQUIRE $c ANDMAYBE $a",
      for (a <- w; b <- w) yield s"$a^2 OR $b",
      for (a <- w; b <- w) yield "\"" + a + " " + b + "\"^3 OR " + a,
      for (a <- w; b <- w) yield "\"" + a + " " + b + "\"~3",
      for (a <- w; b <- w; c <- w) yield "\"" + a + " " + b + " " + c + "\"~2 OR " + a,
      Gen.const("*"),
      w.map(a => s"NOT $a"),
      w.map(a => s"* NOT $a"),
      for (a <- w; b <- w) yield s"* AND $a NOT $b",
      for (a <- w; b <- w) yield s"*^2 ANDMAYBE $a OR $b"
    )
  }

  test("random corpora: WAND == exhaustive == oracle (rank + score + ties)") {
    forSamples(genCorpus, genQuery, Gen.oneOf(1, 3, 10, 100)) { (docs, qs, k) =>
      val (lists, stats) = TestFixtures.memSegment(docs)
      val ref = new RefModel(docs)
      val q = QueryParser.parse(qs)
      val oracle = ref.search(q, k)
      assertRankIdentical(Kernel.topK(q, lists, stats, k, prune = true).toSeq, oracle, s"'$qs' k=$k wand")
      assertRankIdentical(Kernel.topK(q, lists, stats, k, prune = false).toSeq, oracle, s"'$qs' k=$k exh")
    }
  }

  test("pluggable weighting: TF_IDF, Frequency, FunctionWeighting rank-identical to oracle") {
    forSamples(genCorpus, genQuery) { (docs, qs) =>
      Seq(TfIdfWeighting, FrequencyWeighting, FunctionWeighting.LogTf).foreach { w =>
        val (lists, stats) = TestFixtures.memSegment(docs)
        val ref = new RefModel(docs, w = w)
        val q = QueryParser.parse(qs)
        val oracle = ref.search(q, 10)
        assertRankIdentical(Kernel.topK(q, lists, stats, 10, prune = true, w = w).toSeq,
          oracle, s"'$qs' $w wand")
        assertRankIdentical(Kernel.topK(q, lists, stats, 10, prune = false, w = w).toSeq,
          oracle, s"'$qs' $w exh")
      }
    }
  }

  test("sloppy phrase: ordered window semantics (D8)") {
    val docs = Seq(
      0L -> "alpha beta gamma",
      1L -> "alpha xx beta",
      2L -> "alpha xx yy beta",
      3L -> "beta alpha",
      4L -> "alpha xx yy zz beta")
    val (lists, stats) = TestFixtures.memSegment(docs)
    def ids(qs: String): Set[Long] =
      Kernel.topK(QueryParser.parse(qs), lists, stats, 10).map(_.docId).toSet
    assert(ids("\"alpha beta\"") == Set(0L))
    assert(ids("\"alpha beta\"~2") == Set(0L, 1L))
    assert(ids("\"alpha beta\"~3") == Set(0L, 1L, 2L))
    assert(ids("\"alpha beta\"~4") == Set(0L, 1L, 2L, 4L))
    // in-order requirement: reversed doc never matches at any slop
    assert(!ids("\"alpha beta\"~4").contains(3L))
  }

  test("multi-segment split: union of per-segment topk re-ranked == oracle") {
    forSamples(genCorpus, genQuery) { (docs, qs) =>
      val k = 10
      val ref = new RefModel(docs)
      val q = QueryParser.parse(qs)
      val oracle = ref.search(q, k)
      // split into 3 docId-range segments, but keep GLOBAL stats (df, N)
      val segs = docs.grouped(math.max(1, docs.size / 3 + 1)).toSeq
      val (_, globalStats) = TestFixtures.memSegment(docs)
      val globalDf = docs.flatMap { case (_, c) =>
        graft.analysis.Analyzer.analyze(c).terms.map(_._1).distinct.map(t => t)
      }.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val hits = segs.flatMap { seg =>
        val (lists0, _) = TestFixtures.memSegment(seg)
        val lists = lists0.map { case (t, tl) =>
          t -> tl.copy(globalDf = globalDf.getOrElse(t, tl.globalDf)) // pseudo EveryTerm keeps its own
        }
        Kernel.topK(q, lists, globalStats, k).toSeq
      }.sortBy(h => (-h.score, h.docId)).take(k)
      assertRankIdentical(hits, oracle, s"'$qs' multiseg")
    }
  }
}
