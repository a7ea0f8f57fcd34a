package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.build.IndexBuilder
import graft.build.IndexBuilder.IndexConfig
import graft.model.CorpusRow
import graft.ref.RefModel
import graft.search.{Highlight, KeyTerms, QAnd, QOr, QPhrase, QTerm, Q, QueryParser, Searcher}

/** Key terms (Bo1, D11), more-like-this, highlighting (D12), facets and
  * sorted search — the round-3 classify/highlight surface. */
class ClassifySpec extends AnyFunSuite with PropSupport {

  private lazy val spark = SparkTestBase.spark

  // ---- pure Bo1 ----

  test("bo1: monotone increasing in wt, decreasing in cf, positive") {
    forSamples(Gen.choose(1, 50), Gen.choose(1L, 1000L), Gen.choose(1001L, 100000L)) {
      (wt, cf, n) =>
        val s = KeyTerms.bo1(wt.toDouble, cf, n)
        assert(s > 0.0)
        assert(KeyTerms.bo1(wt + 1.0, cf, n) > s)
        assert(KeyTerms.bo1(wt.toDouble, cf + 1, n) < s)
    }
  }

  // ---- highlight kernel vs a brute-force model ----

  /** obviously-correct reference: enumerate match positions, merge windows
    * by interval overlap/adjacency, score = matches, rank, render */
  private def refFragments(content: String, terms: Set[String], surround: Int,
                           maxFrags: Int): Seq[Highlight.Fragment] = {
    val m = graft.analysis.Analyzer.TokenPattern.matcher(content)
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) toks += m.group()
    def isMatch(i: Int) = terms.contains(toks(i).toLowerCase(java.util.Locale.ROOT))
    val ms = toks.indices.filter(isMatch)
    if (ms.isEmpty) return Seq.empty
    // merge by island rule: consecutive matches <= 2*surround apart share
    val groups = ms.foldLeft(List.empty[List[Int]]) {
      case (Nil, p) => List(List(p))
      case (cur :: rest, p) =>
        if (p - cur.head <= 2 * surround) (p :: cur) :: rest
        else List(p) :: (cur :: rest)
    }.map(_.reverse).reverse
    groups.map { g =>
      val s = math.max(0, g.head - surround)
      val e = math.min(toks.length - 1, g.last + surround)
      val text = (s to e).map(i => if (isMatch(i)) s"<b>${toks(i)}</b>" else toks(i))
        .mkString(" ")
      Highlight.Fragment(s, e, g.size, text)
    }.sortBy(f => (-f.matches, f.startPos)).take(maxFrags)
  }

  private val tokGen: Gen[String] =
    Gen.frequency(5 -> Gen.const("aa"), 3 -> Gen.const("bb"),
      2 -> Gen.const("Aa"), 4 -> Gen.oneOf("xx", "yy", "zz", "qq"))

  test("highlight fragments == brute-force window model (random streams)") {
    forSamples(Gen.listOf(tokGen), Gen.choose(0, 4), Gen.choose(1, 3)) {
      (toks, surround, maxFrags) =>
        val content = toks.mkString(" ")
        val terms = Set("aa", "bb")
        val got = Highlight.fragments(content, terms, surround, maxFrags)
        assert(got == refFragments(content, terms, surround, maxFrags))
    }
  }

  test("highlight: fragment invariants") {
    forSamples(Gen.listOf(tokGen)) { toks =>
      val content = toks.mkString(" ")
      val frags = Highlight.fragments(content, Set("aa"), surround = 2,
        maxFrags = Int.MaxValue >> 1)
      // every match position is in exactly one fragment; fragments disjoint
      val total = toks.count(_.toLowerCase == "aa")
      assert(frags.map(_.matches).sum == total)
      val spans = frags.map(f => (f.startPos, f.endPos)).sortBy(_._1)
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 < s2)
        case _ =>
      }
      // render strips back to the window's raw tokens
      frags.foreach { f =>
        val stripped = f.text.replace("<b>", "").replace("</b>", "").split(" ").toSeq
        assert(stripped == toks.slice(f.startPos, f.endPos + 1))
      }
    }
  }

  test("fragmenter variants: sentence / whole / order / formatter (round-5)") {
    import Highlight._
    val terms = Set("aa", "bb")
    def bold(ts: Seq[String]): String =
      ts.map(t => if (terms.contains(t.toLowerCase(java.util.Locale.ROOT)))
        s"<b>$t</b>" else t).mkString(" ")
    forSamples(Gen.listOf(Gen.nonEmptyListOf(tokGen)), Gen.choose(1, 3)) {
      (sents0, maxFrags) =>
        val sents = sents0.take(6)
        val content = sents.map(_.mkString(" ")).mkString(". ") +
          (if (sents.nonEmpty) "." else "")
        // brute-force sentence model: cumulative token offsets, per-sentence
        // match counts, pinned render
        var off = 0
        val expAll = sents.flatMap { s =>
          val st = off
          off += s.size
          val m = s.count(t => terms.contains(t.toLowerCase(java.util.Locale.ROOT)))
          if (m == 0) None
          else Some(Fragment(st, st + s.size - 1, m, bold(s)))
        }
        assert(fragmentsEx(content, terms, SentenceFragmenter, maxFrags) ==
          expAll.sortBy(f => (-f.matches, f.startPos)).take(maxFrags))
        assert(fragmentsEx(content, terms, SentenceFragmenter, maxFrags,
          OrderByPosition) == expAll.sortBy(_.startPos).take(maxFrags))
        // whole fragmenter: one fragment spanning the full token stream
        val allToks = sents.flatten
        val totalM = allToks.count(t => terms.contains(t.toLowerCase(java.util.Locale.ROOT)))
        val gotW = fragmentsEx(content, terms, WholeFragmenter, 1)
        if (totalM == 0) assert(gotW.isEmpty)
        else assert(gotW ==
          Seq(Fragment(0, allToks.size - 1, totalM, bold(allToks))))
    }
    // formatter hook: the matched token renders through the formatter
    assert(fragmentsEx("xx aa yy", Set("aa"), WholeFragmenter, 1,
      OrderByScore, UppercaseFormatter).head.text == "xx AA yy")
    // context fragmenter through the Ex surface == the pinned D12 kernel
    assert(fragmentsEx("xx aa yy zz aa", Set("aa"), ContextFragmenter(1), 2) ==
      fragments("xx aa yy zz aa", Set("aa"), 1, 2))
  }

  // ---- DisMax ----

  test("DisMax: kernel == RefModel (tiebreak 0 and 0.3), collapses like OR") {
    import graft.search.{Kernel, QDisMax}
    val (lists, stats) = TestFixtures.memSegment(TestFixtures.fixture5)
    val ref = new RefModel(TestFixtures.fixture5)
    for (tb <- Seq(0.0, 0.3)) {
      val q = QDisMax(List(QTerm("search"), QTerm("frequency"), QTerm("engine")), tb)
      val hits = Kernel.topK(q, lists, stats, 10).toSeq
      val want = ref.search(q: Q, 10)
      assert(hits.map(_.docId) == want.map(_._1), s"tiebreak $tb")
      hits.zip(want).foreach { case (h, (_, s)) =>
        assert(math.abs(h.score - s) <= 1e-9, s"tiebreak $tb")
      }
    }
    // tiebreak 1.0 degenerates to OR's sum-of-scores
    val qMax = QDisMax(List(QTerm("search"), QTerm("engine")), 1.0)
    val qOr = QOr(List(QTerm("search"), QTerm("engine")))
    val hMax = Kernel.topK(qMax, lists, stats, 10).toSeq
    val hOr = Kernel.topK(qOr, lists, stats, 10).toSeq
    assert(hMax.map(_.docId) == hOr.map(_.docId))
    hMax.zip(hOr).foreach { case (a, b) => assert(math.abs(a.score - b.score) <= 1e-9) }
  }

  // ---- end-to-end over a built index ----

  private def smallCorpus: Seq[CorpusRow] = {
    val texts = Seq(
      "spark merge join shuffle partition merge",
      "merge sort algorithm with stable merge passes and merge cost",
      "join strategies broadcast join and shuffle hash join",
      "the quick brown fox jumps over the lazy dog",
      "spark spark spark streaming watermark state",
      "partition pruning and predicate pushdown in columnar scans")
    texts.zipWithIndex.map { case (t, i) =>
      CorpusRow("r0", f"d/$i%04d.txt", f"$i%040x", "text", t)
    }
  }

  private def buildSmall(): (String, Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = SparkTestBase.tmpDir("classify")
    val rows = smallCorpus
    IndexBuilder.build(spark, spark.createDataset(rows), dir, IndexConfig(segSize = 4))
    val docs = rows.sortBy(r => (r.repo, r.path, r.commit)).zipWithIndex
      .map { case (r, i) => (i.toLong, r.content) }
    (dir, docs)
  }

  test("lexicon cf == sum of tf across docs; keyTerms paths agree") {
    import spark.implicits._
    val (dir, docs) = buildSmall()
    val handle = Searcher.open(spark, dir)

    // cf invariant vs the analyzer
    val want = scala.collection.mutable.HashMap.empty[String, Long]
    docs.foreach { case (_, c) =>
      graft.analysis.Analyzer.tokenize(c).foreach(t =>
        want.update(t.term, want.getOrElse(t.term, 0L) + 1L))
    }
    val got = handle.lexicon.select($"term", $"cf").as[(String, Long)]
      .collect().toMap
    assert(got == want.toMap)

    // forDocs on a single doc == fromText on its content (same scores);
    // the Dataset (scale-path) overload must agree with the Seq form
    val corpus = spark.createDataset(smallCorpus)
    val viaDf = KeyTerms.forDocs(spark, handle, corpus, Seq(1L), 100)
      .as[(String, Double)].collect().toSeq
    val viaDs = KeyTerms.forDocs(spark, handle, corpus,
        spark.createDataset(Seq(java.lang.Long.valueOf(1L))), 100)
      .as[(String, Double)].collect().toSeq
    assert(viaDs == viaDf)
    val viaText = KeyTerms.fromText(spark, handle, docs(1)._2, 100)
    assert(viaDf.toMap.keySet == viaText.toMap.keySet)
    viaText.foreach { case (t, s) =>
      assert(math.abs(viaDf.toMap.apply(t) - s) <= 1e-12, s"term $t")
    }
    // descending by score, tie by term
    assert(viaDf == viaDf.sortBy { case (t, s) => (-s, t) })
  }

  test("moreLikeThis: masks the source doc, rank-identical to RefModel on the expansion query") {
    import spark.implicits._
    val (dir, docs) = buildSmall()
    val handle = Searcher.open(spark, dir)
    val corpus = spark.createDataset(smallCorpus)
    val src = 1L
    val q = KeyTerms.moreLikeThisQuery(spark, handle, corpus, src, 5)
    q match {
      case QOr(cs) =>
        assert(cs.nonEmpty && cs.forall(_.isInstanceOf[QTerm]))
        // boosts are the Bo1 scores of the source doc's terms
        val kts = KeyTerms.fromText(spark, handle, docs(src.toInt)._2, 5).toMap
        cs.foreach { case QTerm(t, _, b) => assert(b == kts(t)); case _ => fail() }
      case other => fail(s"expected QOr, got $other")
    }
    val hits = KeyTerms.moreLikeThis(spark, handle, corpus, src, 5, 3).collect().toSeq
    assert(!hits.exists(_.docId == src))
    val oracle = new RefModel(docs).search(q, 4).filterNot(_._1 == src).take(3)
    assert(hits.map(_.docId) == oracle.map(_._1))
    hits.zip(oracle).foreach { case (h, (_, s)) => assert(math.abs(h.score - s) <= 1e-6) }
  }

  test("correctQuery replaces unknown terms via suggest (D13)") {
    val (dir, _) = buildSmall()
    val handle = Searcher.open(spark, dir)
    assert(Searcher.correctQuery(spark, handle, "spask AND mege") ==
      QAnd(List(QTerm("spark"), QTerm("merge"))))
    // known terms untouched; unknown with no candidate within maxDist stays
    assert(Searcher.correctQuery(spark, handle, "spark AND qqqqqqqq") ==
      QAnd(List(QTerm("spark"), QTerm("qqqqqqqq"))))
    // phrase members are corrected too
    Searcher.correctQuery(spark, handle, "\"spask mege\"") match {
      case p: QPhrase => assert(p.ts.map(_._1) == List("spark", "merge"))
      case other     => fail(s"expected QPhrase, got $other")
    }
  }

  test("facetCounts and searchSortedBy match brute force") {
    import spark.implicits._
    val (dir, docs) = buildSmall()
    val handle = Searcher.open(spark, dir)
    val matching = docs.collect {
      case (id, c) if graft.analysis.Analyzer.tokenize(c).exists(_.term == "merge") => id
    }.toSet

    val fc = Searcher.facetCounts(spark, handle, "merge", "lang")
      .as[(String, Long)].collect().toMap
    assert(fc == Map("text" -> matching.size.toLong))
    assert(fc.values.sum ==
      Searcher.matchingIds(spark, handle, "merge").count())

    val sorted = Searcher.searchSortedBy(spark, handle, "merge", "path",
      asc = false, k = 10).as[(Long, String)].collect().toSeq
    val want = matching.toSeq.map(id => (id, f"d/$id%04d.txt"))
      .sortBy { case (id, p) => (p, id) }(Ordering.Tuple2(Ordering.String.reverse, Ordering.Long))
      .take(10)
    assert(sorted == want)
  }

  // ---- deterministic sampling ----

  test("contentSplit: deterministic, duplicate texts share a split, labels partition") {
    import spark.implicits._
    val rows = ((0 until 300).map(i => (i.toLong, s"text body number ${i % 100}")))
      .toDF("doc_id", "text")
    val a = graft.ops.Sampling.contentSplit(rows, "doc_id", "text")
      .as[(Long, Int, String)].collect().toSeq.sortBy(_._1)
    val b = graft.ops.Sampling.contentSplit(rows, "doc_id", "text")
      .as[(Long, Int, String)].collect().toSeq.sortBy(_._1)
    assert(a == b) // pure function of content
    assert(a.size == 300)
    // ids i, i+100, i+200 share text -> identical bucket + split (no leakage)
    a.groupBy(_._1 % 100).values.foreach { g =>
      assert(g.map(x => (x._2, x._3)).distinct.size == 1)
    }
    a.foreach { case (_, bucket, split) =>
      assert(bucket >= 0 && bucket < 1000)
      assert(split == (if (bucket < 900) "train" else if (bucket < 950) "val" else "test"))
    }
    val sampled = graft.ops.Sampling.contentSample(rows, "text", 250).count()
    assert(sampled > 0 && sampled < 300)
  }

  // ---- connected components ----

  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  test("components == brute-force union-find on random graphs; chains converge fast") {
    import spark.implicits._
    val edgeGen = Gen.listOf(Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
      .map(_.filter(e => e._1 != e._2))
    forSamples(edgeGen, 25) { edges =>
      if (edges.nonEmpty) {
        val df = edges.toDF("id_a", "id_b")
        val got = graft.ops.Dedup.components(df)
          .as[(Long, Long)].collect().toMap
        assert(got == bruteComponents(edges))
      }
    }
    // a 60-node chain: pointer jumping must converge well under 50 rounds
    val chain = (0L until 59L).map(i => (i + 1, i))
    val got = graft.ops.Dedup.components(chain.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(got == (0L until 60L).map(_ -> 0L).toMap)
  }

  test("searchMany == per-query search; reader term stats == brute force") {
    import spark.implicits._
    val (dir, docs) = buildSmall()
    val handle = Searcher.open(spark, dir)
    val queries = Seq("q1" -> "merge", "q2" -> "merge AND join",
      "q3" -> "spark OR partition", "q4" -> "\"merge sort\"", "q5" -> "nosuchterm")
    val batch = Searcher.searchMany(spark, handle, queries, 5)
      .as[(String, Long, Double)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.sortBy(r => (-r._3, r._2))).toMap
    queries.foreach { case (qid, qs) =>
      val single = Searcher.search(spark, handle, qs, 5).collect().toSeq
      val got = batch.getOrElse(qid, Seq.empty)
      assert(got.map(_._2) == single.map(_.docId), s"$qid '$qs'")
      got.zip(single).foreach { case ((_, _, s), h) =>
        assert(math.abs(s - h.score) <= 1e-12, s"$qid")
      }
    }

    // brute-force cf / tf-idf stats from the analyzer
    val cfs = scala.collection.mutable.HashMap.empty[String, Long]
    val dfs = scala.collection.mutable.HashMap.empty[String, Long]
    docs.foreach { case (_, c) =>
      val toks = graft.analysis.Analyzer.tokenize(c)
      toks.foreach(t => cfs.update(t.term, cfs.getOrElse(t.term, 0L) + 1L))
      toks.map(_.term).distinct.foreach(t => dfs.update(t, dfs.getOrElse(t, 0L) + 1L))
    }
    val topCf = Searcher.mostFrequentTerms(spark, handle, 3)
      .as[(String, Long)].collect().toSeq
    val wantCf = cfs.toSeq.sortBy { case (t, c) => (-c, t) }.take(3)
    assert(topCf == wantCf)
    val topDistinct = Searcher.mostDistinctiveTerms(spark, handle, 3)
      .as[(String, Double)].collect().toSeq
    val n = docs.size.toDouble
    val wantD = cfs.toSeq.map { case (t, c) =>
      (t, c.toDouble * (math.log(n / (dfs(t) + 1.0)) + 1.0))
    }.sortBy { case (t, s) => (-s, t) }.take(3)
    assert(topDistinct.map(_._1) == wantD.map(_._1))
    topDistinct.zip(wantD).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) <= 1e-9)
    }
  }

  test("searchCollapsed, matchedTerms, redact == brute force") {
    import spark.implicits._
    val (dir, docs) = buildSmall()
    val handle = Searcher.open(spark, dir)

    // collapse by lang is trivial (one group); collapse by repo: all in r0,
    // so exactly ONE survivor — the best 'merge' hit overall
    val collapsed = Searcher.searchCollapsed(spark, handle, "merge", "repo", 10)
      .select($"docId", $"repo", $"score")
      .as[(Long, String, Double)].collect().toSeq
    val best = Searcher.search(spark, handle, "merge", 1).collect().head
    assert(collapsed == Seq((best.docId, "r0", best.score)))

    // scoredMatches == exhaustive search scores
    val sm = Searcher.scoredMatches(spark, handle, "merge")
      .collect().toSeq.sortBy(_.docId)
    val all = Searcher.search(spark, handle, "merge", 100)
      .collect().toSeq.sortBy(_.docId)
    assert(sm.map(_.docId) == all.map(_.docId))
    sm.zip(all).foreach { case (a, b) => assert(math.abs(a.score - b.score) <= 1e-12) }

    // matched terms vs the analyzer
    val mt = Searcher.matchedTerms(spark, handle, "merge OR join", docs.map(_._1))
      .as[(Long, String)].collect().toSet
    val want = (for {
      (id, c) <- docs
      t <- graft.analysis.Analyzer.tokenize(c).map(_.term).distinct
      if t == "merge" || t == "join"
    } yield (id, t)).toSet
    assert(mt == want)

    // redaction
    val red = graft.ops.TextQuality.redact(
      Seq((1L, "mail a.b@x.io or c@sub.example.com ip 10.1.2.3 card 12345678901 ok 123"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String)].collect().head._2
    assert(red == "mail <EMAIL> or <EMAIL> ip <IP> card <NUM> ok 123")
  }

  test("field-scoped Every in the single-field searcher (content:*)") {
    import spark.implicits._
    val rows = Seq(
      CorpusRow("r0", "a.txt", "0" * 40, "text", "spark merge join"),
      CorpusRow("r0", "b.txt", "1" * 40, "text", "a"), // analyzes to nothing
      CorpusRow("r0", "c.txt", "2" * 40, "text", "merge sort"))
    val dir = SparkTestBase.tmpDir("fse")
    IndexBuilder.build(spark, spark.createDataset(rows), dir, IndexConfig(segSize = 2))
    val handle = Searcher.open(spark, dir)
    val docs = rows.sortBy(r => (r.repo, r.path, r.commit)).zipWithIndex
      .map { case (r, i) => (i.toLong, r.content) }
    val ref = new RefModel(docs)
    for (qs <- Seq("*", "content:*", "content:* NOT merge", "path:*",
      "merge OR content:*^0.5")) {
      val hits = Searcher.search(spark, handle, qs, 10).collect().toSeq
      val want = ref.search(qs, 10)
      assert(hits.map(_.docId) == want.map(_._1), s"'$qs': got $hits want $want")
      hits.zip(want).foreach { case (h, (_, s)) =>
        assert(math.abs(h.score - s) <= 1e-9, s"'$qs'")
      }
    }
    // bare * sees the empty doc; content:* does not
    assert(Searcher.matchingIds(spark, handle, "*").collect().toSet ==
      Set(0L, 1L, 2L))
    assert(Searcher.matchingIds(spark, handle, "content:*").collect().toSet ==
      Set(0L, 2L))
  }

  test("highlight/matchedTerms: NOT branches excluded, multiterms expanded") {
    import spark.implicits._
    val (dir, docs) = buildSmall()
    val handle = Searcher.open(spark, dir)
    val corpus = spark.createDataset(smallCorpus)
    // doc 0 contains both merge and join; NOT side must not be bolded
    val frags = graft.search.Highlight.highlights(spark, handle, corpus,
      "merge NOT shuffle", (0L until 6L), surround = 10, maxFrags = 1)
      .select($"fragment").as[String].collect()
    assert(frags.nonEmpty)
    assert(frags.forall(f => f.contains("<b>merge</b>") && !f.contains("<b>shuffle</b>")))
    // prefix queries highlight their concrete expansions
    val pf = graft.search.Highlight.highlights(spark, handle, corpus,
      "mer*", (0L until 6L), surround = 0, maxFrags = 5)
      .select($"fragment").as[String].collect()
    assert(pf.nonEmpty && pf.forall(_ == "<b>merge</b>"))
    // matchedTerms likewise: positive only, expansions reported
    val mt = Searcher.matchedTerms(spark, handle, "mer* NOT join", docs.map(_._1))
      .as[(Long, String)].collect().toSet
    assert(mt.nonEmpty && mt.forall(_._2 == "merge"))
  }

  test("index admin lifecycle: exists / stats / optimize / delete") {
    import spark.implicits._
    val dir = SparkTestBase.tmpDir("admin") + "/ix"
    assert(!graft.build.IndexAdmin.exists(spark, dir))
    IndexBuilder.build(spark, spark.createDataset(smallCorpus), dir,
      IndexConfig(segSize = 2))
    assert(graft.build.IndexAdmin.exists(spark, dir))
    val st0 = graft.build.IndexAdmin.stats(spark, dir)
    assert(st0.numDocs == 6 && st0.numSegments == 3)
    // optimize == compact-to-one-segment with purge
    graft.build.Deletes.add(spark, dir, Seq(0L))
    graft.merge.Merger.optimize(spark, dir)
    val st1 = graft.build.IndexAdmin.stats(spark, dir)
    assert(st1.numSegments == 1 && st1.numDocs == 5)
    val handle = Searcher.open(spark, dir)
    assert(!Searcher.search(spark, handle, "merge", 10).collect()
      .exists(_.docId == 0L))
    assert(graft.build.IndexAdmin.delete(spark, dir))
    assert(!graft.build.IndexAdmin.exists(spark, dir))
  }

  test("new entry points degrade gracefully on garbage / empty input") {
    import spark.implicits._
    val (dir, _) = buildSmall()
    val handle = Searcher.open(spark, dir)
    val corpus = spark.createDataset(smallCorpus)

    // batch search: garbage queries drop out, good ones still answer
    val res = Searcher.searchMany(spark, handle, Seq(
      "g1" -> "AND OR (((", "g2" -> "\"unclosed", "g3" -> "", "ok" -> "merge"), 5)
      .as[(String, Long, Double)].collect().toSeq
    assert(res.nonEmpty && res.forall(_._1 == "ok"))
    assert(Searcher.searchMany(spark, handle, Seq.empty, 5).isEmpty)

    // correction of garbage stays parseable; all-unknown phrase survives
    Searcher.correctQuery(spark, handle, "NOT ((( \"")
    Searcher.correctQuery(spark, handle, "zz1 zz2 zz3")

    // empty hit sets / empty doc lists
    assert(Searcher.facetCounts(spark, handle, "nosuchterm", "lang").isEmpty)
    assert(Searcher.searchSortedBy(spark, handle, "nosuchterm", "path").isEmpty)
    assert(graft.search.Highlight.highlights(spark, handle, corpus, "merge",
      Seq.empty).isEmpty)
    assert(graft.search.KeyTerms.forDocs(spark, handle, corpus, Seq.empty).isEmpty)
    assert(graft.search.KeyTerms.fromText(spark, handle, "").isEmpty)
    // moreLikeThis of a nonexistent doc: empty, no crash
    assert(graft.search.KeyTerms.moreLikeThis(spark, handle, corpus, 999L)
      .isEmpty)
    // components of an empty pair set
    assert(graft.ops.Dedup.components(
      spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")).isEmpty)
  }

  test("highlights over hits: rows only for matching docs, html render pinned") {
    import spark.implicits._
    val (dir, _) = buildSmall()
    val handle = Searcher.open(spark, dir)
    val corpus = spark.createDataset(smallCorpus)
    val rows = Highlight.highlights(spark, handle, corpus, "merge OR join",
      (0L until 6L), surround = 1, maxFrags = 2)
      .as[(Long, Int, Int, Int, Int, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._6.contains("<b>")))
    // doc 3 ("the quick brown fox...") has no match — no rows
    assert(!rows.exists(_._1 == 3L))
    // doc 0: "spark merge join shuffle partition merge" — one island
    // (positions 1,2 adjacent; 5 at gap 3 > 2*1) -> two fragments
    val d0 = rows.filter(_._1 == 0L)
    assert(d0.map(_._6) == Seq(
      "spark <b>merge</b> <b>join</b> shuffle",
      "partition <b>merge</b>"))
  }
}
