package graft.search

import org.apache.hadoop.fs.FileSystem
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.build.IndexBuilder
import graft.model.{LexRow, SegRead}

/** Distributed BM25 top-k search over the segmented index (SURVEY.md §3.2).
  *
  * Query path — deliberately shuffle-light (the p95 lever):
  *  1. driver: parse + analyze the query (Q1), read corpus stats;
  *  2. one pruned scan of the lexicon for the <=|terms| global dfs
  *     (term-sorted parquet -> pushed `term IN (...)` prunes row groups);
  *  3. one pruned scan of the segments for the query terms' posting rows
  *     (same pushdown; `content` never read — column pruning);
  *  4. per-segment mapGroups kernel (block-max WAND) -> k rows per segment;
  *  5. driver/TakeOrdered merge of numSegments x k tiny rows, tie rule D4.
  *
  * The only exchange moves <= numSegments * |terms| compressed posting rows
  * — no corpus-wide shuffle ever happens at query time.
  */
object Searcher {

  final case class SearchHit(docId: Long, score: Double)

  /** Opened once per index: corpus stats, the segment/lexicon relations
    * (file listing + partition discovery happen here, NOT per query), the
    * deletion-sidecar map (S6 — segId -> tombstone range files; the
    * tombstones themselves are loaded per segment INSIDE the kernel, never
    * collected to the driver), and a df memo (the index is immutable under
    * a handle).
    *
    * SNAPSHOT SEMANTICS: a handle pins the segment files that existed at
    * open time. Merge/compaction REPLACES segment files, so queries through
    * a pre-compaction handle fail with FILE_NOT_EXIST — reopen after any
    * merge (the reference behaves the same: searchers are reopened after
    * optimize). At cluster scale, leave superseded segment files in place
    * until readers drain before GC'ing them. */
  final class IndexHandle(val indexDir: String, val stats: BM25.CorpusStats,
                          val segSize: Int,
                          val segments: DataFrame, val lexicon: DataFrame,
                          val delRanges: Map[Int, Seq[Long]],
                          val chain: graft.analysis.Chain = graft.analysis.Chain.Standard,
                          val lexgrams: Option[DataFrame] = None,
                          val liveSegIds: Seq[Int] = Seq.empty,
                          /** r6: every live segment is ONE parquet file with
                            * ONE row group (verified from the footers at open
                            * time) — the physical invariant that lets the
                            * kernel run scan-side with no exchange, because a
                            * whole row group is always consumed by exactly
                            * one scan task. False after term-range-partitioned
                            * merges or for multi-row-group (>~128 MB)
                            * segments; those fall back to the shuffle path. */
                          val segColocated: Boolean = false) {
    def hasDeletes: Boolean = delRanges.nonEmpty
    private[search] val dfCache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  }

  def open(spark: SparkSession, indexDir: String): IndexHandle = {
    val fs = FileSystem.get(new java.net.URI(indexDir),
      spark.sparkContext.hadoopConfiguration)
    val st = IndexBuilder.readStats(fs, indexDir)
    // fail FAST on a foreign layout (round-5 advice): a pre-v7 index (no
    // formatVersion stamp) lacks the persisted D14 pseudo rows and the
    // lexicon maxTf column — opening it would silently return empty `*`/NOT
    // results and only error when termStats touched the missing column
    require(st.formatVersion == graft.model.IndexStats.CurrentFormat,
      s"index at $indexDir has on-disk formatVersion ${st.formatVersion}, " +
        s"this reader needs ${graft.model.IndexStats.CurrentFormat} — " +
        "rebuild the index (IndexBuilder.build) to migrate")
    // manifest-driven segment set: a crashed merge can leave superseded or
    // orphaned segment dirs behind (they are GC'd after the commit point) —
    // readers trust only segIds with a live manifest. The isin filter is a
    // partition-pruning predicate on the segId directory column. Read via
    // the rolled-up TOC (round-5): O(1) metadata reads when fresh instead
    // of one JSON per segment, falling back to the per-file protocol read
    // on any staleness.
    val manifests = IndexBuilder.readManifestsFast(fs, indexDir)
    val liveSegs = manifests.map(_.segId)
    // a freshly created index (Engine.createIndex) has stats but no
    // segments yet — empty relations keep every search path total
    val segments =
      if (liveSegs.isEmpty) {
        import spark.implicits._
        spark.emptyDataset[SegRead].toDF()
      } else spark.read.parquet(IndexBuilder.segmentsDir(indexDir))
        .filter(col("segId").isin(liveSegs: _*))
    // deletes: one listing; per-segment sidecars resolve through the
    // manifest's build-layout `covers` so tombstones stay addressable after
    // compactions that mint fresh segIds
    val delRids = graft.build.Deletes.listRanges(fs, indexDir)
    val delRanges: Map[Int, Seq[Long]] =
      if (delRids.isEmpty) Map.empty
      else manifests.iterator.map { m =>
        m.segId -> m.coverSet.map(_.toLong).filter(delRids)
      }.filter(_._2.nonEmpty).toMap
    val lexgrams =
      if (fs.exists(new org.apache.hadoop.fs.Path(IndexBuilder.lexgramsDir(indexDir))))
        Some(spark.read.parquet(IndexBuilder.lexgramsDir(indexDir)))
      else None
    // LSM lexicon (round-5): streaming appends commit term-sorted DELTA
    // files instead of rewriting the vocab-sized base; the handle's lexicon
    // folds base + live deltas with a grouped re-aggregation. Catalyst
    // pushes term predicates through the Aggregate (grouping-column
    // filters), so the pruned `term IN` probe still reaches every file's
    // row-group stats; with no deltas (the common, post-fold state) the
    // relation is the bare base scan — zero plan change.
    val lexicon =
      if (liveSegs.isEmpty) {
        import spark.implicits._
        spark.emptyDataset[graft.model.LexRow].toDF()
      } else {
        val base = spark.read.parquet(IndexBuilder.lexiconDir(indexDir))
        val deltas = IndexBuilder.liveLexDeltaDirs(fs, indexDir)
        if (deltas.isEmpty) base
        else deltas.map(spark.read.parquet(_)).foldLeft(base)(_ unionByName _)
          .groupBy(col("term"))
          .agg(sum(col("df")).cast("long").as("df"),
            sum(col("cf")).cast("long").as("cf"),
            max(col("maxTf")).cast("long").as("maxTf"))
      }
    new IndexHandle(indexDir, BM25.CorpusStats(st.numDocs, st.totalFieldLen),
      st.segSize, segments,
      lexicon,
      delRanges,
      new graft.analysis.Chain(graft.analysis.AnalyzerSpec.fromString(st.analyzer)),
      lexgrams,
      liveSegs,
      segmentsColocated(fs, indexDir, liveSegs))
  }

  /** Upper bound on live segments for which open() will verify the
    * colocated layout: the check costs one listing + one footer read per
    * segment, and an index past this size is throughput-shaped — its
    * queries fan out over thousands of tasks where the exchange path's one
    * small shuffle is the right plan anyway, so paying O(segments) open-time
    * I/O to maybe skip it is a bad trade. The latency-sensitive serving
    * shape (tens to hundreds of segments) stays under the cap. */
  private val ColocCheckMaxSegments = 1024

  /** r6: verify the one-file / one-row-group-per-live-segment layout that
    * the exchange-free kernel path requires (a parquet row group is consumed
    * by exactly one scan task, so single-row-group segments can never split
    * across tasks). One listing + one footer read per segment, paid once at
    * open and capped by ColocCheckMaxSegments. Fresh builds and streaming
    * appends write exactly this layout; term-range-partitioned merge output
    * (several files per segId) and multi-row-group segments return false ->
    * shuffle fallback. */
  private def segmentsColocated(fs: FileSystem, indexDir: String,
                                liveSegs: Seq[Int]): Boolean = {
    if (liveSegs.isEmpty || liveSegs.size > ColocCheckMaxSegments) return false
    val conf = fs.getConf
    liveSegs.forall { segId =>
      val dir = new org.apache.hadoop.fs.Path(
        s"${IndexBuilder.segmentsDir(indexDir)}/segId=$segId")
      if (!fs.exists(dir)) true // committed-empty segment: no rows anywhere
      else {
        val files = fs.listStatus(dir).filter { s =>
          val n = s.getPath.getName
          n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
        }
        files.length <= 1 && files.forall { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(f.getPath, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRowGroups.size() <= 1 finally r.close()
        }
      }
    }
  }

  /** Multiterm expansion against the global lexicon: matching terms in
    * ascending order, capped at QMulti.MaxExpand. Three scan regimes, best
    * first:
    *  1. prefix-narrowed (pushed StartsWith prunes row groups on the
    *     term-sorted lexicon) — prefix/anchored-wildcard/range;
    *  2. gram-pruned: unprefixed fuzzy/wildcard probe the 3-gram sidecar
    *     (pushed gram IN (...)), superset-guaranteed — a fuzzy within d
    *     edits of t shares a 3-gram of t when len(t) >= 3d + 3; a wildcard
    *     match contains every gram of its longest literal run;
    *  3. full lexicon pass — only for terms too short for the guarantee or
    *     indexes without the sidecar. */
  private[graft] def scanMulti(spark: SparkSession, handle: IndexHandle,
                               mq: QMulti): Seq[String] = {
    import spark.implicits._
    val finish: DataFrame => Seq[String] = df =>
      df.orderBy($"term").limit(QMulti.MaxExpand)
        .select($"term").as[String].collect().toSeq

    def gramProbe(grams: Seq[String]): Option[DataFrame] =
      handle.lexgrams.filter(_ => grams.nonEmpty).map { lg =>
        lg.filter($"gram".isin(grams: _*)).select($"term").distinct()
      }

    mq match {
      case v: QVariations => // D16: a small enumerated set -> pushed IN
        finish(handle.lexicon.filter($"term".isin(v.candidates.toSeq: _*)))
      case QRange(lo, hi, _, _, minI, maxI) =>
        var df = handle.lexicon
        if (lo != null) df = df.filter(if (minI) $"term" >= lo else $"term" > lo)
        if (hi != null) df = df.filter(if (maxI) $"term" <= hi else $"term" < hi)
        finish(df)
      case _: QPrefix =>
        finish(handle.lexicon.filter($"term".startsWith(mq.scanPrefix)))
      case w: QWildcard =>
        val base =
          if (w.scanPrefix.nonEmpty) handle.lexicon.filter($"term".startsWith(w.scanPrefix))
          else {
            val runs = w.pattern.split("[*?]+").filter(_.length >= 3)
            val longest = if (runs.isEmpty) "" else runs.maxBy(_.length)
            gramProbe(IndexBuilder.grams3(longest).toSeq).getOrElse(handle.lexicon)
          }
        finish(base.filter($"term".rlike("^" + w.regexStr + "$")))
      case QFuzzy(t, d, _, _) =>
        val base =
          if (t.length >= 3 * d + 3)
            gramProbe(IndexBuilder.grams3(t).toSeq).getOrElse(handle.lexicon)
          else handle.lexicon
        finish(base.filter(levenshtein($"term", lit(t)) <= d))
    }
  }

  /** Spelling suggestions (Whoosh `Searcher.suggest`): lexicon terms within
    * `maxDist` edits of `word`, ranked (distance asc, df desc, term asc) —
    * common corpus terms first among equally-close candidates. Reuses the
    * fuzzy scan machinery: gram-pruned when the 3-gram sidecar guarantees
    * coverage, full lexicon pass otherwise; the lexicon is term-count-sized,
    * never corpus-sized. */
  def suggest(spark: SparkSession, handle: IndexHandle, word: String,
              k: Int = 5, maxDist: Int = 2): Seq[(String, Int, Long)] = {
    import spark.implicits._
    val w = word.toLowerCase(java.util.Locale.ROOT)
    val base =
      if (w.length >= 3 * maxDist + 3)
        handle.lexgrams.map { lg =>
          handle.lexicon.join(
            lg.filter($"gram".isin(IndexBuilder.grams3(w).toIndexedSeq: _*))
              .select($"term").distinct(), Seq("term"))
        }.getOrElse(handle.lexicon)
      else handle.lexicon
    base
      .filter(abs(length($"term") - lit(w.length)) <= maxDist)
      .filter(levenshtein($"term", lit(w)) <= maxDist)
      .select($"term", levenshtein($"term", lit(w)).as("dist"),
        $"df".cast("long").as("df"))
      .orderBy($"dist".asc, $"df".desc, $"term".asc)
      .limit(k)
      .as[(String, Int, Long)]
      .collect().toSeq
  }

  /** Query correction ([W] whoosh/searching.py `correct_query`, decision
    * D13): every term of the parsed query that is NOT in the lexicon
    * (df 0) is replaced by its top spelling suggestion (distance asc,
    * df desc, term asc — the `suggest` ranking); terms with no suggestion
    * within `maxDist` stay as-is. Terms inside phrases are corrected too;
    * multiterm/Every nodes are untouched. Cost: one pruned df lookup plus
    * one suggest scan per unknown term (lexicon-sized, never corpus-sized). */
  def correctQuery(spark: SparkSession, handle: IndexHandle, query: String,
                   maxDist: Int = 2): Q = {
    val q0 = QueryParser.parse(query, chainOf = _ => handle.chain)
    val dfs = termDfs(spark, handle, q0.terms)
    val unknown = dfs.collect { case (t, 0L) => t }.toSet
    if (unknown.isEmpty) return q0
    val repl: Map[String, String] = unknown.iterator.map { t =>
      t -> suggest(spark, handle, t, 1, maxDist).headOption.map(_._1).getOrElse(t)
    }.toMap
    def rec(q: Q): Q = q match {
      case t: QTerm if repl.contains(t.term) => t.copy(term = repl(t.term))
      case p: QPhrase =>
        p.copy(ts = p.ts.map { case (t, o) => (repl.getOrElse(t, t), o) })
      case QAnd(cs)        => QAnd(cs.map(rec))
      case QOr(cs)         => QOr(cs.map(rec))
      case QDisMax(cs, tb) => QDisMax(cs.map(rec), tb)
      case QNot(p, n)      => QNot(rec(p), rec(n))
      case QAndMaybe(p, m) => QAndMaybe(rec(p), rec(m))
      case QRequire(p, f)  => QRequire(rec(p), rec(f))
      case QPureNot(n)     => QPureNot(rec(n))
      case QSpanNear(cs, slop, ord) => QSpanNear(cs.map(rec), slop, ord)
      case QSpanOr(cs)     => QSpanOr(cs.map(rec))
      case QSpanNot(i, e)  => QSpanNot(rec(i), rec(e))
      case QSpanBi(a, b, m) => QSpanBi(rec(a), rec(b), m)
      case other           => other
    }
    rec(q0)
  }

  /** global df for the query's terms: one pruned lexicon scan for the
    * not-yet-cached terms (a term absent from the lexicon has df 0 and is
    * cached as such so it's never re-fetched) */
  def termDfs(spark: SparkSession, handle: IndexHandle, terms: Set[String]): Map[String, Long] = {
    import spark.implicits._
    if (terms.isEmpty) return Map.empty
    val missing = terms.filterNot(handle.dfCache.containsKey)
    if (missing.nonEmpty) {
      val fetched = handle.lexicon
        .filter($"term".isin(missing.toSeq: _*))
        .as[LexRow]
        .collect()
        .map(l => l.term -> l.df)
        .toMap
      missing.foreach(t => handle.dfCache.put(t, Long.box(fetched.getOrElse(t, 0L))))
    }
    terms.iterator.map(t => t -> handle.dfCache.get(t).longValue()).toMap
  }

  /** Global per-term stats from the lexicon ([W] whoosh/reading.py
    * TermInfo: doc_frequency, frequency, max_weight): one pruned IN
    * lookup. `upperBound(w)` = the term's corpus-wide score ceiling
    * w.upperBound(idf(df), maxTf) — driver-side query bound math with no
    * segment read (e.g. ordering OR terms, or skipping terms that cannot
    * reach a threshold). */
  final case class TermStats(df: Long, cf: Long, maxTf: Long) {
    def upperBound(w: Weighting, numDocs: Long): Double =
      if (df == 0) 0.0 else w.upperBound(w.idf(df, numDocs), maxTf.toInt)
  }
  def termStats(spark: SparkSession, handle: IndexHandle,
                terms: Set[String]): Map[String, TermStats] = {
    import spark.implicits._
    if (terms.isEmpty) return Map.empty
    handle.lexicon
      .filter($"term".isin(terms.toSeq: _*))
      .as[LexRow]
      .collect()
      .map(l => l.term -> TermStats(l.df, l.cf, l.maxTf))
      .toMap
  }

  /** Pruned posting rows for the query's terms, plus the per-segment
    * match-all pseudo lists when the query needs them (QEvery).
    *
    * The pseudo lists are PERSISTED per segment at build time (decision
    * D14): two reserved-term rows — Q.EveryTerm (all docs) and
    * Q.EveryNonEmptyTerm (docs with >= 1 token) — written through the
    * ordinary run/merge machinery, so they ride THIS same pushed `term IN`
    * scan. A `NOT x` / `*` / `field:*` query therefore reads a handful of
    * pruned posting rows, never a corpus-wide docstats scan (the round-3
    * in-flight builder scanned every live doc's stats per query). Deletes
    * overlay via the kernel's tombstone probe, so the persisted list stays
    * a pure function of the segment. Scopes: "" = all docs (bare `*`); the
    * default field = the non-empty list, re-keyed EveryTerm + field so the
    * kernel scopes it; any OTHER field ships nothing -> EmptyMatcher
    * (RefModel: None). */
  private[search] def queryRows(spark: SparkSession, handle: IndexHandle,
                                terms: Set[String],
                                everyFields: Set[String]): Dataset[SegRead] = {
    import spark.implicits._
    val wantAll = everyFields.contains("")
    val wantField = everyFields.contains(Q.DefaultField)
    val stored = terms ++
      (if (wantAll) Set(Q.EveryTerm) else Set.empty) ++
      (if (wantField) Set(Q.EveryNonEmptyTerm) else Set.empty)
    val rows = handle.segments
      .filter($"term".isin(stored.toSeq: _*))
      .select($"term", $"df", $"maxTf", $"blocks", $"segId")
      .as[SegRead]
    if (!wantField) rows
    else rows.map(r =>
      if (r.term == Q.EveryNonEmptyTerm) r.copy(term = Q.EveryTerm + Q.DefaultField)
      else r)
  }

  /** Executor-side tombstone probe for one segment: loads only the range
    * sidecars the segment's manifest covers (each bounded by segSize
    * entries) — no tombstone set ever rides the driver or a closure. */
  private[search] def tombstoneProbe(delRanges: Map[Int, Seq[Long]],
                                     indexDir: String, segId: Int): Long => Boolean =
    delRanges.get(segId) match {
      case None => Kernel.NoDeletes
      case Some(rids) =>
        val fs = FileSystem.get(new java.net.URI(indexDir),
          new org.apache.hadoop.conf.Configuration())
        val tomb: Array[Long] = rids.iterator
          .flatMap(graft.build.Deletes.readRange(fs, indexDir, _)).toArray
        java.util.Arrays.sort(tomb)
        id => java.util.Arrays.binarySearch(tomb, id) >= 0
    }

  /** Does ANY document match q? One pruned kernel pass, lazily stopped at
    * the first match per segment (allMatches iterator take(1)) and at the
    * first matching segment (CollectLimit) — the Otherwise probe. */
  private[search] def hasAnyMatch(spark: SparkSession, handle: IndexHandle,
                                  q: Q): Boolean = {
    import spark.implicits._
    if (q == QEmpty || (q.terms.isEmpty && !q.hasEvery)) return false
    val stats = handle.stats
    val qLocal = q
    perSegmentKernel[Long](spark, handle, q.terms, q.everyFields,
      termDfs(spark, handle, q.terms)) { (lists, deleted) =>
      Kernel.allMatches(qLocal, lists, stats, deleted).take(1)
    }.head(1).nonEmpty
  }

  /** Resolve Otherwise nodes ([W] whoosh qcore.Otherwise — round-5, pinned
    * GLOBAL semantics): use `a` iff it matches anywhere in the INDEX, else
    * `b`. Resolved driver-side with one bounded existence probe per node —
    * per-segment resolution would answer from different branches in
    * different segments. Span subtrees cannot contain Otherwise (spanify
    * rejects it), so recursion stops at span/leaf nodes. */
  private def resolveOtherwise(spark: SparkSession, handle: IndexHandle,
                               q: Q): Q = q match {
    case QOtherwise(a, b) =>
      val ar = resolveOtherwise(spark, handle, a)
      if (hasAnyMatch(spark, handle, ar)) ar
      else resolveOtherwise(spark, handle, b)
    case QAnd(cs)        => QAnd(cs.map(resolveOtherwise(spark, handle, _)))
    case QOr(cs)         => QOr(cs.map(resolveOtherwise(spark, handle, _)))
    case QDisMax(cs, tb) => QDisMax(cs.map(resolveOtherwise(spark, handle, _)), tb)
    case QNot(p, n)      => QNot(resolveOtherwise(spark, handle, p),
                                 resolveOtherwise(spark, handle, n))
    case QAndMaybe(p, m) => QAndMaybe(resolveOtherwise(spark, handle, p),
                                      resolveOtherwise(spark, handle, m))
    case QRequire(p, f)  => QRequire(resolveOtherwise(spark, handle, p),
                                     resolveOtherwise(spark, handle, f))
    case QConstantScore(c, sc) => QConstantScore(resolveOtherwise(spark, handle, c), sc)
    case other           => other
  }

  /** Shared query-entry scaffold (round-3 self-review: four near-identical
    * copies had started to drift): parse with the handle's chain, expand
    * multiterm nodes against the lexicon, resolve Otherwise nodes, and
    * apply the Every-aware emptiness rule. None = the query can match
    * nothing. */
  private def expandedQuery(spark: SparkSession, handle: IndexHandle,
                            query: String): Option[Q] = {
    val q0 = QueryParser.parse(query, chainOf = _ => handle.chain)
    val q1 = if (q0.hasPrefix)
      QueryRewrite.expandPrefixes(q0, mq => scanMulti(spark, handle, mq))
    else q0
    val q = resolveOtherwise(spark, handle, q1)
    if (q == QEmpty || (q.terms.isEmpty && !q.hasEvery)) None else Some(q)
  }

  /** Shared per-segment kernel runner: one pruned scan for `terms` (+ the
    * required Every pseudo lists), the kernel list map k-way-merged, the
    * executor-side tombstone probe built — then `f` produces the segment's
    * output rows. Captures only plain locals (never the handle) so the
    * closure stays serialization-clean.
    *
    * Two physical shapes (r6):
    *  - COLOCATED (the common case — open() verified one file + one row
    *    group per live segment): the kernel runs scan-side in a
    *    mapPartitions, grouping the task's rows by segId in a hash map. No
    *    exchange, no sort, no AQE stage barrier — a warm top-k query is ONE
    *    single-stage job (plans/r06/&lt;q&gt;_after.txt). Safe because a parquet
    *    row group is consumed by exactly one scan task, so a task always
    *    holds whole segments.
    *  - FALLBACK (post-merge multi-file segments, or >1 row group): the
    *    r1-r5 groupByKey(segId) shuffle, which co-locates split segments
    *    correctly at one small exchange's cost. */
  private def perSegmentKernel[T: org.apache.spark.sql.Encoder](
      spark: SparkSession, handle: IndexHandle, terms: Set[String],
      everyFields: Set[String], dfs: Map[String, Long])(
      f: (Map[String, Kernel.TermList], Long => Boolean) => Iterator[T]): Dataset[T] = {
    import spark.implicits._
    val delRanges = handle.delRanges
    val dirLocal = handle.indexDir
    val fLocal = f
    val rows = queryRows(spark, handle, terms, everyFields)
    // FALLBACK co-location is a plain column repartition, not groupByKey:
    // the task-local hash-map grouping below needs co-located rows, not
    // SORTED ones, and groupByKey's plan inserts a per-partition sort the
    // grouping never uses (r6; the exchange itself is the small pruned-row
    // shuffle the r1-r5 path always paid)
    val src = if (handle.segColocated) rows
      else rows.repartition(org.apache.spark.sql.functions.col("segId"))
    src.mapPartitions { it =>
      val bySeg = new java.util.LinkedHashMap[Int,
        scala.collection.mutable.HashMap[String, Kernel.TermList]]()
      it.foreach { r =>
        var lists = bySeg.get(r.segId)
        if (lists == null) {
          lists = scala.collection.mutable.HashMap.empty[String, Kernel.TermList]
          bySeg.put(r.segId, lists)
        }
        Kernel.mergeList(lists, r.term,
          Kernel.TermList(r.blocks, r.maxTf, dfs.getOrElse(r.term, r.df.toLong)))
      }
      import scala.jdk.CollectionConverters._
      bySeg.entrySet().iterator().asScala.flatMap { e =>
        fLocal(e.getValue.toMap, tombstoneProbe(delRanges, dirLocal, e.getKey))
      }
    }
  }

  /** ALL docIds matching a query — the delete-by-query feed: same pruned
    * scan and per-segment kernel as searchQ, but every match is emitted
    * (no top-k heap, no global sort, nothing driver-side). */
  def matchingIds(spark: SparkSession, handle: IndexHandle,
                  query: String): Dataset[Long] = {
    import spark.implicits._
    expandedQuery(spark, handle, query) match {
      case None => spark.emptyDataset[Long]
      case Some(q) =>
        val dfs = termDfs(spark, handle, q.terms)
        val stats = handle.stats
        perSegmentKernel[Long](spark, handle, q.terms, q.everyFields, dfs) {
          (lists, deleted) => Kernel.allMatches(q, lists, stats, deleted)
        }
    }
  }

  /** every match WITH its score — the collapse/grouping feed (same pruned
    * scan as matchingIds; no top-k heap, nothing driver-side) */
  def scoredMatches(spark: SparkSession, handle: IndexHandle,
                    query: String,
                    weighting: Weighting = BM25Weighting): Dataset[SearchHit] = {
    import spark.implicits._
    expandedQuery(spark, handle, query) match {
      case None => spark.emptyDataset[SearchHit]
      case Some(q) =>
        val dfs = termDfs(spark, handle, q.terms)
        val stats = handle.stats
        val w = weighting
        perSegmentKernel[SearchHit](spark, handle, q.terms, q.everyFields, dfs) {
          (lists, deleted) =>
            Kernel.allScored(q, lists, stats, deleted, w)
              .map(h => SearchHit(h.docId, h.score))
        }
    }
  }

  /** Field collapsing ([W] whoosh/collectors.py `collapse`): only the
    * best-scoring hit per value of a stored field survives, then the
    * global top-k. One kernel match pass, one docId join against
    * docstats, one window per collapse key — content never read. Ties
    * pinned (score desc, docId asc) at both levels. */
  def searchCollapsed(spark: SparkSession, handle: IndexHandle, query: String,
                      field: String, k: Int = 10,
                      weighting: Weighting = BM25Weighting): DataFrame = {
    import spark.implicits._
    val hits = scoredMatches(spark, handle, query, weighting).toDF()
    val joined = liveDocstats(spark, handle)
      .select(col("docId"), col(field))
      .join(hits, Seq("docId"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(field)).orderBy(col("score").desc, col("docId").asc)
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy(col("score").desc, col("docId").asc)
      .limit(k)
  }

  /** Which of the query's terms matched each of the given docs ([W]
    * whoosh Results.matched_terms, the `terms=True` surface): one pruned
    * scan of the query terms' posting rows, then a forward cursor probe of
    * the (sorted, <=k) requested ids per segment — bounded by
    * |terms| x segments rows, nothing corpus-sized. Returns (docid, term)
    * pairs; multiterm nodes expand first, so `s*` reports the concrete
    * matched expansions. */
  def matchedTerms(spark: SparkSession, handle: IndexHandle, query: String,
                   docIds: Seq[Long]): DataFrame = {
    import spark.implicits._
    val q0 = QueryParser.parse(query, chainOf = _ => handle.chain)
    val q = if (q0.hasPrefix)
      QueryRewrite.expandPrefixes(q0, mq => scanMulti(spark, handle, mq))
    else q0
    // positive branches only: a NOT's negative side never causes a match
    val terms = q.positiveTerms
    if (terms.isEmpty || docIds.isEmpty)
      return spark.emptyDataset[(Long, String)].toDF("docid", "term")
    val ids = docIds.distinct.sorted.toArray
    perSegmentKernel[(Long, String)](spark, handle, terms, Set.empty, Map.empty) {
      (lists, _) =>
        lists.iterator.flatMap { case (term, tl) =>
          val cur = new graft.codec.PostingsCodec.TermCursor(tl.bytes)
          ids.iterator.flatMap { id =>
            cur.skipTo(id)
            if (cur.docId == id) Some((id, term)) else None
          }
        }
    }
      .toDF("docid", "term")
  }

  /** top-k hits as a Dataset (k rows), rank-identical to RefModel.
    * `weighting` selects the scoring model (reference surface:
    * search_documents(..., weighting=...); BM25 is the pinned default). */
  def search(spark: SparkSession, handle: IndexHandle, query: String, k: Int = 10,
             prune: Boolean = true,
             weighting: Weighting = BM25Weighting): Dataset[SearchHit] = {
    import spark.implicits._
    val q = QueryParser.parse(query, chainOf = _ => handle.chain)
    searchQ(spark, handle, q, k, prune, weighting)
  }

  def searchQ(spark: SparkSession, handle: IndexHandle, q0: Q, k: Int,
              prune: Boolean = true,
              weighting: Weighting = BM25Weighting): Dataset[SearchHit] = {
    import spark.implicits._
    // multiterm expansion: one pruned scan per node (scanMulti — pushed
    // StartsWith / gram-probe / range), ascending-term, MaxExpand-capped
    val q1 = if (q0.hasPrefix)
      QueryRewrite.expandPrefixes(q0, mq => scanMulti(spark, handle, mq))
    else q0
    val q = resolveOtherwise(spark, handle, q1)
    if (q == QEmpty || (q.terms.isEmpty && !q.hasEvery))
      return spark.emptyDataset[SearchHit]
    val dfs = termDfs(spark, handle, q.terms)
    val stats = handle.stats
    val kLocal = k
    val pruneLocal = prune
    val wLocal = weighting
    // tombstones load INSIDE the kernel (perSegmentKernel), each file
    // bounded by segSize entries — no tombstone set rides the driver
    val perSegment =
      perSegmentKernel[SearchHit](spark, handle, q.terms, q.everyFields, dfs) {
        (lists, deleted) =>
          Kernel.topK(q, lists, stats, kLocal, pruneLocal, deleted, wLocal)
            .iterator.map(h => SearchHit(h.docId, h.score))
      }
    // global top-k: Catalyst plans TakeOrderedAndProject over the tiny
    // per-segment candidate set
    perSegment.orderBy($"score".desc, $"docId".asc).limit(k)
  }

  /** Batch search: evaluate MANY queries in ONE Spark job — the serving-
    * throughput shape. The measured per-job scheduling floor (~180 ms,
    * BENCH/BASELINE.md) is paid once for the whole batch: one pruned
    * lexicon lookup for the UNION of all queries' terms, one pruned
    * segment scan for that union, one kernel pass per segment evaluating
    * every query against the already-built term lists, then a per-query
    * top-k window over the tiny (queries x segments x k) candidate set.
    * Returns (qid, docId, score), k rows per query, same rank/tie
    * semantics as `search`. */
  def searchMany(spark: SparkSession, handle: IndexHandle,
                 queries: Seq[(String, String)], k: Int = 10,
                 prune: Boolean = true,
                 weighting: Weighting = BM25Weighting): DataFrame = {
    import spark.implicits._
    val parsed: Seq[(String, Q)] = queries.flatMap { case (qid, qs) =>
      expandedQuery(spark, handle, qs).map(qid -> _)
    }
    if (parsed.isEmpty)
      return spark.emptyDataset[(String, Long, Double)].toDF("qid", "docId", "score")

    val allTerms = parsed.iterator.flatMap(_._2.terms).toSet
    val dfs = termDfs(spark, handle, allTerms) // ONE pruned lookup for the batch
    val stats = handle.stats
    val kLocal = k
    val pruneLocal = prune
    val wLocal = weighting
    val parsedLocal = parsed
    val perSegment = perSegmentKernel[(String, Long, Double)](spark, handle,
      allTerms, parsed.iterator.flatMap(_._2.everyFields).toSet, dfs) {
      (lists, deleted) =>
        parsedLocal.iterator.flatMap { case (qid, q) =>
          Kernel.topK(q, lists, stats, kLocal, pruneLocal, deleted, wLocal)
            .iterator.map(h => (qid, h.docId, h.score))
        }
    }
      .toDF("qid", "docId", "score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"score".desc, $"docId".asc)
    perSegment.withColumn("rn", row_number().over(w))
      .filter($"rn" <= kLocal).drop("rn")
  }

  /** reader stats over the lexicon ([W] whoosh/reading.py
    * `most_frequent_terms` / `most_distinctive_terms`): top terms by
    * collection frequency, and by cf * idf (the pinned idf form). Lexicon-
    * sized scans; nothing touches postings. */
  def mostFrequentTerms(spark: SparkSession, handle: IndexHandle,
                        k: Int = 10): DataFrame =
    handle.lexicon.select(col("term"), col("cf"))
      .orderBy(col("cf").desc, col("term").asc).limit(k)

  def mostDistinctiveTerms(spark: SparkSession, handle: IndexHandle,
                           k: Int = 10): DataFrame = {
    val n = handle.stats.numDocs.toDouble
    handle.lexicon
      .withColumn("score",
        col("cf").cast("double") *
          (log(lit(n) / (col("df").cast("double") + lit(1.0))) + lit(1.0)))
      .select(col("term"), col("score"))
      .orderBy(col("score").desc, col("term").asc).limit(k)
  }

  /** Paged top-k (Q7: the reference's search_page(q, page_num, page_len),
    * default page_len 10): collect the first pageNum*pageLen hits, return
    * the requested page. */
  def searchPage(spark: SparkSession, handle: IndexHandle, query: String,
                 pageNum: Int = 1, pageLen: Int = 10): Seq[SearchHit] = {
    require(pageNum >= 1 && pageLen >= 1)
    search(spark, handle, query, pageNum * pageLen)
      .collect().toSeq
      .slice((pageNum - 1) * pageLen, pageNum * pageLen)
  }

  /** Facet counts ([W] whoosh/sorting.py `groupedby` — out of the pinned
    * cockatrice scope per SURVEY.md §2.8, added as reference-surface
    * stretch): EVERY doc matching the query, counted per value of a stored
    * docstats field. Scale shape: the same pruned kernel pass as
    * delete-by-query (no top-k heap), one docId equi-join against the
    * docstats sidecar, one aggregation on the facet key — the content
    * corpus is never touched. */
  def facetCounts(spark: SparkSession, handle: IndexHandle, query: String,
                  field: String): DataFrame = {
    val ids = matchingIds(spark, handle, query).toDF("docId")
    liveDocstats(spark, handle)
      .join(ids, Seq("docId"))
      .groupBy(col(field))
      .agg(count(lit(1)).as("count"))
  }

  /** FunctionFacet ([W] whoosh/sorting.py FunctionFacet): every match
    * counted per value of an arbitrary Column expression over the stored
    * docstats fields — the general form behind range and multi facets.
    * Same scale shape as facetCounts: kernel match pass, one docId
    * equi-join against docstats, one aggregation; content never read. */
  def facetCountsExpr(spark: SparkSession, handle: IndexHandle, query: String,
                      key: org.apache.spark.sql.Column, name: String): DataFrame = {
    val ids = matchingIds(spark, handle, query).toDF("docId")
    liveDocstats(spark, handle)
      .join(ids, Seq("docId"))
      .groupBy(key.as(name))
      .agg(count(lit(1)).as("count"))
  }

  /** RangeFacet ([W] whoosh/sorting.py RangeFacet(field, start, end, gap)):
    * numeric binning — matches with field value in [start, end) counted
    * per bucket, keyed by the bucket's inclusive lower bound. */
  def facetRangeCounts(spark: SparkSession, handle: IndexHandle, query: String,
                       field: String, start: Double, end: Double,
                       gap: Double): DataFrame = {
    require(gap > 0 && end > start, s"bad range facet: [$start, $end) gap $gap")
    val ids = matchingIds(spark, handle, query).toDF("docId")
    val v = col(field).cast("double")
    liveDocstats(spark, handle)
      .join(ids, Seq("docId"))
      .filter(v >= start && v < end)
      .groupBy((floor((v - lit(start)) / lit(gap)) * lit(gap) + lit(start))
        .as(s"${field}_lo"))
      .agg(count(lit(1)).as("count"))
  }

  /** MultiFacet ([W] whoosh/sorting.py MultiFacet): compound facet key —
    * every match counted per combination of the given stored fields. */
  def facetCountsMulti(spark: SparkSession, handle: IndexHandle, query: String,
                       fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty)
    val ids = matchingIds(spark, handle, query).toDF("docId")
    liveDocstats(spark, handle)
      .join(ids, Seq("docId"))
      .groupBy(fields.map(col): _*)
      .agg(count(lit(1)).as("count"))
  }

  /** Combined groupedby + sortedby in ONE pass ([W] whoosh search supports
    * facets and sort keys on the same call — round-5 verdict item 5; the
    * two-call composition ran the kernel match pass twice). One scored
    * kernel pass + one docId equi-join against docstats, persisted; `hits`
    * (top-k by the sort keys, or by score when none) and `facets` (count
    * per facet value) are both served from that cached match set — the
    * second consumer's plan is an InMemoryTableScan, not a second segment
    * scan. Call `close()` when done (or let it age out of the cache). */
  final class FacetedSearch private[search] (private[search] val matches: DataFrame,
                                             facetField: String,
                                             sortKeys: Seq[(String, Boolean)], k: Int) {
    lazy val hits: DataFrame = {
      val order =
        if (sortKeys.isEmpty) Seq(col("score").desc)
        else sortKeys.map { case (f, asc) => if (asc) col(f).asc else col(f).desc }
      val cols = col("docId") +: col("score") +: sortKeys.map(kf => col(kf._1))
      matches.select(cols.distinct: _*)
        .orderBy(order :+ col("docId").asc: _*)
        .limit(k)
    }
    lazy val facets: DataFrame =
      matches.groupBy(col(facetField)).agg(count(lit(1)).as("count"))
    def close(): Unit = { matches.unpersist(); () }
  }

  def searchFaceted(spark: SparkSession, handle: IndexHandle, query: String,
                    facetField: String, sortKeys: Seq[(String, Boolean)] = Seq.empty,
                    k: Int = 10,
                    weighting: Weighting = BM25Weighting): FacetedSearch = {
    val hitsDf = scoredMatches(spark, handle, query, weighting).toDF()
    val need = (facetField +: sortKeys.map(_._1)).distinct.map(col)
    // the hits side gets an explicit docId exchange BEFORE the docstats
    // join (r6): hit rows are 16 bytes, so the shuffle is cheap, and its
    // materialization lets AQE size the join from REAL row counts — a
    // selective query broadcast-joins the (tiny) hit set into the docstats
    // scan, while a match-all query degrades to a co-shuffled join. Without
    // it the static planner broadcast-collected the docstats side on every
    // call (measured +~250 ms per faceted query once the r6 exchange-free
    // kernel removed the shuffle AQE used to re-plan around).
    val matches = liveDocstats(spark, handle)
      .select(col("docId") +: need: _*)
      .join(hitsDf.repartition(col("docId")), Seq("docId"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    new FacetedSearch(matches, facetField, sortKeys, k)
  }

  /** Sorted search ([W] whoosh/sorting.py `sortedby`): the query's matches
    * ordered by a stored field instead of score. Catalyst plans the final
    * step as TakeOrderedAndProject over the joined match set — only k rows
    * reach the driver. */
  def searchSortedBy(spark: SparkSession, handle: IndexHandle, query: String,
                     field: String, asc: Boolean = true, k: Int = 10): DataFrame =
    searchSortedByKeys(spark, handle, query, Seq(field -> asc), k)

  /** multi-key `sortedby` (Whoosh sortedby=[...]): matches ordered by
    * several stored fields, each with its own direction; docId asc is the
    * final tiebreak. Same TakeOrderedAndProject shape as the single key. */
  def searchSortedByKeys(spark: SparkSession, handle: IndexHandle, query: String,
                         keys: Seq[(String, Boolean)], k: Int = 10): DataFrame = {
    require(keys.nonEmpty)
    val ids = matchingIds(spark, handle, query).toDF("docId")
    val order = keys.map { case (f, asc) => if (asc) col(f).asc else col(f).desc }
    liveDocstats(spark, handle)
      .join(ids, Seq("docId"))
      .select(col("docId") +: keys.map(kf => col(kf._1)): _*)
      .orderBy(order :+ col("docId").asc: _*)
      .limit(k)
  }

  private def docstatsDirOf(handle: IndexHandle): String =
    IndexBuilder.docstatsDir(handle.indexDir)

  /** the docstats sidecar restricted to LIVE-manifest segments: a crashed
    * merge can leave superseded segId dirs behind until the next GC, and an
    * unfiltered read would double-count their docs (same defense as the
    * segments read in open() and everyRows) */
  private[search] def liveDocstats(spark: SparkSession,
                                   handle: IndexHandle): DataFrame =
    spark.read.parquet(IndexBuilder.docstatsDir(handle.indexDir))
      .filter(col("segId").isin(handle.liveSegIds: _*))

  /** S4 as an API: the reference's `get_document(id)` point lookup —
    * stored fields for explicit docIds. One pruned docstats scan: the
    * sidecar is segId-partitioned with per-file docId min/max stats, so the
    * pushed IN filter prunes to the ids' segments/row groups. Deleted docs
    * are hidden, like every read path. */
  def getDocuments(spark: SparkSession, handle: IndexHandle, ids: Seq[Long]): DataFrame = {
    val live =
      if (!handle.hasDeletes) ids
      else {
        // only the requested ids' ranges are consulted (driver-side, but
        // bounded by |ids| sidecar files, not by the tombstone count)
        val fs = FileSystem.get(new java.net.URI(handle.indexDir),
          spark.sparkContext.hadoopConfiguration)
        val byRange = ids.groupBy(_ / handle.segSize)
        byRange.iterator.flatMap { case (rid, rangeIds) =>
          val tomb = graft.build.Deletes.readRange(fs, handle.indexDir, rid)
          rangeIds.filter(id => java.util.Arrays.binarySearch(tomb, id) < 0)
        }.toSeq
      }
    liveDocstats(spark, handle)
      .select("docId", "repo", "path", "commit", "lang", "sha", "rawLen")
      .filter(col("docId").isin(live: _*))
  }

  /** hits + stored fields (Q8): broadcast semi-join of the <=k ids against
    * the docstats sidecar (never the content-bearing corpus scan) */
  def searchWithFields(spark: SparkSession, handle: IndexHandle, query: String,
                       k: Int = 10): DataFrame = {
    val hits = search(spark, handle, query, k).toDF()
    val docstats = liveDocstats(spark, handle)
      .select("docId", "repo", "path", "commit", "lang", "sha")
    docstats.join(broadcast(hits), Seq("docId"), "inner")
      .orderBy(col("score").desc, col("docId").asc)
  }
}
