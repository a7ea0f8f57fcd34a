package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.build.{IndexBuilder, MultiFieldIndex}
import graft.build.IndexBuilder.IndexConfig
import graft.corpus.CorpusSource
import graft.ops.{CodeQuality, Decontam, Dedup, Fusion, Multimodal, Packing, Similarity, TextQuality}
import graft.search.{MultiFieldSearcher, Searcher}
import graft.streaming.StreamingIngest

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), each with a DuckDB-equivalent `oracleSql` where the
  * semantics are SQL-expressible (FIXTURES.md §5). The corpus is derived
  * deterministically from the driver's `documents.parquet` at sfDir into
  * the authoritative (repo, path, commit, lang, content) shape, so Spark
  * and DuckDB compute over identical inputs.
  */
object SparkEntry {

  /** bump when the on-disk index format changes (invalidates /tmp caches) */
  private val FormatVersion = "v7"

  /** the driver-contract multi-field schema: text content + path, plus a
    * numeric size (char length) and a datetime mtime (a deterministic date
    * derived from the doc id) exercising the typed-field surface */
  private val mfSchema: Seq[MultiFieldIndex.FieldSpec] = Seq(
    MultiFieldIndex.FieldSpec("content", _.content),
    MultiFieldIndex.FieldSpec("path", _.path),
    MultiFieldIndex.FieldSpec("dirs", _.path,
      analyzer = graft.analysis.AnalyzerSpec(graft.analysis.PathTok, Nil)),
    MultiFieldIndex.FieldSpec("size", r => r.content.length.toString,
      ftype = graft.build.NumericType),
    MultiFieldIndex.FieldSpec("mtime", r => {
      val id = r.path.replaceAll("[^0-9]", "").toLong
      java.time.LocalDate.of(2020, 1, 1).plusDays(id % 365).toString
    }, ftype = graft.build.DatetimeType),
    MultiFieldIndex.FieldSpec("big", r => (r.content.length >= 300).toString,
      ftype = graft.build.BooleanType))
  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def indexFor(spark: SparkSession, sfDir: String): String =
    built.computeIfAbsent(sfDir, { _ =>
      val dir = s"/tmp/graft-index-$FormatVersion-" +
        sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val corpus = CorpusSource.fromDocumentsTable(spark, sfDir)
      IndexBuilder.build(spark, corpus, dir, IndexConfig(segSize = 128))
      dir
    })

  /** two-field (content + path) index root for the field-qualified keys */
  private val builtMf = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def multiIndexFor(spark: SparkSession, sfDir: String): String =
    builtMf.computeIfAbsent(sfDir, { _ =>
      val dir = s"/tmp/graft-mfindex-$FormatVersion-" +
        sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      MultiFieldIndex.build(spark, CorpusSource.fromDocumentsTable(spark, sfDir),
        dir, mfSchema, IndexConfig(segSize = 128))
      dir
    })

  /** fresh index + upsert of the first 10 docs (put_document semantics) */
  private val builtUp = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def upsertIndexFor(spark: SparkSession, sfDir: String): String =
    builtUp.computeIfAbsent(sfDir, { _ =>
      import spark.implicits._
      val dir = s"/tmp/graft-upindex-$FormatVersion-" +
        sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      IndexBuilder.build(spark, CorpusSource.fromDocumentsTable(spark, sfDir),
        dir, IndexConfig(segSize = 128))
      val updated = docsTable(spark, sfDir).filter(col("doc_id") < 10)
        .select(
          format_string("r%02d", col("doc_id") % 97).as("repo"),
          format_string("d/%07d.txt", col("doc_id")).as("path"),
          format_string("%040x", col("doc_id")).as("commit"),
          col("lang"),
          concat(col("text"), lit(" upd")).as("content"))
        .as[graft.model.CorpusRow]
      StreamingIngest.upsert(spark, updated, dir, IndexConfig(segSize = 128))
      dir
    })

  /** fresh index + delete-by-query of every doc matching 'spark' */
  private val builtDq = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def deleteQueryIndexFor(spark: SparkSession, sfDir: String): String =
    builtDq.computeIfAbsent(sfDir, { _ =>
      val dir = s"/tmp/graft-dqindex-$FormatVersion-" +
        sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      IndexBuilder.build(spark, CorpusSource.fromDocumentsTable(spark, sfDir),
        dir, IndexConfig(segSize = 128))
      graft.build.Deletes.byQuery(spark, dir, "spark")
      dir
    })

  /** Flagship: build the index on sf0.001 and run a BM25 search with stored
    * fields; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = indexFor(spark, "/root/testdata/sf0.001")
    Searcher.searchWithFields(spark, Searcher.open(spark, dir), "spark", 10)
  }

  /** engine top-k re-ranked on round(score,6) with docId tie-break, so the
    * FP-rounded DuckDB comparison is stable (exact ties already break by
    * docId identically in both engines) */
  private def topk(spark: SparkSession, sfDir: String, query: String,
                   weighting: graft.search.Weighting = graft.search.BM25Weighting): DataFrame = {
    import spark.implicits._
    val dir = indexFor(spark, sfDir)
    val handle = Searcher.open(spark, dir)
    val kAll = handle.stats.numDocs.toInt + 1 // exhaustive margin at oracle scale
    Searcher.search(spark, handle, query, kAll, weighting = weighting)
      .withColumn("r6", round($"score", 6))
      .orderBy($"r6".desc, $"docId".asc)
      .limit(10)
      .select($"docId".as("docid"), round($"score", 4).as("score"))
  }

  /** multi-field analog of topk (same rounding/tie protocol) */
  private def mfTopk(s: SparkSession, sfDir: String, query: String): DataFrame = {
    import s.implicits._
    val mh = MultiFieldSearcher.open(s, multiIndexFor(s, sfDir), mfSchema)
    val kAll = mh.defaultHandle.stats.numDocs.toInt + 1
    MultiFieldSearcher.search(s, mh, query, kAll)
      .withColumn("r6", round($"score", 6))
      .orderBy($"r6".desc, $"docId".asc)
      .limit(10)
      .select($"docId".as("docid"), round($"score", 4).as("score"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2: corpus scan + derived shape + sha256 row invariant
    "ft_corpus" -> ((s, dir) => {
      CorpusSource.fromDocumentsTable(s, dir).toDF()
        .select(col("repo"), col("path"), col("commit"), col("lang"),
          sha2(col("content"), 256).as("sha"))
    }),
    // D1: deterministic dense docId assignment (docstats doubles as the
    // doc-key map)
    "ft_docids" -> ((s, dir) => {
      s.read.parquet(IndexBuilder.docstatsDir(indexFor(s, dir)))
        .select(col("docId").as("docid"), col("repo"), col("path"))
    }),
    // A1-A3: analysis chain with raw-stream positions (the doc-key map is
    // content-free, so tokens re-derive the stamped corpus in-flight)
    "ft_tokens" -> ((s, dir) => {
      import s.implicits._
      IndexBuilder.stampDocIds(CorpusSource.fromDocumentsTable(s, dir))
        .select($"docId", $"content").as[(Long, String)]
        .flatMap { case (id, c) =>
          Analyzer.tokenize(c).iterator.map(t => (id, t.pos.toLong, t.term))
        }
        .toDF("docid", "pos", "term")
    }),
    // analyzer registry: a non-default chain (char-3-gram tokenizer +
    // lowercase) over the same corpus — the schema-selectable analyzer
    // surface ([R] cockatrice/schema.py)
    "ft_tokens_ngram" -> ((s, dir) => {
      import s.implicits._
      val chain = new graft.analysis.Chain(
        graft.analysis.AnalyzerSpec(graft.analysis.NgramTok(3, 3),
          List(graft.analysis.LowerF)))
      IndexBuilder.stampDocIds(CorpusSource.fromDocumentsTable(s, dir))
        .select($"docId", $"content").as[(Long, String)]
        .flatMap { case (id, c) =>
          chain.tokenize(c).iterator.map(t => (id, t.pos.toLong, t.term))
        }
        .toDF("docid", "pos", "term")
    }),
    // ShingleFilter: word-bigram stream over the standard chain, positions
    // re-numbered by shingle ordinal
    "ft_tokens_shingle" -> ((s, dir) => {
      import s.implicits._
      val chain = new graft.analysis.Chain(graft.analysis.AnalyzerSpec(
        graft.analysis.StandardTok,
        List(graft.analysis.LowerF, graft.analysis.StopF(),
          graft.analysis.ShingleF(2))))
      IndexBuilder.stampDocIds(CorpusSource.fromDocumentsTable(s, dir))
        .select($"docId", $"content").as[(Long, String)]
        .flatMap { case (id, c) =>
          chain.tokenize(c).iterator.map(t => (id, t.pos.toLong, t.term))
        }
        .toDF("docid", "pos", "term")
    }),
    // A4-A5: per-doc post-filter length + lossy byte code (D2)
    "ft_doclen" -> ((s, dir) => {
      s.read.parquet(IndexBuilder.docstatsDir(indexFor(s, dir)))
        .select(col("docId").as("docid"), col("rawLen").cast("long").as("rawlen"),
          col("lenByte").cast("long").as("lenbyte"))
    }),
    // G1/G4: global lexicon (term -> corpus df + cf + global max tf, the
    // TermInfo triple — maxTf is the round-4 driver-side bound input)
    "ft_df" -> ((s, dir) => {
      s.read.parquet(IndexBuilder.lexiconDir(indexFor(s, dir)))
        .select(col("term"), col("df").cast("long").as("df"),
          col("cf").cast("long").as("cf"),
          col("maxTf").cast("long").as("maxtf"))
    }),
    // G3: corpus stats feeding BM25
    "ft_stats" -> ((s, dir) => {
      import s.implicits._
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(indexFor(s, dir)), s.sparkContext.hadoopConfiguration)
      val st = IndexBuilder.readStats(fs, indexFor(s, dir))
      Seq((st.numDocs, st.totalFieldLen)).toDF("n_docs", "total_len")
    }),
    // G1: per-(term,doc) tf — decoded straight from the posting blocks
    // (the D14 reserved pseudo rows are index machinery, not term stats)
    "ft_tf" -> ((s, dir) => {
      import s.implicits._
      s.read.parquet(IndexBuilder.segmentsDir(indexFor(s, dir)))
        .filter(col("term") >= graft.search.Q.RealTermMin)
        .select($"term", $"blocks").as[(String, Array[Byte])]
        .flatMap { case (term, blocks) =>
          graft.codec.PostingsCodec.decodeIterator(blocks)
            .map(p => (p.docId, term, p.tf.toLong))
        }
        .toDF("docid", "term", "tf")
    }),
    // Q2/Q7: single-term BM25 top-k (block-max skipped traversal)
    "ft_topk_term" -> ((s, dir) => topk(s, dir, "spark")),
    // Q3: AND intersection
    "ft_topk_and" -> ((s, dir) => topk(s, dir, "merge AND join")),
    // Q4: OR union (WAND path)
    "ft_topk_or" -> ((s, dir) => topk(s, dir, "vector OR stream OR dup")),
    // Q5: positional phrase
    "ft_topk_phrase" -> ((s, dir) => topk(s, dir, "\"table scan\"")),
    // Q5 repeated-term phrase + Q3 mix
    "ft_topk_mixed" -> ((s, dir) => topk(s, dir, "batch AND \"window window\"")),
    // Q6: NOT
    "ft_topk_not" -> ((s, dir) => topk(s, dir, "merge NOT join")),
    // stretch: prefix query (lexicon-expanded multiterm OR)
    "ft_topk_prefix" -> ((s, dir) => topk(s, dir, "s*")),
    // wildcard: prefix-narrowed lexicon scan + anchored regex
    "ft_topk_wildcard" -> ((s, dir) => topk(s, dir, "s*a*")),
    // term range (Whoosh TermRange, inclusive): pushed >=/<= lexicon scan
    "ft_topk_trange" -> ((s, dir) => topk(s, dir, "[qu TO sp]")),
    // exclusive-bracket range `{a TO b}` (both bounds excluded)
    "ft_topk_range_excl" -> ((s, dir) => topk(s, dir, "{merge TO sort}")),
    // open-ended range `[a TO]` (unbounded above)
    "ft_topk_range_open" -> ((s, dir) => topk(s, dir, "[sp TO]")),
    // GtLt sugar on a typed field: `size:>=v` == one-sided numeric range
    "ft_topk_numgt" -> ((s, dir) => mfTopk(s, dir, "size:>=400")),
    // fuzzy (Whoosh FuzzyTerm): banded Levenshtein <= 2, gram-pruned scan
    "ft_topk_fuzzy" -> ((s, dir) => topk(s, dir, "part~2")),
    // morphological variations ([W] whoosh Variations / morph_en, D16):
    // the candidate suffix family intersected with the lexicon (pushed IN)
    "ft_topk_variations" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val kAll = handle.stats.numDocs.toInt + 1
      Searcher.searchQ(s, handle, graft.search.QVariations("merge"), kAll)
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"docId".asc)
        .limit(10)
        .select($"docId".as("docid"), round($"score", 4).as("score"))
    }),
    // batch search: many queries, ONE job (union-pruned scan, shared
    // kernel pass per segment, per-query top-k window)
    "ft_search_many" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val kAll = handle.stats.numDocs.toInt + 1
      val res = Searcher.searchMany(s, handle,
        Seq("t" -> "spark", "a" -> "merge AND join", "p" -> "\"table scan\""), kAll)
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"qid")
        .orderBy(round($"score", 6).desc, $"docId".asc)
      res.withColumn("rn", row_number().over(w)).filter($"rn" <= 10)
        .select($"qid", $"docId".as("docid"), round($"score", 4).as("score"))
    }),
    // reader stats: top terms by collection frequency / by cf * idf
    "ft_top_terms" -> ((s, dir) => {
      val handle = Searcher.open(s, indexFor(s, dir))
      Searcher.mostFrequentTerms(s, handle, 10)
    }),
    "ft_distinctive_terms" -> ((s, dir) => {
      val handle = Searcher.open(s, indexFor(s, dir))
      Searcher.mostDistinctiveTerms(s, handle, 1 << 20)
        .withColumn("r6", round(col("score"), 6))
        .orderBy(col("r6").desc, col("term").asc)
        .limit(10)
        .select(col("term"), round(col("score"), 4).as("score"))
    }),
    // spelling suggestions (Whoosh suggest): (distance asc, df desc, term)
    "ft_suggest" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      Searcher.suggest(s, handle, "spask", k = 5)
        .toDF("term", "dist", "df")
        .select($"term", $"dist".cast("long").as("dist"), $"df")
    }),
    // query correction (Whoosh correct_query, D13): unknown terms replaced
    // by their top suggestion, then the corrected query runs as usual
    "ft_correct" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val q = Searcher.correctQuery(s, handle, "spask AND mege")
      val kAll = handle.stats.numDocs.toInt + 1
      Searcher.searchQ(s, handle, q, kAll)
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"docId".asc)
        .limit(10)
        .select($"docId".as("docid"), round($"score", 4).as("score"))
    }),
    // Whoosh AndMaybe: matches the left side, right side only boosts
    "ft_topk_andmaybe" -> ((s, dir) => topk(s, dir, "merge ANDMAYBE join")),
    // Whoosh Require: right side filters, only the left side scores
    "ft_topk_require" -> ((s, dir) => topk(s, dir, "merge REQUIRE join")),
    // query-time term boost (`term^2`, Whoosh parser surface):
    // effIdf = idf * boost, pinned in RefModel and the kernel alike
    "ft_topk_boost" -> ((s, dir) => topk(s, dir, "spark^2 OR merge")),
    // sloppy phrase `"a b"~N` (Whoosh Phrase(slop=N), decision D8): ordered
    // window chains, tf = distinct chain starts
    "ft_topk_slop" -> ((s, dir) => topk(s, dir, "\"merge join\"~3")),
    // span queries ([W] whoosh/spans.py, decision D15): spans filter the
    // match set, scoring is the wrapped compound's. Ordered near:
    "ft_topk_spannear" -> ((s, dir) => topk(s, dir, "merge ONEAR/3 join")),
    // unordered near (either side may come first within the window)
    "ft_topk_spannear_un" -> ((s, dir) => topk(s, dir, "merge NEAR/3 data")),
    // SpanContains (programmatic): merge..join windows containing a 'data'
    // position; intersection scoring (big + little)
    "ft_topk_spancontains" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val q = graft.search.QSpanContains(
        graft.search.QSpanNear(List(graft.search.QTerm("merge"),
          graft.search.QTerm("join")), 5, ordered = true),
        graft.search.QTerm("data"))
      val kAll = handle.stats.numDocs.toInt + 1
      Searcher.searchQ(s, handle, q, kAll)
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"docId".asc)
        .limit(10)
        .select($"docId".as("docid"), round($"score", 4).as("score"))
    }),
    // SpanBefore (programmatic): a 'scan' strictly before a 'sort'
    "ft_topk_spanbefore" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val q = graft.search.QSpanBefore(
        graft.search.QTerm("scan"), graft.search.QTerm("sort"))
      val kAll = handle.stats.numDocs.toInt + 1
      Searcher.searchQ(s, handle, q, kAll)
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"docId".asc)
        .limit(10)
        .select($"docId".as("docid"), round($"score", 4).as("score"))
    }),
    // SpanNot (programmatic, like Whoosh): merge..join windows with no
    // 'table' occurrence inside; scored by the incl side
    "ft_topk_spannot" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val q = graft.search.QSpanNot(
        graft.search.QSpanNear(List(graft.search.QTerm("merge"),
          graft.search.QTerm("join")), 5, ordered = true),
        graft.search.QTerm("table"))
      val kAll = handle.stats.numDocs.toInt + 1
      Searcher.searchQ(s, handle, q, kAll)
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"docId".asc)
        .limit(10)
        .select($"docId".as("docid"), round($"score", 4).as("score"))
    }),
    // SpanFirst (programmatic, [W] whoosh SpanFirst(q, limit) — round-5):
    // docs where a 'merge' occurrence ENDS before raw position 12
    "ft_topk_spanfirst" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val q = graft.search.QSpanFirst(graft.search.QTerm("merge"), 12)
      val kAll = handle.stats.numDocs.toInt + 1
      Searcher.searchQ(s, handle, q, kAll)
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"docId".asc)
        .limit(10)
        .select($"docId".as("docid"), round($"score", 4).as("score"))
    }),
    // ConstantScore ([W] whoosh ConstantScoreQuery — round-5): a pinned
    // 2.5 for every 'merge' doc, summed with join's ordinary BM25 in an OR
    "ft_topk_constscore" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val q = graft.search.QOr(List(
        graft.search.QConstantScore(graft.search.QTerm("merge"), 2.5),
        graft.search.QTerm("join")))
      val kAll = handle.stats.numDocs.toInt + 1
      Searcher.searchQ(s, handle, q, kAll)
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"docId".asc)
        .limit(10)
        .select($"docId".as("docid"), round($"score", 4).as("score"))
    }),
    // Otherwise ([W] whoosh qcore.Otherwise — round-5, pinned GLOBAL
    // resolution): branch a matches nothing in the corpus, so the engine's
    // index-wide existence probe must fall through to 'merge'
    "ft_topk_otherwise" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val q = graft.search.QOtherwise(
        graft.search.QTerm("zzzznomatchzzzz"), graft.search.QTerm("merge"))
      val kAll = handle.stats.numDocs.toInt + 1
      Searcher.searchQ(s, handle, q, kAll)
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"docId".asc)
        .limit(10)
        .select($"docId".as("docid"), round($"score", 4).as("score"))
    }),
    // pluggable weighting (reference search_documents(weighting=...)):
    // Whoosh TF_IDF = tf * idf, length-independent
    "ft_topk_tfidf" -> ((s, dir) =>
      topk(s, dir, "spark OR merge", graft.search.TfIdfWeighting)),
    // Whoosh Frequency weighting: score = raw tf (idf = 1, boost only)
    "ft_topk_freq" -> ((s, dir) =>
      topk(s, dir, "spark OR merge^2", graft.search.FrequencyWeighting)),
    // Whoosh FunctionWeighting (round-5): user-supplied scoring function;
    // the pinned LogTf instance — score = idf * (1 + ln tf)
    "ft_topk_funcw" -> ((s, dir) =>
      topk(s, dir, "spark OR merge", graft.search.FunctionWeighting.LogTf)),
    // match-all (Whoosh Every) via top-level pure negation: "NOT spark" ==
    // Every NOT spark, constant score 1.0, ties break by docid
    "ft_topk_every" -> ((s, dir) => topk(s, dir, "NOT spark")),
    // delete-by-query: tombstone every doc matching 'spark' (bulk
    // executor-side sidecar writes), live set = the rest
    "ft_delete_query" -> ((s, dir) => {
      val ix = deleteQueryIndexFor(s, dir)
      val dels = graft.build.Deletes.read(s, ix) // oracle-scale index only
      s.read.parquet(IndexBuilder.docstatsDir(ix))
        .filter(!col("docId").isin(dels.toSeq: _*))
        .select(col("docId").as("docid"), col("repo"), col("path"))
    }),
    // multi-field schema: field-qualified query over the two-field
    // (content + path) index, with a query boost on the path term
    "ft_topk_field" -> ((s, dir) => mfTopk(s, dir, "spark OR path:0000042.txt^2")),
    // numeric field type + range query: `size:[lo TO hi]` over the sortable
    // encoding; score per match = idf of the doc's own value group (fl=1)
    "ft_topk_numrange" -> ((s, dir) => mfTopk(s, dir, "size:[200 TO 260]")),
    // datetime field type + date range over encoded epoch millis
    "ft_topk_daterange" -> ((s, dir) =>
      mfTopk(s, dir, "mtime:[2020-02-01 TO 2020-02-28]")),
    // PathTokenizer field: the full-path query analyzes into the progressive
    // prefix phrase ("d", "d/NNN.txt") over path-tokenized positions
    "ft_topk_path" -> ((s, dir) =>
      mfTopk(s, dir, "spark OR dirs:d/0000042.txt^2")),
    // boolean field type: T/F keyword terms, here as an AND-side filter
    "ft_topk_bool" -> ((s, dir) => mfTopk(s, dir, "big:true AND spark")),
    // MultifieldParser analog: unqualified leaves hit content AND path
    // (per-leaf OR combine); 'spark' scores in content, the filename term
    // in path — neither exists in the other field's lexicon
    "ft_topk_multifield" -> ((s, dir) => {
      import s.implicits._
      val mh = MultiFieldSearcher.open(s, multiIndexFor(s, dir), mfSchema)
      val kAll = mh.defaultHandle.stats.numDocs.toInt + 1
      MultiFieldSearcher.searchMultifield(s, mh, "spark OR 0000042.txt", kAll,
          fields = Seq("content", "path"))
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"docId".asc)
        .limit(10)
        .select($"docId".as("docid"), round($"score", 4).as("score"))
    }),
    // upsert by unique key (put_document): re-putting changed docs
    // tombstones the old versions; live set reflects exactly the new text
    "ft_upsert" -> ((s, dir) => {
      val ix = upsertIndexFor(s, dir)
      val dels = graft.build.Deletes.read(s, ix) // oracle-scale index only
      s.read.parquet(IndexBuilder.docstatsDir(ix))
        .filter(!col("docId").isin(dels.toSeq: _*))
        .select(col("repo"), col("path"), col("sha"))
    }),
    // Bo1 key terms ([W] whoosh/classify.py) of a doc set, computed
    // relationally over the lexicon's collection frequencies (decision D11)
    "ft_key_terms" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val corpus = CorpusSource.fromDocumentsTable(s, dir)
      graft.search.KeyTerms.forDocs(s, handle, corpus, (0L until 10L), 1 << 20)
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"term".asc)
        .limit(10)
        .select($"term", round($"score", 4).as("score"))
    }),
    // more-like-this ([W] whoosh/searching.py more_like): OR of the source
    // doc's top-5 Bo1 key terms, each boosted by its score; source masked
    "ft_mlt" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val corpus = CorpusSource.fromDocumentsTable(s, dir)
      val q = graft.search.KeyTerms.moreLikeThisQuery(s, handle, corpus, 42L, 5)
      val kAll = handle.stats.numDocs.toInt + 1
      Searcher.searchQ(s, handle, q, kAll)
        .filter($"docId" =!= 42L)
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"docId".asc)
        .limit(10)
        .select($"docId".as("docid"), round($"score", 4).as("score"))
    }),
    // DisjunctionMax ([W] whoosh/query/compound.py, programmatic surface):
    // score = best matching clause (tiebreak 0 — Whoosh's default)
    "ft_topk_dismax" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val q = graft.search.QDisMax(List(
        graft.search.QTerm("spark"), graft.search.QTerm("merge"),
        graft.search.QTerm("join")))
      val kAll = handle.stats.numDocs.toInt + 1
      Searcher.searchQ(s, handle, q, kAll)
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"docId".asc)
        .limit(10)
        .select($"docId".as("docid"), round($"score", 4).as("score"))
    }),
    // field collapsing ([W] whoosh collapse): best hit per repo, then
    // global top-k
    "ft_collapse" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val kAll = handle.stats.numDocs.toInt + 1
      Searcher.searchCollapsed(s, handle, "merge", "repo", kAll)
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"docId".asc)
        .limit(10)
        .select($"docId".as("docid"), $"repo", round($"score", 4).as("score"))
    }),
    // matched terms per hit ([W] whoosh Results.matched_terms)
    "ft_matched_terms" -> ((s, dir) => {
      val handle = Searcher.open(s, indexFor(s, dir))
      Searcher.matchedTerms(s, handle, "merge OR join", (0L until 20L))
    }),
    // facet counts ([W] whoosh/sorting.py groupedby): every match of the
    // query counted per stored-field value
    "ft_facet_lang" -> ((s, dir) => {
      val handle = Searcher.open(s, indexFor(s, dir))
      Searcher.facetCounts(s, handle, "merge", "lang")
        .select(col("lang"), col("count").cast("long").as("cnt"))
    }),
    // combined groupedby + sortedby in ONE kernel pass (round-5): the
    // facet half of searchFaceted — one scored match pass serves this AND
    // the sorted hits (plan-asserted single pass in SparkIndexSpec)
    "ft_faceted" -> ((s, dir) => {
      val handle = Searcher.open(s, indexFor(s, dir))
      val fsr = Searcher.searchFaceted(s, handle, "merge", "lang",
        Seq("path" -> false), k = 10)
      val out = fsr.facets
        .select(col("lang"), col("count").cast("long").as("cnt"))
      out
    }),
    // sorted search ([W] whoosh/sorting.py sortedby): matches ordered by a
    // stored field instead of score
    "ft_sortedby" -> ((s, dir) => {
      val handle = Searcher.open(s, indexFor(s, dir))
      Searcher.searchSortedBy(s, handle, "merge", "path", asc = false, k = 10)
        .select(col("docId").as("docid"), col("path"))
    }),
    // RangeFacet ([W] whoosh/sorting.py): matches binned by a numeric
    // stored field — rawLen in [0, 10000) with gap 10, keyed by bucket lo
    "ft_facet_range" -> ((s, dir) => {
      val handle = Searcher.open(s, indexFor(s, dir))
      Searcher.facetRangeCounts(s, handle, "merge", "rawLen", 0, 10000, 10)
        .select(col("rawLen_lo").cast("long").as("bucket_lo"),
          col("count").cast("long").as("cnt"))
    }),
    // MultiFacet: compound (lang, repo) facet key over the match set
    "ft_facet_multi" -> ((s, dir) => {
      val handle = Searcher.open(s, indexFor(s, dir))
      Searcher.facetCountsMulti(s, handle, "merge", Seq("lang", "repo"))
        .select(col("lang"), col("repo"), col("count").cast("long").as("cnt"))
    }),
    // multi-key sortedby: (lang asc, path desc), docid tiebreak
    "ft_sortedby_multi" -> ((s, dir) => {
      val handle = Searcher.open(s, indexFor(s, dir))
      Searcher.searchSortedByKeys(s, handle, "merge",
          Seq("lang" -> true, "path" -> false), k = 10)
        .select(col("docId").as("docid"), col("lang"), col("path"))
    }),
    // highlighting ([W] whoosh/highlight.py, decision D12): token-window
    // fragments with merged islands, matches wrapped in <b>
    "ft_highlight" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val corpus = CorpusSource.fromDocumentsTable(s, dir)
      graft.search.Highlight.highlights(s, handle, corpus, "merge OR join",
          (0L until 20L), surround = 3, maxFrags = 2)
        .select($"docId".as("docid"), $"frag".cast("long").as("frag"),
          $"start_pos".cast("long"), $"end_pos".cast("long"),
          $"matches".cast("long").as("matches"), $"fragment")
    }),
    // WholeFragmenter + OrderByPosition through the generalized surface
    // (round-5): one fragment spanning each matching doc's full token
    // stream (SentenceFragmenter has no DuckDB key — the corpus carries no
    // sentence punctuation, so it would degenerate to this same whole-doc
    // shape; it is property-tested against a brute-force model instead)
    "ft_highlight_whole" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val corpus = CorpusSource.fromDocumentsTable(s, dir)
      graft.search.Highlight.highlightsEx(s, handle, corpus, "merge OR join",
          (0L until 20L), graft.search.Highlight.WholeFragmenter, maxFrags = 1,
          order = graft.search.Highlight.OrderByPosition)
        .select($"docId".as("docid"), $"frag".cast("long").as("frag"),
          $"start_pos".cast("long"), $"end_pos".cast("long"),
          $"matches".cast("long").as("matches"), $"fragment")
    }),
    // S3/S5: segment manifests — doc counts, posting-list row counts and
    // field-length sums cross-checked against the corpus-derived oracle
    // (digest/bytes are covered by the determinism and resume specs)
    "ft_segments" -> ((s, dir) => {
      import s.implicits._
      val ix = indexFor(s, dir)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(ix), s.sparkContext.hadoopConfiguration)
      IndexBuilder.readManifests(fs, ix)
        .map(m => (m.segId.toLong, m.docCount, m.postingRows, m.rawLenSum))
        .toDF("segid", "doc_count", "posting_rows", "rawlen_sum")
    }),
    // S4 as an API: point lookup of stored fields by docId
    "ft_doc_fetch" -> ((s, dir) => {
      val handle = Searcher.open(s, indexFor(s, dir))
      Searcher.getDocuments(s, handle, Seq(0L, 1L, 2L, 3L, 4L, 42L))
        .select(col("docId").as("docid"), col("repo"), col("path"),
          col("lang"), col("sha"))
    }),

    // ---- training-data pipeline operators over documents/embeddings ----
    // exact dedup: hash-groupBy canonicalization
    "dd_exact" -> ((s, dir) => Dedup.exact(docsTable(s, dir), "doc_id", "text")),
    // MinHash+LSH near-dup pairs; exact-Jaccard verified, so the output
    // equals the oracle's exhaustive pair scan above the threshold
    "dd_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(docsTable(s, dir), "doc_id", "text", threshold = 0.7)
        .orderBy(col("id_a"), col("id_b"))),
    // exact n-gram Jaccard pairs — same ground truth as the LSH path but
    // computed fully relationally (shared-shingle counts, no candidate
    // hashing); its oracle is the same exhaustive scan
    "dd_ngram_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docsTable(s, dir), "doc_id", "text", threshold = 0.7)
        .orderBy(col("id_a"), col("id_b"))),
    // passage-level duplicated spans (Lee et al. 2021 ExactSubstr family,
    // round-5): per doc, the 10-token windows whose exact text recurs in
    // >= 2 distinct docs, and the tokens those windows cover
    "dd_dupspans" -> ((s, dir) =>
      Dedup.dupSpanStats(docsTable(s, dir), "doc_id", "text", window = 10)
        .orderBy(col("id"))),
    // corpus-wide repeated-line removal (round-5): the testdata corpus has
    // no newlines, so ' table ' is the pinned literal line separator —
    // segments recurring >= 2 times corpus-wide are stripped, survivors
    // rejoined in order
    "dd_striplines" -> ((s, dir) =>
      Dedup.stripRepeatedLines(docsTable(s, dir), "doc_id", "text",
          minDf = 2, sep = " table ")
        .orderBy(col("id"))),
    // near-dup clusters: connected components over the LSH pair relation,
    // every non-singleton doc mapped to its component's canonical (min) id
    "dd_components" -> ((s, dir) =>
      Dedup.components(
        Dedup.minhashPairs(docsTable(s, dir), "doc_id", "text", threshold = 0.7))),
    // SimHash signatures + hamming-blocked pairs (binary codec not
    // SQL-expressible -> rows-only)
    "dd_simhash" -> ((s, dir) => Dedup.simhash(docsTable(s, dir), "doc_id", "text")),
    "dd_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(docsTable(s, dir), "doc_id", "text", maxHamming = 6)),
    // embedding-cosine near-dup pairs (exact; LSH-bucketed at scale)
    "dd_embed_pairs" -> ((s, dir) =>
      Similarity.cosinePairs(embTable(s, dir), "vec_id", "embedding", 0.45)),
    // brute-force cosine top-k around the vec_id=0 embedding
    "ann_cosine_topk" -> ((s, dir) => {
      import s.implicits._
      val q = queryVec(s, dir)
      Similarity.cosineTopK(embTable(s, dir), "vec_id", "embedding", q, 60)
        .withColumn("r6", round($"sim", 6))
        .orderBy($"r6".desc, $"id".asc)
        .limit(10)
        .select($"id", round($"sim", 4).as("sim"))
    }),
    // int8 scalar-quantized ADC scan (round-5): per-dim min/max
    // calibration, 8-bit codes, float query vs dequantized docs — the
    // 4x-less-bandwidth scan shape for 100 TB embedding tables
    "ann_sq8_topk" -> ((s, dir) => {
      import s.implicits._
      Similarity.sq8TopK(embTable(s, dir), "vec_id", "embedding",
          queryVec(s, dir), 60)
        .withColumn("r6", round($"sim", 6))
        .orderBy($"r6".desc, $"id".asc)
        .limit(10)
        .select($"id", round($"sim", 4).as("sim"))
    }),
    // SRP-bucketed ANN over the PERSISTED index (sig precomputed, table
    // sorted by it, probe = pushed sig IN over the radius ball); the oracle
    // replicates the signature + radius probe set in SQL and ranks the same
    // candidate set by exact cosine
    "ann_srp_topk" -> ((s, dir) => {
      import s.implicits._
      Similarity.srpTopKIndexed(s, annIndexFor(s, dir), queryVec(s, dir), 60)
        .withColumn("r6", round($"sim", 6))
        .orderBy($"r6".desc, $"id".asc)
        .limit(10)
        .select($"id", round($"sim", 4).as("sim"))
    }),
    // hybrid lexical x vector retrieval (round-5): the engine's BM25 hits
    // for 'spark' fused with exact cosine top-k around the vec_id=0
    // embedding via reciprocal-rank fusion (Fusion.rrf, kRrf=60); the
    // index docId maps to the embedding id through the stored path. Each
    // side is ranked exhaustively on round(score,6) with id tie-break (the
    // topk FP protocol) and contributes its top 30 to the fusion.
    "hy_rrf" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val kAll = handle.stats.numDocs.toInt + 1
      val idMap = s.read.parquet(IndexBuilder.docstatsDir(indexFor(s, dir)))
        .select(col("docId"), substring(col("path"), 3, 7).cast("long").as("id"))
      val lex = Searcher.search(s, handle, "spark", kAll)
        .join(idMap, Seq("docId"))
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"id".asc).limit(30)
        .select($"id", $"r6".as("score"))
      val vec = Similarity.cosineTopK(embTable(s, dir), "vec_id", "embedding",
          queryVec(s, dir), kAll)
        .withColumn("r6", round($"sim", 6))
        .orderBy($"r6".desc, $"id".asc).limit(30)
        .select($"id", $"r6".as("score"))
      Fusion.rrf(Seq(lex, vec))
        .select($"id", round($"rrf", 6).as("score"), $"n_lists")
        .orderBy($"score".desc, $"id".asc)
    }),
    // hard-negative mining (round-5): BM25 top-30 candidates for "spark",
    // drop the ones semantically close to the query embedding (sim >= 0.30)
    // — the (query, negative) training-pair shape
    "hn_mine" -> ((s, dir) => {
      import s.implicits._
      val handle = Searcher.open(s, indexFor(s, dir))
      val kAll = handle.stats.numDocs.toInt + 1
      val idMap = s.read.parquet(IndexBuilder.docstatsDir(indexFor(s, dir)))
        .select(col("docId"), substring(col("path"), 3, 7).cast("long").as("id"))
      val lex = Searcher.search(s, handle, "spark", kAll)
        .join(idMap, Seq("docId"))
        .withColumn("r6", round($"score", 6))
        .orderBy($"r6".desc, $"id".asc).limit(30)
        .select($"id", $"r6".as("score"))
      Fusion.hardNegatives(lex, embTable(s, dir), "vec_id", "embedding",
          queryVec(s, dir), simCutoff = 0.30)
        .select($"id", $"bm25_rank".cast("long").as("bm25_rank"),
          $"bm25_score", round($"sim", 4).as("sim"))
    }),
    // deterministic ICT positive pairs (round-5): pinned first-half crop as
    // pseudo-query, remainder as positive passage — the contrastive
    // retriever-training shape (pairs with < 2 tokens emit nothing)
    "ict_pairs" -> ((s, dir) =>
      graft.ops.Fusion.ictPairs(docsTable(s, dir), "doc_id", "text")
        .orderBy(col("id"))),
    // per-source data-card rollup (round-5): doc/token volumes + exact-dup
    // rate, CORPUS-WIDE dup counting exercised by planting 15 cross-source
    // copies (docs 0-14 re-labeled srcX at id+10000)
    "rp_source" -> ((s, dir) => {
      val d = docsTable(s, dir)
      val aug = d.unionByName(
        d.filter(col("doc_id") < 15)
          .withColumn("doc_id", col("doc_id") + 10000)
          .withColumn("source", lit("srcX")))
      graft.ops.Report.sourceStats(aug, "doc_id", "text", "source")
        .orderBy(col("grp"))
    }),
    // SemDeDup-style representative pruning (round-5): one survivor (min
    // id) per connected cosine>=0.45 near-dup group over the embeddings,
    // singletons untouched
    "dd_prune" -> ((s, dir) =>
      Dedup.keepRepresentatives(embTable(s, dir), "vec_id",
        Similarity.cosinePairs(embTable(s, dir), "vec_id", "embedding", 0.45))
        .orderBy(col("id"))),
    // PII-style redaction over deterministically augmented text (the
    // synthetic corpus has no PII, so both engines inject the same
    // email/IP/long-number suffix before scrubbing)
    "ql_redact" -> ((s, dir) => {
      val aug = docsTable(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" contact u"), col("doc_id"), lit("@ex"),
          col("doc_id") % 7, lit(".com at 10.0."), col("doc_id") % 256,
          lit(".1 id 1234567890"), col("doc_id")).as("text"))
      TextQuality.redact(aug, "doc_id", "text")
    }),
    // LM-pretraining sequence packing plan (round-5): concat-then-chunk at
    // capacity 512 over ascending doc_id; distributed prefix sum (range
    // repartition + broadcast per-partition offsets), no global window
    "pk_plan" -> ((s, dir) =>
      Packing.packPlan(docsTable(s, dir), "doc_id", "text", 512)
        .orderBy(col("id"))),
    // C4-style line filters (round-5): the synthetic corpus has no line
    // structure or punctuation, so both engines apply the same
    // deterministic augmentation first (the ql_redact precedent): 'the '
    // -> 'the.\n' (line breaks with terminal punctuation), plus pinned
    // lorem-ipsum / brace suffixes on doc_id % 11 / % 7
    "ql_c4lines" -> ((s, dir) => {
      val aug = docsTable(s, dir).select(col("doc_id"),
        concat(
          regexp_replace(col("text"), "the ", "the.\n"),
          when(col("doc_id") % 11 === 0, lit(" lorem ipsum")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit(" {")).otherwise(lit("")))
          .as("text"))
      TextQuality.lineStats(aug, "doc_id", "text").orderBy(col("id"))
    }),
    // Stack/StarCoder-style code-file quality filters (round-5) over the
    // derived code shape; same deterministic-augmentation precedent as
    // ql_c4lines ('the ' -> 'the\n' line breaks, pinned autogen-marker /
    // base64-run / 1200-char-line suffixes on doc_id moduli)
    "cq_stats" -> ((s, dir) => {
      val aug = docsTable(s, dir).select(
        format_string("r%02d", col("doc_id") % 97).as("repo"),
        format_string("d/%07d.txt", col("doc_id")).as("path"),
        col("lang"),
        concat(
          regexp_replace(col("text"), "the ", "the\n"),
          when(col("doc_id") % 13 === 0, lit(" do not edit")).otherwise(lit("")),
          when(col("doc_id") % 17 === 0, concat(lit(" "), repeat(lit("Ab0+"), 20)))
            .otherwise(lit("")),
          when(col("doc_id") % 19 === 0, concat(lit(" "), repeat(lit("x"), 1200)))
            .otherwise(lit("")))
          .as("content"))
      CodeQuality.stats(aug, "content", "repo", "path", "lang")
        .orderBy(col("repo"), col("path"))
    }),
    // deterministic content-addressed split/sample (train/val/test by
    // sha256 bucket: duplicate texts land in the SAME split - no leakage)
    "sp_split" -> ((s, dir) =>
      graft.ops.Sampling.contentSplit(docsTable(s, dir), "doc_id", "text")
        .select(col("id"), col("bucket").cast("long").as("bucket"), col("split"))),
    "sp_sample" -> ((s, dir) =>
      graft.ops.Sampling.contentSample(docsTable(s, dir), "text", 250)
        .select(col("doc_id").cast("long").as("id"))),
    // stratified deterministic sampling (round-5): per-lang keep rates over
    // the same content-addressed buckets (en 600 / de 200 / rest 50 per
    // mille) — a stratum's sample == contentSample(rate) of that stratum
    "sp_stratified" -> ((s, dir) =>
      graft.ops.Sampling.contentSampleStratified(docsTable(s, dir), "lang",
          "text", Map("en" -> 600, "de" -> 200), defaultPerMille = 50)
        .select(col("doc_id").cast("long").as("id"), col("lang"))),
    // benchmark decontamination: flag docs sharing any 5-gram with the
    // "eval set" (docs 0..9) — the n-gram-collision scrub
    "dc_ngram_overlap" -> ((s, dir) =>
      Decontam.flagNgramOverlap(docsTable(s, dir), "doc_id", "text",
        docsTable(s, dir).filter(col("doc_id") < 10), "text", n = 5)),
    // Bloom-prefiltered decontamination (round-5): the large-eval-set
    // path — broadcast Bloom probe gates the corpus side before the exact
    // shuffle join; output bit-identical to dc_ngram_overlap
    "dc_bloom" -> ((s, dir) =>
      Decontam.flagNgramOverlapBloom(docsTable(s, dir), "doc_id", "text",
        docsTable(s, dir).filter(col("doc_id") < 10), "text", n = 5,
        expectedNgrams = 1L << 16)),
    // per-source quota cap (round-5): keep the 10 highest-n_chars docs per
    // source (RefinedWeb-style per-domain cap), bounded-heap aggregation
    "sp_cap" -> ((s, dir) =>
      graft.ops.Quota.capPerGroup(docsTable(s, dir), "source", "doc_id",
          "n_chars", 10)
        .orderBy(col("grp"), col("rank"))),
    // DSIR-style hashed n-gram importance weights (round-5): target =
    // docs 0..49, raw = whole corpus; hashed unigram+bigram buckets,
    // Laplace-smoothed log density ratio per doc
    "sl_dsir" -> ((s, dir) =>
      graft.ops.Selection.dsirLogWeights(docsTable(s, dir),
        docsTable(s, dir).filter(col("doc_id") < 50), "doc_id", "text")),
    // CCNet-style per-language perplexity bands (round-5): unigram-logprob
    // score, per-lang equal-depth terciles, head/middle/tail labels
    "sl_ppl_bucket" -> ((s, dir) =>
      graft.ops.Selection.pplBuckets(docsTable(s, dir), "doc_id", "text",
          "lang")
        .select(col("id"), col("lang"), col("logprob"),
          col("bucket").cast("long").as("bucket"), col("band"))),
    // unigram log-probability scoring (relational LM-quality stand-in)
    "ql_unigram" -> ((s, dir) =>
      TextQuality.unigramLogProb(docsTable(s, dir), "doc_id", "text")),
    // interpolated bigram LM scoring (round-5): lambda*P(w|prev) +
    // (1-lambda)*P(w) under the corpus's own MLE counts, mean ln p per doc
    "ql_bigram" -> ((s, dir) =>
      TextQuality.bigramLogProb(docsTable(s, dir), "doc_id", "text")),
    // token-budget mixture sampling (round-5): per-source token budgets ->
    // pinned integer per-mille keep rates over content-addressed buckets
    // (src0 partial, src1 capped at 1000, src2 tiny; others dropped)
    "mx_sample" -> ((s, dir) =>
      graft.ops.Sampling.tokenBudgetSample(docsTable(s, dir), "doc_id",
          "text", "source",
          Map("src0" -> 700L, "src1" -> 2000L, "src2" -> 100L))
        .orderBy(col("id"))),
    // sparse TF-IDF featurizer, long form (round-5): smoothed idf + the
    // L2-normalized weights cosine similarity consumes
    "ql_tfidf" -> ((s, dir) =>
      TextQuality.tfidfTerms(docsTable(s, dir), "doc_id", "text")),
    // Gopher-style repetition filters: top-2-gram + duplicate-5-gram
    // fractions (degenerate/boilerplate detectors)
    "ql_repetition" -> ((s, dir) =>
      TextQuality.repetitionStats(docsTable(s, dir), "doc_id", "text")),
    // text analysis: token counting, quality scoring, language id,
    // winnowing-style fingerprint
    "ql_tokens" -> ((s, dir) => TextQuality.tokenCounts(docsTable(s, dir), "doc_id", "text")),
    "ql_quality" -> ((s, dir) => TextQuality.qualityScore(docsTable(s, dir), "doc_id", "text")),
    "ql_lang" -> ((s, dir) => TextQuality.langId(docsTable(s, dir), "doc_id", "text")),
    "ql_fingerprint" -> ((s, dir) => TextQuality.fingerprint(docsTable(s, dir), "doc_id", "text")),
    // multimodal plumbing: binary payload column -> batched feature extract
    // (decode step is a deterministic stub — a 16-bin byte histogram — whose
    // bin counts the oracle recovers exactly: count = round(f * byteLen))
    "mm_features" -> ((s, dir) => {
      import s.implicits._
      Multimodal.extractFeatures(
        Multimodal.fakeMediaTable(docsTable(s, dir), "doc_id", "text"))
        .map { f =>
          def cnt(j: Int): Long = math.round(f.features(j).toDouble * f.byteLen)
          (f.id, f.kind, f.byteLen, f.features.length.toLong,
            cnt(0), cnt(2), cnt(6), cnt(7))
        }
        .toDF("id", "kind", "byte_len", "feature_dim", "h0", "h2", "h6", "h7")
    })
  )

  private def docsTable(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"$sfDir/documents.parquet")
  private def embTable(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"$sfDir/embeddings.parquet")
  /** persisted SRP ANN index per sfDir (built once, probed by the key) */
  private val builtAnn = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def annIndexFor(s: SparkSession, sfDir: String): String =
    builtAnn.computeIfAbsent(sfDir, { _ =>
      val dir = s"/tmp/graft-annindex-$FormatVersion-" +
        sfDir.replaceAll("[^A-Za-z0-9.]", "_")
      Similarity.buildAnnIndex(embTable(s, sfDir), "vec_id", "embedding", dir)
      dir
    })

  private val qvCache = new java.util.concurrent.ConcurrentHashMap[String, Array[Float]]()
  private def queryVec(s: SparkSession, sfDir: String): Array[Float] =
    qvCache.computeIfAbsent(sfDir, { _ =>
      embTable(s, sfDir).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
    })

  // ---------------------------------------------------------------- oracle

  private val StopList = Analyzer.StopWords.toSeq.sorted.map(w => s"'$w'").mkString(",")

  /** shared DuckDB CTE: corpus derivation, docids, analysis chain, length
    * codec (integer-exact lookup table), BM25 ingredients */
  private def cte: String =
    s"""WITH corpus AS (
       |  SELECT printf('r%02d', doc_id % 97) AS repo,
       |         printf('d/%07d.txt', doc_id) AS path,
       |         printf('%040x', doc_id) AS "commit",
       |         lang, text AS content
       |  FROM documents
       |), ids AS (
       |  SELECT row_number() OVER (ORDER BY repo, path, "commit") - 1 AS docid,
       |         repo, path, "commit" AS chex, lang, content
       |  FROM corpus
       |), rawtoks AS (
       |  SELECT docid,
       |         unnest(regexp_extract_all(lower(content), '\\w+(\\.?\\w+)*')) AS term,
       |         unnest(range(len(regexp_extract_all(lower(content), '\\w+(\\.?\\w+)*')))) AS pos
       |  FROM ids
       |), tokens AS (
       |  SELECT docid, term, pos FROM rawtoks
       |  WHERE length(term) >= 2 AND term NOT IN ($StopList)
       |), doclen AS (
       |  SELECT i.docid, count(t.term)::BIGINT AS rawlen
       |  FROM ids i LEFT JOIN tokens t ON i.docid = t.docid
       |  GROUP BY i.docid
       |), bytes AS (
       |  SELECT i AS b,
       |         CASE WHEN i < 128 THEN i
       |              ELSE (128 + ((i-128)%16)*8) * (1 << ((i-128)//16)) END AS lo
       |  FROM range(0,256) t(i)
       |), flens AS (
       |  SELECT d.docid, d.rawlen,
       |         (SELECT max(b) FROM bytes WHERE lo <= d.rawlen) AS lenbyte,
       |         (SELECT lo FROM bytes
       |           WHERE b = (SELECT max(b) FROM bytes WHERE lo <= d.rawlen)) AS fl
       |  FROM doclen d
       |), params AS (
       |  SELECT count(*)::BIGINT AS n, sum(rawlen)::BIGINT AS total,
       |         sum(rawlen)::DOUBLE / count(*) AS avgfl
       |  FROM flens
       |), tf AS (
       |  SELECT docid, term, count(*)::BIGINT AS tf FROM tokens GROUP BY docid, term
       |), dft AS (
       |  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
       |), contrib AS (
       |  SELECT f.docid, f.term,
       |         (ln(p.n::DOUBLE / (d.df + 1.0)) + 1.0)
       |           * (f.tf * 2.2)
       |           / (f.tf + 1.2 * (0.25 + 0.75 * fl.fl / p.avgfl)) AS s
       |  FROM tf f
       |  JOIN dft d USING (term)
       |  JOIN flens fl ON fl.docid = f.docid
       |  CROSS JOIN params p
       |)""".stripMargin

  private def idfOf(term: String): String =
    s"(SELECT ln((SELECT n FROM params)::DOUBLE / (df + 1.0)) + 1.0 FROM dft WHERE term = '$term')"

  /** BM25 of a phrase (list of (term, rawOffset)): adjacency join on raw
    * positions, tf = #matching starts, idf = per-occurrence sum (D3) */
  private def phraseScoreSql(ts: Seq[(String, Int)]): String = {
    val joins = ts.zipWithIndex.drop(1).map { case ((t, off), i) =>
      s"JOIN tokens t$i ON t$i.docid = t0.docid AND t$i.pos = t0.pos + $off AND t$i.term = '$t'"
    }.mkString(" ")
    val sumIdf = ts.map { case (t, _) => idfOf(t) }.mkString(" + ")
    s"""(SELECT m.docid, ($sumIdf) * (m.ptf * 2.2)
       | / (m.ptf + 1.2 * (0.25 + 0.75 * fl.fl / (SELECT avgfl FROM params))) AS s
       | FROM (SELECT t0.docid, count(*)::BIGINT AS ptf
       |       FROM tokens t0 $joins
       |       WHERE t0.term = '${ts.head._1}' GROUP BY t0.docid) m
       | JOIN flens fl ON fl.docid = m.docid)""".stripMargin.replace("\n", " ")
  }

  /** collection frequency CTE + the pinned Bo1 arithmetic (decision D11) —
    * parenthesized exactly as KeyTerms computes it, so scores bit-compare
    * under the r4/r6 protocol */
  private val CftCte = ", cft AS (SELECT term, sum(tf)::BIGINT AS cf FROM tf GROUP BY term)"
  private def bo1Sql(w: String): String =
    s"$w * (ln((1.0 + c.cf::DOUBLE / p.n) / (c.cf::DOUBLE / p.n)) / ln(2.0))" +
      s" + (ln(1.0 + c.cf::DOUBLE / p.n) / ln(2.0))"

  private def rank(inner: String): String =
    s"SELECT docid, round(rawscore, 4) AS score " +
      s"FROM (SELECT docid, score AS rawscore, round(score, 6) AS r6 FROM ($inner) q) qq " +
      "ORDER BY r6 DESC, docid ASC LIMIT 10"

  def oracleSql: Map[String, String] = Map(
    "ft_corpus" ->
      s"""$cte SELECT repo, path, "commit", lang, sha256(content) AS sha FROM corpus""",
    "ft_docids" ->
      s"$cte SELECT docid, repo, path FROM ids",
    "ft_tokens" ->
      s"$cte SELECT docid, pos, term FROM tokens",
    "ft_tokens_ngram" ->
      (cte + """ SELECT docid,
        | unnest([i - 1 FOR i IN range(1, length(content) - 1)]) AS pos,
        | unnest([substr(lower(content), i, 3) FOR i IN range(1, length(content) - 1)]) AS term
        | FROM ids""".stripMargin.replace("\n", " ")),
    "ft_doclen" ->
      s"$cte SELECT docid, rawlen, lenbyte::BIGINT AS lenbyte FROM flens",
    "ft_df" ->
      (s"$cte SELECT d.term, d.df, c.cf, c.maxtf FROM dft d JOIN " +
        "(SELECT term, sum(tf)::BIGINT AS cf, max(tf)::BIGINT AS maxtf " +
        "FROM tf GROUP BY term) c USING (term)"),
    "ft_stats" ->
      s"$cte SELECT n AS n_docs, total AS total_len FROM params",
    "ft_tf" ->
      s"$cte SELECT docid, term, tf FROM tf",
    "ft_topk_term" -> (cte + " " + rank(
      "SELECT docid, s AS score FROM contrib WHERE term = 'spark'")),
    "ft_topk_and" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM contrib WHERE term IN ('merge','join')
        | GROUP BY docid HAVING count(*) = 2""".stripMargin.replace("\n", " "))),
    "ft_topk_or" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM contrib
        | WHERE term IN ('vector','stream','dup') GROUP BY docid"""
        .stripMargin.replace("\n", " "))),
    "ft_topk_phrase" -> (cte + " " + rank(
      s"SELECT docid, s AS score FROM ${phraseScoreSql(Seq("table" -> 0, "scan" -> 1))} ph")),
    "ft_topk_mixed" -> (cte + " " + rank(
      s"""SELECT c.docid, c.s + ph.s AS score
         | FROM (SELECT docid, s FROM contrib WHERE term = 'batch') c
         | JOIN ${phraseScoreSql(Seq("window" -> 0, "window" -> 1))} ph ON ph.docid = c.docid"""
        .stripMargin.replace("\n", " "))),
    "ft_topk_not" -> (cte + " " + rank(
      """SELECT docid, s AS score FROM contrib WHERE term = 'merge'
        | AND docid NOT IN (SELECT docid FROM contrib WHERE term = 'join')"""
        .stripMargin.replace("\n", " "))),

    "ft_topk_prefix" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM contrib WHERE term LIKE 's%'
        | GROUP BY docid""".stripMargin.replace("\n", " "))),
    "ft_topk_wildcard" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM contrib
        | WHERE regexp_matches(term, '^s.*a.*$') GROUP BY docid"""
        .stripMargin.replace("\n", " "))),
    "ft_topk_trange" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM contrib
        | WHERE term >= 'qu' AND term <= 'sp' GROUP BY docid"""
        .stripMargin.replace("\n", " "))),
    "ft_topk_range_excl" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM contrib
        | WHERE term > 'merge' AND term < 'sort' GROUP BY docid"""
        .stripMargin.replace("\n", " "))),
    "ft_topk_range_open" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM contrib
        | WHERE term >= 'sp' GROUP BY docid""".stripMargin.replace("\n", " "))),
    // size:>=400 over the numeric field: one encoded term per doc
    // (fl = avgfl = 1), contribution = idf of the doc's value group. The
    // IN-subquery models the QMulti.MaxExpand=128 expansion cap: the
    // sortable encoding orders by value, so the engine expands exactly the
    // 128 SMALLEST distinct matching values (91 at sf0.01 — cap inactive
    // there, but the oracle now stays faithful at any scale factor)
    "ft_topk_numgt" -> (cte + " " + rank(
      """SELECT i.docid,
        |  ln((SELECT n FROM params)::DOUBLE / (c.cnt + 1.0)) + 1.0 AS score
        | FROM ids i
        | JOIN (SELECT length(content) AS len, count(*)::BIGINT AS cnt
        |       FROM ids GROUP BY 1) c ON c.len = length(i.content)
        | WHERE length(i.content) IN (
        |   SELECT len FROM (SELECT DISTINCT length(content) AS len FROM ids
        |     WHERE length(content) >= 400 ORDER BY len ASC LIMIT 128) v)"""
        .stripMargin.replace("\n", " "))),
    "ft_topk_fuzzy" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM contrib
        | WHERE abs(length(term) - 4) <= 2 AND levenshtein(term, 'part') <= 2
        | GROUP BY docid""".stripMargin.replace("\n", " "))),
    // variations (D16): the candidate family for 'merge' HARD-CODED (round-5
    // advice: embedding QVariations.candidates would let a rule-set bug pass
    // the harness — the pinned D16 expansion of 'merge' is exactly this set,
    // so the oracle now gates the rules too)
    "ft_topk_variations" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM contrib WHERE term IN
        | ('merge','merged','mergees','mergeing','merges','merging')
        | GROUP BY docid""".stripMargin.replace("\n", " "))),
    // batch search: three independent rank queries tagged by qid
    "ft_search_many" -> (cte +
      s" SELECT 't' AS qid, docid, score FROM (${rank(
        "SELECT docid, s AS score FROM contrib WHERE term = 'spark'")}) u1" +
      s" UNION ALL SELECT 'a' AS qid, docid, score FROM (${rank(
        "SELECT docid, sum(s) AS score FROM contrib WHERE term IN ('merge','join')" +
          " GROUP BY docid HAVING count(*) = 2")}) u2" +
      s" UNION ALL SELECT 'p' AS qid, docid, score FROM (${rank(
        s"SELECT docid, s AS score FROM ${phraseScoreSql(Seq("table" -> 0, "scan" -> 1))} ph")}) u3"),
    // reader stats over the analyzed corpus
    "ft_top_terms" -> (cte + CftCte +
      " SELECT term, cf FROM cft ORDER BY cf DESC, term ASC LIMIT 10"),
    "ft_distinctive_terms" -> (cte + CftCte +
      """ SELECT term, round(rawscore, 4) AS score
        | FROM (SELECT term, score AS rawscore, round(score, 6) AS r6
        |   FROM (SELECT c.term, c.cf::DOUBLE * (ln(p.n::DOUBLE / (d.df + 1.0)) + 1.0) AS score
        |         FROM cft c JOIN dft d USING (term) CROSS JOIN params p) x) y
        | ORDER BY r6 DESC, term ASC LIMIT 10""".stripMargin.replace("\n", " ")),
    "ft_suggest" -> (cte +
      """ SELECT term, levenshtein(term, 'spask')::BIGINT AS dist, df FROM dft
        | WHERE abs(length(term) - 5) <= 2 AND levenshtein(term, 'spask') <= 2
        | ORDER BY dist ASC, df DESC, term ASC LIMIT 5"""
        .stripMargin.replace("\n", " ")),

    // correction replicated end-to-end: top-1 suggestion per unknown term
    // (the suggest ranking), then the corrected AND scores as usual
    "ft_correct" -> (cte +
      """, c1 AS (SELECT term FROM dft
        |  WHERE abs(length(term) - 5) <= 2 AND levenshtein(term, 'spask') <= 2
        |  ORDER BY levenshtein(term, 'spask') ASC, df DESC, term ASC LIMIT 1),
        |c2 AS (SELECT term FROM dft
        |  WHERE abs(length(term) - 4) <= 2 AND levenshtein(term, 'mege') <= 2
        |  ORDER BY levenshtein(term, 'mege') ASC, df DESC, term ASC LIMIT 1)
        |""".stripMargin.replace("\n", " ") +
      rank(
        """SELECT docid, sum(s) AS score FROM contrib
          | WHERE term IN (SELECT term FROM c1 UNION ALL SELECT term FROM c2)
          | GROUP BY docid HAVING count(*) = 2""".stripMargin.replace("\n", " "))),
    "ft_topk_andmaybe" -> (cte + " " + rank(
      """SELECT m.docid, m.s + coalesce(j.s, 0.0) AS score
        | FROM (SELECT docid, s FROM contrib WHERE term = 'merge') m
        | LEFT JOIN (SELECT docid, s FROM contrib WHERE term = 'join') j
        | USING (docid)""".stripMargin.replace("\n", " "))),
    "ft_topk_require" -> (cte + " " + rank(
      """SELECT docid, s AS score FROM contrib WHERE term = 'merge'
        | AND docid IN (SELECT docid FROM contrib WHERE term = 'join')"""
        .stripMargin.replace("\n", " "))),
    // sloppy phrase (D8): ordered 2-term chain, gap in [1, slop]; tf =
    // distinct first-term positions with a partner in the window
    "ft_topk_slop" -> (cte + " " + rank(
      s"""SELECT m.docid, (${idfOf("merge")} + ${idfOf("join")}) * (m.ptf * 2.2)
         | / (m.ptf + 1.2 * (0.25 + 0.75 * fl.fl / (SELECT avgfl FROM params))) AS score
         | FROM (SELECT t0.docid, count(DISTINCT t0.pos)::BIGINT AS ptf
         |       FROM tokens t0 JOIN tokens t1 ON t1.docid = t0.docid
         |         AND t1.term = 'join' AND t1.pos > t0.pos AND t1.pos <= t0.pos + 3
         |       WHERE t0.term = 'merge' GROUP BY t0.docid) m
         | JOIN flens fl ON fl.docid = m.docid""".stripMargin.replace("\n", " "))),
    // ordered span near (D15): doc matches iff a merge->join position pair
    // with gap in [1,3] exists; score = the two terms' ordinary BM25 sum
    "ft_topk_spannear" -> (cte + " " + rank(
      """SELECT c.docid, sum(c.s) AS score FROM contrib c
        | WHERE c.term IN ('merge','join') AND c.docid IN (
        |   SELECT t0.docid FROM tokens t0 JOIN tokens t1 ON t1.docid = t0.docid
        |     AND t1.term = 'join' AND t1.pos - t0.pos BETWEEN 1 AND 3
        |   WHERE t0.term = 'merge')
        | GROUP BY c.docid""".stripMargin.replace("\n", " "))),
    // unordered span near: either order within the window
    "ft_topk_spannear_un" -> (cte + " " + rank(
      """SELECT c.docid, sum(c.s) AS score FROM contrib c
        | WHERE c.term IN ('merge','data') AND c.docid IN (
        |   SELECT t0.docid FROM tokens t0 JOIN tokens t1 ON t1.docid = t0.docid
        |     AND t1.term = 'data' AND abs(t1.pos - t0.pos) BETWEEN 1 AND 3
        |   WHERE t0.term = 'merge')
        | GROUP BY c.docid""".stripMargin.replace("\n", " "))),
    // span not: a merge..join window (gap in [1,5]) containing NO 'table'
    // position survives; scored by the incl side's terms only
    "ft_topk_spannot" -> (cte + " " + rank(
      """SELECT c.docid, sum(c.s) AS score FROM contrib c
        | WHERE c.term IN ('merge','join') AND c.docid IN (
        |   SELECT t0.docid FROM tokens t0 JOIN tokens t1 ON t1.docid = t0.docid
        |     AND t1.term = 'join' AND t1.pos - t0.pos BETWEEN 1 AND 5
        |   WHERE t0.term = 'merge' AND NOT EXISTS (
        |     SELECT 1 FROM tokens t2 WHERE t2.docid = t0.docid
        |       AND t2.term = 'table' AND t2.pos BETWEEN t0.pos AND t1.pos))
        | GROUP BY c.docid""".stripMargin.replace("\n", " "))),
    // span contains: a merge..join window (gap in [1,5]) CONTAINING a
    // 'data' position; both sides required -> all three terms score
    "ft_topk_spancontains" -> (cte + " " + rank(
      """SELECT c.docid, sum(c.s) AS score FROM contrib c
        | WHERE c.term IN ('merge','join','data') AND c.docid IN (
        |   SELECT t0.docid FROM tokens t0 JOIN tokens t1 ON t1.docid = t0.docid
        |     AND t1.term = 'join' AND t1.pos - t0.pos BETWEEN 1 AND 5
        |   WHERE t0.term = 'merge' AND EXISTS (
        |     SELECT 1 FROM tokens t2 WHERE t2.docid = t0.docid
        |       AND t2.term = 'data' AND t2.pos BETWEEN t0.pos AND t1.pos))
        | GROUP BY c.docid""".stripMargin.replace("\n", " "))),
    // span before: some 'scan' occurrence strictly before a 'sort'
    "ft_topk_spanbefore" -> (cte + " " + rank(
      """SELECT c.docid, sum(c.s) AS score FROM contrib c
        | WHERE c.term IN ('scan','sort') AND c.docid IN (
        |   SELECT t0.docid FROM tokens t0 JOIN tokens t1 ON t1.docid = t0.docid
        |     AND t1.term = 'sort' AND t0.pos < t1.pos
        |   WHERE t0.term = 'scan')
        | GROUP BY c.docid""".stripMargin.replace("\n", " "))),
    // span first (round-5): a 'merge' occurrence ending before raw pos 12;
    // spans only filter — score = the term's ordinary BM25 contribution
    "ft_topk_spanfirst" -> (cte + " " + rank(
      """SELECT c.docid, c.s AS score FROM contrib c
        | WHERE c.term = 'merge' AND c.docid IN (
        |   SELECT docid FROM tokens WHERE term = 'merge' AND pos < 12)"""
        .stripMargin.replace("\n", " "))),
    // constant score (round-5): merge docs pinned to 2.5, OR-summed with
    // join's ordinary contribution
    "ft_topk_constscore" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM (
        |   SELECT docid, 2.5 AS s FROM contrib WHERE term = 'merge'
        |   UNION ALL SELECT docid, s FROM contrib WHERE term = 'join') u
        | GROUP BY docid""".stripMargin.replace("\n", " "))),
    // otherwise (round-5, global resolution): branch a is corpus-absent, so
    // the CASE (the SQL mirror of the index-wide existence probe) routes
    // every doc to branch b
    "ft_topk_otherwise" -> (cte + " " + rank(
      """SELECT docid, s AS score FROM contrib WHERE term =
        | CASE WHEN EXISTS (SELECT 1 FROM contrib WHERE term = 'zzzznomatchzzzz')
        |      THEN 'zzzznomatchzzzz' ELSE 'merge' END"""
        .stripMargin.replace("\n", " "))),
    // TF_IDF weighting: score = sum over matching terms of idf * tf
    "ft_topk_tfidf" -> (cte + " " + rank(
      """SELECT f.docid, sum((ln(p.n::DOUBLE / (d.df + 1.0)) + 1.0) * f.tf) AS score
        | FROM tf f JOIN dft d USING (term) CROSS JOIN params p
        | WHERE f.term IN ('spark','merge') GROUP BY f.docid"""
        .stripMargin.replace("\n", " "))),
    // FunctionWeighting LogTf: per-term contribution = idf * (1 + ln tf)
    "ft_topk_funcw" -> (cte + " " + rank(
      """SELECT f.docid, sum((ln(p.n::DOUBLE / (d.df + 1.0)) + 1.0) * (1.0 + ln(f.tf))) AS score
        | FROM tf f JOIN dft d USING (term) CROSS JOIN params p
        | WHERE f.term IN ('spark','merge') GROUP BY f.docid"""
        .stripMargin.replace("\n", " "))),
    // Frequency weighting: per-term contribution = boost * tf
    "ft_topk_freq" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM (
        |  SELECT docid, (1.0 * tf)::DOUBLE AS s FROM tf WHERE term = 'spark'
        |  UNION ALL
        |  SELECT docid, (2.0 * tf)::DOUBLE AS s FROM tf WHERE term = 'merge'
        |) u GROUP BY docid""".stripMargin.replace("\n", " "))),
    "ft_topk_boost" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM (
        |  SELECT f.docid, (2.0 * (ln(p.n::DOUBLE / (d.df + 1.0)) + 1.0)) * (f.tf * 2.2)
        |      / (f.tf + 1.2 * (0.25 + 0.75 * fl.fl / p.avgfl)) AS s
        |  FROM tf f JOIN dft d USING (term) JOIN flens fl ON fl.docid = f.docid
        |  CROSS JOIN params p WHERE f.term = 'spark'
        |  UNION ALL
        |  SELECT docid, s FROM contrib WHERE term = 'merge'
        |) u GROUP BY docid""".stripMargin.replace("\n", " "))),
    // Every-based pure negation: constant score 1.0 per surviving doc
    "ft_topk_every" -> (cte + " " + rank(
      """SELECT docid, 1.0 AS score FROM ids WHERE docid NOT IN
        | (SELECT DISTINCT docid FROM tokens WHERE term = 'spark')"""
        .stripMargin.replace("\n", " "))),
    // delete-by-query 'spark': live docs = those without the token
    "ft_delete_query" -> (cte +
      """ SELECT docid, repo, path FROM ids WHERE docid NOT IN
        | (SELECT DISTINCT docid FROM tokens WHERE term = 'spark')"""
        .stripMargin.replace("\n", " ")),
    // two-field index: path field has one surviving token per doc (the 'd'
    // dir prefix is dropped by min-size), so fl = avgfl = 1 and df = 1
    "ft_topk_field" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM (
        |  SELECT docid, s FROM contrib WHERE term = 'spark'
        |  UNION ALL
        |  SELECT i.docid,
        |    (2.0 * (ln(p.n::DOUBLE / 2.0) + 1.0)) * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 1.0)) AS s
        |  FROM ids i CROSS JOIN params p WHERE i.path = 'd/0000042.txt'
        |) u GROUP BY docid""".stripMargin.replace("\n", " "))),
    // multifield OR: content 'spark' + the path field's filename term
    // (one surviving path token per doc -> fl = avgfl = 1, df = 1)
    "ft_topk_multifield" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM (
        |  SELECT docid, s FROM contrib WHERE term = 'spark'
        |  UNION ALL
        |  SELECT i.docid,
        |    (ln(p.n::DOUBLE / 2.0) + 1.0) * 2.2 / (1.0 + 1.2 * (0.25 + 0.75 * 1.0)) AS s
        |  FROM ids i CROSS JOIN params p WHERE i.path = 'd/0000042.txt'
        |) u GROUP BY docid""".stripMargin.replace("\n", " "))),
    // path-tokenized field: the single matching doc's contribution is
    // boost * (idf('d') + idf(full path)); fl = avgfl = 2 so the BM25
    // normalization cancels (score == sumIdf)
    "ft_topk_path" -> (cte + " " + rank(
      """SELECT docid, sum(s) AS score FROM (
        |  SELECT docid, s FROM contrib WHERE term = 'spark'
        |  UNION ALL
        |  SELECT i.docid,
        |    2.0 * ((ln(p.n::DOUBLE / (p.n + 1.0)) + 1.0)
        |         + (ln(p.n::DOUBLE / 2.0) + 1.0)) AS s
        |  FROM ids i CROSS JOIN params p WHERE i.path = 'd/0000042.txt'
        |) u GROUP BY docid""".stripMargin.replace("\n", " "))),
    // word-bigram shingles over the surviving standard-chain stream
    "ft_tokens_shingle" -> (cte +
      """, st AS (SELECT docid, term,
        |    row_number() OVER (PARTITION BY docid ORDER BY pos) - 1 AS r
        |  FROM tokens)
        |SELECT a.docid, a.r AS pos, a.term || ' ' || b.term AS term
        |FROM st a JOIN st b ON b.docid = a.docid AND b.r = a.r + 1"""
        .stripMargin.replace("\n", " ")),
    // numeric range: one encoded term per doc (fl = avgfl = 1), so the BM25
    // contribution collapses to idf of the doc's value group
    "ft_topk_numrange" -> (cte + " " + rank(
      """SELECT i.docid,
        |  ln((SELECT n FROM params)::DOUBLE / (c.cnt + 1.0)) + 1.0 AS score
        | FROM ids i
        | JOIN (SELECT length(content) AS len, count(*)::BIGINT AS cnt
        |       FROM ids GROUP BY 1) c ON c.len = length(i.content)
        | WHERE length(i.content) BETWEEN 200 AND 260"""
        .stripMargin.replace("\n", " "))),
    // boolean field: one T/F term per doc, score = idf of the doc's value
    // group (fl = avgfl = 1), summed with the content term's contribution
    "ft_topk_bool" -> (cte + " " + rank(
      """SELECT c.docid,
        |  (ln((SELECT n FROM params)::DOUBLE /
        |      ((SELECT count(*) FROM ids WHERE length(content) >= 300) + 1.0))
        |   + 1.0) + c.s AS score
        | FROM (SELECT docid, s FROM contrib WHERE term = 'spark') c
        | JOIN ids i ON i.docid = c.docid
        | WHERE length(i.content) >= 300""".stripMargin.replace("\n", " "))),
    // datetime range: mtime = 2020-01-01 + (doc_id % 365) days; the Feb
    // window is day-of-year 31..58
    "ft_topk_daterange" -> (cte + " " + rank(
      """SELECT i.docid,
        |  ln((SELECT n FROM params)::DOUBLE / (c.cnt + 1.0)) + 1.0 AS score
        | FROM ids i
        | JOIN (SELECT CAST(substr(path, 3, 7) AS INTEGER) % 365 AS day,
        |              count(*)::BIGINT AS cnt FROM ids GROUP BY 1) c
        |   ON c.day = CAST(substr(i.path, 3, 7) AS INTEGER) % 365
        | WHERE CAST(substr(i.path, 3, 7) AS INTEGER) % 365 BETWEEN 31 AND 58"""
        .stripMargin.replace("\n", " "))),
    "ft_upsert" ->
      """WITH up AS (SELECT doc_id,
        |  CASE WHEN doc_id < 10 THEN text || ' upd' ELSE text END AS t FROM documents)
        |SELECT printf('r%02d', doc_id % 97) AS repo,
        |  printf('d/%07d.txt', doc_id) AS path, sha256(t) AS sha FROM up"""
        .stripMargin.replace("\n", " "),
    // Bo1 key terms of docs 0..9 (decision D11): f = cf/N,
    // score = wt*log2((1+f)/f) + log2(1+f), log2(x) = ln(x)/ln(2)
    "ft_key_terms" -> (cte + CftCte +
      """, wt AS (SELECT term, sum(tf)::DOUBLE AS w FROM tf WHERE docid < 10 GROUP BY term),
        |kt AS (SELECT w.term, """.stripMargin + bo1Sql("w.w") +
      """ AS score FROM wt w JOIN cft c USING (term) CROSS JOIN params p)
        |SELECT term, round(rawscore, 4) AS score
        |FROM (SELECT term, score AS rawscore, round(score, 6) AS r6 FROM kt) k
        |ORDER BY r6 DESC, term ASC LIMIT 10""".stripMargin.replace("\n", " ")),
    // more-like-this from doc 42: top-5 Bo1 terms as boosts, boosted BM25
    // OR over the rest of the corpus (boost*idf grouping matches the kernel)
    "ft_mlt" -> (cte + CftCte +
      """, wt42 AS (SELECT term, sum(tf)::DOUBLE AS w FROM tf WHERE docid = 42 GROUP BY term),
        |kt AS (SELECT w.term, """.stripMargin + bo1Sql("w.w") +
      """ AS boost FROM wt42 w JOIN cft c USING (term) CROSS JOIN params p
        | ORDER BY boost DESC, term ASC LIMIT 5),
        |scored AS (SELECT f.docid,
        |  sum((k.boost * (ln(p.n::DOUBLE / (d.df + 1.0)) + 1.0)) * (f.tf * 2.2)
        |      / (f.tf + 1.2 * (0.25 + 0.75 * fl.fl / p.avgfl))) AS score
        |  FROM tf f JOIN kt k USING (term) JOIN dft d USING (term)
        |  JOIN flens fl ON fl.docid = f.docid CROSS JOIN params p
        |  WHERE f.docid != 42 GROUP BY f.docid)
        |""".stripMargin.replace("\n", " ") +
      rank("SELECT docid, score FROM scored")),
    // DisjunctionMax, tiebreak 0: score = best matching clause's BM25
    "ft_topk_dismax" -> (cte + " " + rank(
      """SELECT docid, max(s) AS score FROM contrib
        | WHERE term IN ('spark','merge','join') GROUP BY docid"""
        .stripMargin.replace("\n", " "))),
    // collapse: best 'merge' hit per repo (raw-score winner — single-term
    // scores are arithmetic-identical across engines), then top-10
    "ft_collapse" -> (cte +
      """, cm AS (SELECT c.docid, c.s AS score, i.repo
        |  FROM contrib c JOIN ids i ON i.docid = c.docid WHERE c.term = 'merge'),
        |best AS (SELECT docid, repo, score,
        |  row_number() OVER (PARTITION BY repo ORDER BY score DESC, docid ASC) AS rn
        |  FROM cm)
        |SELECT docid, repo, round(rawscore, 4) AS score
        |FROM (SELECT docid, repo, score AS rawscore, round(score, 6) AS r6
        |      FROM best WHERE rn = 1) b
        |ORDER BY r6 DESC, docid ASC LIMIT 10""".stripMargin.replace("\n", " ")),
    // matched terms: which query terms occur in each requested doc
    "ft_matched_terms" -> (cte +
      " SELECT docid, term FROM tf WHERE term IN ('merge','join') AND docid < 20"),
    // facet counts: every 'merge' match grouped by the stored lang field
    "ft_facet_lang" -> (cte +
      """ SELECT lang, count(*)::BIGINT AS cnt FROM ids WHERE docid IN
        | (SELECT DISTINCT docid FROM tokens WHERE term = 'merge')
        | GROUP BY lang""".stripMargin.replace("\n", " ")),
    // the combined-call facet half == the standalone facet (same match set)
    "ft_faceted" -> (cte +
      """ SELECT lang, count(*)::BIGINT AS cnt FROM ids WHERE docid IN
        | (SELECT DISTINCT docid FROM tokens WHERE term = 'merge')
        | GROUP BY lang""".stripMargin.replace("\n", " ")),
    // sorted search: 'merge' matches ordered by path desc
    "ft_sortedby" -> (cte +
      """ SELECT docid, path FROM ids WHERE docid IN
        | (SELECT DISTINCT docid FROM tokens WHERE term = 'merge')
        | ORDER BY path DESC, docid ASC LIMIT 10""".stripMargin.replace("\n", " ")),
    // range facet: rawlen bins of gap 10 over the 'merge' match set
    "ft_facet_range" -> (cte +
      """ SELECT (f.rawlen // 10) * 10 AS bucket_lo, count(*)::BIGINT AS cnt
        | FROM flens f WHERE f.docid IN
        | (SELECT DISTINCT docid FROM tokens WHERE term = 'merge')
        | AND f.rawlen >= 0 AND f.rawlen < 10000
        | GROUP BY 1""".stripMargin.replace("\n", " ")),
    // multi facet: compound (lang, repo) key over the 'merge' match set
    "ft_facet_multi" -> (cte +
      """ SELECT lang, repo, count(*)::BIGINT AS cnt FROM ids WHERE docid IN
        | (SELECT DISTINCT docid FROM tokens WHERE term = 'merge')
        | GROUP BY lang, repo""".stripMargin.replace("\n", " ")),
    // multi-key sortedby: lang asc, path desc, docid asc tiebreak
    "ft_sortedby_multi" -> (cte +
      """ SELECT docid, lang, path FROM ids WHERE docid IN
        | (SELECT DISTINCT docid FROM tokens WHERE term = 'merge')
        | ORDER BY lang ASC, path DESC, docid ASC LIMIT 10"""
        .stripMargin.replace("\n", " ")),
    // highlighting (D12): raw-token islands merged at gap > 2*surround,
    // top-2 fragments by (matches desc, start asc), <b>-wrapped render
    "ft_highlight" -> (cte +
      """, rawd AS (SELECT docid, regexp_extract_all(content, '\w+(\.?\w+)*') AS toks
        |  FROM ids WHERE docid < 20),
        |mpos AS (SELECT docid, unnest(range(len(toks))) AS p, unnest(toks) AS tok FROM rawd),
        |mm AS (SELECT docid, p FROM mpos WHERE lower(tok) IN ('merge','join')),
        |brk AS (SELECT docid, p,
        |  CASE WHEN p - lag(p) OVER (PARTITION BY docid ORDER BY p) > 6 THEN 1 ELSE 0 END AS b
        |  FROM mm),
        |isl AS (SELECT docid, p, sum(b) OVER (PARTITION BY docid ORDER BY p) AS g FROM brk),
        |grp AS (SELECT docid, g, min(p) AS lo, max(p) AS hi, count(*)::BIGINT AS matches
        |  FROM isl GROUP BY docid, g),
        |fr AS (SELECT g.docid, greatest(g.lo - 3, 0) AS s,
        |    least(g.hi + 3, len(r.toks) - 1) AS e, g.matches, r.toks
        |  FROM grp g JOIN rawd r ON r.docid = g.docid),
        |rk AS (SELECT docid, s, e, matches, toks,
        |    row_number() OVER (PARTITION BY docid ORDER BY matches DESC, s ASC) - 1 AS frag
        |  FROM fr)
        |SELECT docid, frag, s AS start_pos, e AS end_pos, matches,
        |  array_to_string([CASE WHEN lower(toks[i+1]) IN ('merge','join')
        |    THEN '<b>' || toks[i+1] || '</b>' ELSE toks[i+1] END
        |    FOR i IN range(s, e + 1)], ' ') AS fragment
        |FROM rk WHERE frag < 2""".stripMargin.replace("\n", " ")),
    // whole-doc fragment (round-5): every doc with a match emits ONE
    // fragment covering its full raw token stream, matches bolded
    "ft_highlight_whole" -> (cte +
      """, rawd AS (SELECT docid, regexp_extract_all(content, '\w+(\.?\w+)*') AS toks
        |  FROM ids WHERE docid < 20),
        |mc AS (SELECT r.docid, r.toks,
        |    (SELECT count(*) FROM unnest(r.toks) AS u(tok)
        |     WHERE lower(tok) IN ('merge','join'))::BIGINT AS matches
        |  FROM rawd r)
        |SELECT docid, 0::BIGINT AS frag, 0::BIGINT AS start_pos,
        |  (len(toks) - 1)::BIGINT AS end_pos, matches,
        |  array_to_string([CASE WHEN lower(toks[i+1]) IN ('merge','join')
        |    THEN '<b>' || toks[i+1] || '</b>' ELSE toks[i+1] END
        |    FOR i IN range(0, len(toks))], ' ') AS fragment
        |FROM mc WHERE matches > 0 AND len(toks) > 0"""
        .stripMargin.replace("\n", " ")),
    // S3/S5: manifest metrics vs the corpus-derived layout (segSize = 128)
    "ft_segments" -> (cte +
      """, segd AS (SELECT docid // 128 AS segid, count(*)::BIGINT AS doc_count,
        |    sum(rawlen)::BIGINT AS rawlen_sum FROM flens GROUP BY 1),
        |  segp AS (SELECT docid // 128 AS segid, count(DISTINCT term)::BIGINT AS posting_rows
        |    FROM tf GROUP BY 1)
        |SELECT segd.segid, segd.doc_count, coalesce(segp.posting_rows, 0) AS posting_rows,
        |  segd.rawlen_sum
        |FROM segd LEFT JOIN segp USING (segid)""".stripMargin.replace("\n", " ")),
    // S4: stored-field point lookup
    "ft_doc_fetch" -> (cte +
      """ SELECT docid, repo, path, lang, sha256(content) AS sha FROM ids
        | WHERE docid IN (0, 1, 2, 3, 4, 42)""".stripMargin.replace("\n", " ")),

    // ---- training-data ops (documents / embeddings tables) ----
    "dd_exact" ->
      """SELECT doc_id AS id,
        | min(doc_id) OVER (PARTITION BY sha256(text)) AS canonical_id,
        | sha256(text) AS sha FROM documents""".stripMargin.replace("\n", " "),
    "dd_minhash_pairs" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS s
        |  FROM t WHERE len(w) >= 3),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) AS j
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, round(j, 4) AS jaccard FROM p WHERE j >= 0.7"""
        .stripMargin.replace("\n", " "),
    // identical exhaustive ground truth for the fully-relational exact path
    "dd_ngram_pairs" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS s
        |  FROM t WHERE len(w) >= 3),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) AS j
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, round(j, 4) AS jaccard FROM p WHERE j >= 0.7"""
        .stripMargin.replace("\n", " "),
    // duplicated 10-token spans: exhaustive window extraction + distinct-doc
    // counts (the engine's one-shuffle relational form, replayed literally)
    "dd_dupspans" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents),
        |sp0 AS (SELECT doc_id, unnest([{'pos': i,
        |    'sh': array_to_string(w[i+1:i+10], ' ')} FOR i IN range(0, len(w) - 9)]) AS s
        |  FROM t WHERE len(w) >= 10),
        |sp AS (SELECT doc_id, s.pos AS pos, s.sh AS sh FROM sp0),
        |dup AS (SELECT sh FROM (SELECT sh, count(DISTINCT doc_id) AS c FROM sp GROUP BY 1)
        |  WHERE c >= 2),
        |dsp AS (SELECT sp.doc_id, sp.pos FROM sp JOIN dup USING (sh)),
        |ns AS (SELECT doc_id, count(*)::BIGINT AS n_spans FROM sp GROUP BY 1),
        |nd AS (SELECT doc_id, count(*)::BIGINT AS dup_spans FROM dsp GROUP BY 1),
        |cov AS (SELECT doc_id, count(DISTINCT tp)::BIGINT AS dup_tokens FROM
        |  (SELECT doc_id, unnest(range(pos, pos + 10)) AS tp FROM dsp) GROUP BY 1)
        |SELECT t.doc_id AS id, len(t.w)::BIGINT AS ntok,
        |  coalesce(ns.n_spans, 0)::BIGINT AS n_spans,
        |  coalesce(nd.dup_spans, 0)::BIGINT AS dup_spans,
        |  coalesce(cov.dup_tokens, 0)::BIGINT AS dup_tokens,
        |  CASE WHEN len(t.w) > 0
        |    THEN round(coalesce(cov.dup_tokens, 0)::DOUBLE / len(t.w), 4)
        |    ELSE 0.0 END AS dup_frac
        |FROM t LEFT JOIN ns USING (doc_id) LEFT JOIN nd USING (doc_id)
        |  LEFT JOIN cov USING (doc_id)""".stripMargin.replace("\n", " "),
    // repeated-line removal: literal split on ' table ', df >= 2 segments
    // dropped, survivors rejoined in position order with the same separator
    "dd_striplines" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' table ') AS ls FROM documents),
        |l AS (SELECT doc_id, unnest(ls) AS ln,
        |  unnest(range(1, len(ls)+1)) AS pos FROM t),
        |c AS (SELECT ln, count(*) AS c FROM l GROUP BY ln),
        |f AS (SELECT l.doc_id, l.pos, l.ln, (c.c >= 2) AS drp
        |  FROM l JOIN c USING (ln))
        |SELECT doc_id AS id,
        |  coalesce(string_agg(ln, ' table ' ORDER BY pos)
        |    FILTER (WHERE NOT drp), '') AS cleaned,
        |  count(*)::BIGINT AS n_lines,
        |  sum(CASE WHEN drp THEN 1 ELSE 0 END)::BIGINT AS n_dropped
        |FROM f GROUP BY doc_id ORDER BY id""".stripMargin.replace("\n", " "),
    "dd_embed_pairs" ->
      """WITH u AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
        |  unnest(range(len(embedding))) AS i FROM embeddings),
        |n AS (SELECT vec_id, sum(v*v) AS n2 FROM u GROUP BY vec_id),
        |d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v*b.v) AS dot
        |  FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2),
        |s AS (SELECT id_a, id_b, dot / sqrt(na.n2 * nb.n2) AS sim
        |  FROM d JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b)
        |SELECT id_a, id_b, round(sim, 4) AS sim FROM s WHERE sim >= 0.45"""
        .stripMargin.replace("\n", " "),
    // components over the exhaustive >=0.7 Jaccard pair graph (recursive
    // reachability; component = min reachable id)
    "dd_components" ->
      """WITH RECURSIVE t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS s
        |  FROM t WHERE len(w) >= 3),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) AS j
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |pp AS (SELECT id_a, id_b FROM p WHERE j >= 0.7),
        |e AS (SELECT id_a AS a, id_b AS b FROM pp UNION ALL SELECT id_b, id_a FROM pp),
        |reach AS (SELECT a AS id, b AS r FROM e
        |  UNION SELECT rc.id, e.b FROM reach rc JOIN e ON e.a = rc.r)
        |SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id"""
        .stripMargin.replace("\n", " "),
    // hybrid RRF: rounded-exhaustive BM25 ranks (via the shared cte, docid
    // -> embedding id through the path digits) and rounded cosine ranks,
    // each side top 30, fused 1/(60+rank)
    "hy_rrf" ->
      (cte + """, txt AS (
        |  SELECT CAST(substr(i.path, 3, 7) AS BIGINT) AS id, round(c.s, 6) AS r6
        |  FROM contrib c JOIN ids i USING (docid) WHERE c.term = 'spark'),
        |txtr AS (SELECT id, rank FROM (
        |  SELECT id, row_number() OVER (ORDER BY r6 DESC, id ASC) AS rank FROM txt) t
        |  WHERE rank <= 30),
        |q AS (SELECT unnest(embedding)::DOUBLE AS qv,
        |  unnest(range(len(embedding))) AS i FROM embeddings WHERE vec_id = 0),
        |u AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
        |  unnest(range(len(embedding))) AS i FROM embeddings),
        |sv AS (SELECT u.vec_id AS id, sum(u.v*q.qv) AS dot, sum(u.v*u.v) AS n2
        |  FROM u JOIN q USING (i) GROUP BY u.vec_id),
        |vr AS (SELECT id, round(dot / sqrt(n2 * (SELECT sum(qv*qv) FROM q)), 6) AS r6 FROM sv),
        |vecr AS (SELECT id, rank FROM (
        |  SELECT id, row_number() OVER (ORDER BY r6 DESC, id ASC) AS rank FROM vr) v
        |  WHERE rank <= 30),
        |fused AS (SELECT id, sum(1.0/(60 + rank)) AS rrf, count(*)::BIGINT AS n_lists
        |  FROM (SELECT * FROM txtr UNION ALL SELECT * FROM vecr) b GROUP BY id)
        |SELECT id, round(rrf, 6) AS score, n_lists FROM fused
        |ORDER BY score DESC, id ASC""".stripMargin.replace("\n", " ")),
    // hard-negative mining: the hy_rrf BM25 lexical CTE (r6-ranked top 30)
    // anti-filtered by exact query cosine at the 0.30 cutoff
    "hn_mine" ->
      (cte + """, txt AS (
        |  SELECT CAST(substr(i.path, 3, 7) AS BIGINT) AS id, round(c.s, 6) AS r6
        |  FROM contrib c JOIN ids i USING (docid) WHERE c.term = 'spark'),
        |lex AS (SELECT id, r6, row_number() OVER (ORDER BY r6 DESC, id ASC) AS rank FROM txt),
        |lex30 AS (SELECT * FROM lex WHERE rank <= 30),
        |q AS (SELECT unnest(embedding)::DOUBLE AS qv,
        |  unnest(range(len(embedding))) AS i FROM embeddings WHERE vec_id = 0),
        |u AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
        |  unnest(range(len(embedding))) AS i FROM embeddings),
        |sv AS (SELECT u.vec_id AS id, sum(u.v*q.qv) AS dot, sum(u.v*u.v) AS n2
        |  FROM u JOIN q USING (i) GROUP BY u.vec_id),
        |vr AS (SELECT id, dot / sqrt(n2 * (SELECT sum(qv*qv) FROM q)) AS sim FROM sv)
        |SELECT l.id, l.rank::BIGINT AS bm25_rank, l.r6 AS bm25_score,
        |  round(v.sim, 4) AS sim
        |FROM lex30 l JOIN vr v USING (id) WHERE v.sim < 0.30"""
        .stripMargin.replace("\n", " ")),
    // ICT pairs: the same pinned crop arithmetic over 1-based inclusive
    // list slices
    "ict_pairs" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents),
        |f AS (SELECT doc_id, w, len(w) AS n,
        |  least(ceil(len(w) * 0.5)::INT, len(w) - 1) AS q
        |  FROM t WHERE len(w) >= 2)
        |SELECT doc_id AS id, array_to_string(w[1:q], ' ') AS query,
        |  array_to_string(w[q+1:n], ' ') AS passage, n::BIGINT AS n_tokens
        |FROM f ORDER BY id""".stripMargin.replace("\n", " "),
    // per-source data card over the same planted-copy augmentation:
    // dup = sha256(text) occurring >= 2 times anywhere in the corpus
    "rp_source" ->
      """WITH docs2 AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text, 'srcX' FROM documents WHERE doc_id < 15),
        |b AS (SELECT source AS grp, doc_id, sha256(text) AS h,
        |    len(regexp_extract_all(lower(text), '\w+'))::BIGINT AS n_tok,
        |    length(text)::BIGINT AS n_chars FROM docs2),
        |d AS (SELECT h, count(*) AS c FROM b GROUP BY h)
        |SELECT grp, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
        |  round(avg(n_tok), 2) AS mean_tokens, round(avg(n_chars), 2) AS mean_chars,
        |  sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)::BIGINT AS dup_docs,
        |  round(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*), 4) AS dup_frac
        |FROM b JOIN d USING (h) GROUP BY grp ORDER BY grp"""
        .stripMargin.replace("\n", " "),
    // SemDeDup prune: exhaustive cosine>=0.45 pair graph + recursive
    // reachability (component = min reachable id); survivors = every id
    // whose component IS itself (or untouched singleton)
    "dd_prune" ->
      """WITH RECURSIVE u AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
        |  unnest(range(len(embedding))) AS i FROM embeddings),
        |n AS (SELECT vec_id, sum(v*v) AS n2 FROM u GROUP BY vec_id),
        |d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v*b.v) AS dot
        |  FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2),
        |p AS (SELECT id_a, id_b FROM (SELECT id_a, id_b,
        |    dot / sqrt(na.n2 * nb.n2) AS sim
        |  FROM d JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b) s
        |  WHERE sim >= 0.45),
        |e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
        |reach AS (SELECT a AS id, b AS r FROM e
        |  UNION SELECT rc.id, e.b FROM reach rc JOIN e ON e.a = rc.r),
        |dropped AS (SELECT id FROM (
        |  SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id) c
        |  WHERE component <> id)
        |SELECT vec_id AS id FROM embeddings
        |WHERE vec_id NOT IN (SELECT id FROM dropped) ORDER BY id"""
        .stripMargin.replace("\n", " "),
    "dd_simhash" -> OracleSql.ddSimhash(seed = 7L),
    "dd_simhash_pairs" -> OracleSql.ddSimhashPairs(maxHamming = 6, seed = 7L),
    "ann_srp_topk" -> OracleSql.annSrpTopK(k = 10),
    "mm_features" -> OracleSql.mmFeatures(),
    "ann_cosine_topk" ->
      """WITH q AS (SELECT unnest(embedding)::DOUBLE AS qv,
        |  unnest(range(len(embedding))) AS i FROM embeddings WHERE vec_id = 0),
        |u AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
        |  unnest(range(len(embedding))) AS i FROM embeddings),
        |s AS (SELECT u.vec_id AS id, sum(u.v*q.qv) AS dot, sum(u.v*u.v) AS n2
        |  FROM u JOIN q USING (i) GROUP BY u.vec_id),
        |r AS (SELECT id, dot / sqrt(n2 * (SELECT sum(qv*qv) FROM q)) AS sim FROM s)
        |SELECT id, round(rawsim, 4) AS sim
        |FROM (SELECT id, sim AS rawsim, round(sim, 6) AS r6 FROM r) rr
        |ORDER BY r6 DESC, id ASC LIMIT 10""".stripMargin.replace("\n", " "),
    // SQ8 ADC scan: identical pinned quantize/dequantize formula, float
    // query (vec_id 0) vs dequantized docs, (round-6, id) rank
    "ann_sq8_topk" ->
      """WITH u AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,
        |  unnest(range(len(embedding))) AS i FROM embeddings),
        |mm AS (SELECT i, min(v) AS mn, max(v) AS mx FROM u GROUP BY i),
        |d AS (SELECT u.vec_id, u.i, CASE WHEN mm.mx = mm.mn THEN mm.mn
        |    ELSE mm.mn + floor((u.v - mm.mn)/(mm.mx - mm.mn)*255.0 + 0.5)/255.0*(mm.mx - mm.mn)
        |  END AS dv FROM u JOIN mm USING (i)),
        |q AS (SELECT i, v AS qv FROM u WHERE vec_id = 0),
        |s AS (SELECT d.vec_id AS id, sum(d.dv * q.qv) AS dot, sum(d.dv * d.dv) AS n2
        |  FROM d JOIN q USING (i) GROUP BY 1),
        |r AS (SELECT id, dot / sqrt(n2 * (SELECT sum(qv*qv) FROM q)) AS sim FROM s)
        |SELECT id, round(rawsim, 4) AS sim
        |FROM (SELECT id, sim AS rawsim, round(sim, 6) AS r6 FROM r) rr
        |ORDER BY r6 DESC, id ASC LIMIT 10""".stripMargin.replace("\n", " "),
    // redaction: identical augmentation + the same RE2-safe patterns, 'g'
    "ql_redact" ->
      """WITH a AS (SELECT doc_id,
        |  text || ' contact u' || doc_id || '@ex' || (doc_id % 7) || '.com at 10.0.'
        |    || (doc_id % 256) || '.1 id 1234567890' || doc_id AS t FROM documents)
        |SELECT doc_id AS id,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |    '[0-9]{10,}', '<NUM>', 'g') AS redacted
        |FROM a""".stripMargin.replace("\n", " "),
    // packing plan: DuckDB's global window cumsum IS the sequential model
    // the distributed prefix sum must reproduce; // is integer division
    "pk_plan" ->
      """WITH t AS (SELECT doc_id::BIGINT AS id,
        |  len(regexp_extract_all(text, '\S+'))::BIGINT AS ntok FROM documents),
        |c AS (SELECT id, ntok, coalesce(sum(ntok) OVER (ORDER BY id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_before FROM t)
        |SELECT id, ntok, tok_before,
        |  (tok_before // 512)::BIGINT AS first_seq,
        |  (tok_before % 512)::BIGINT AS first_off,
        |  (CASE WHEN ntok = 0 THEN tok_before // 512
        |        ELSE (tok_before + ntok - 1) // 512 END)::BIGINT AS last_seq,
        |  (CASE WHEN ntok = 0 THEN 0
        |        ELSE (tok_before + ntok - 1) // 512 - tok_before // 512 + 1
        |   END)::BIGINT AS n_seqs
        |FROM c ORDER BY id""".stripMargin.replace("\n", " "),
    // C4 line filter: identical augmentation (literal replace — the
    // pattern has no regex metachars — plus pinned suffixes), then the
    // same line split (trailing empties kept) and keep rules
    "ql_c4lines" ->
      """WITH aug AS (SELECT doc_id::BIGINT AS id,
        |  replace(text, 'the ', 'the.' || chr(10)) ||
        |  (CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum' ELSE '' END) ||
        |  (CASE WHEN doc_id % 7 = 0 THEN ' {' ELSE '' END) AS t FROM documents),
        |l AS (SELECT id, unnest(string_split(t, chr(10))) AS line FROM aug),
        |k AS (SELECT id, count(*)::BIGINT AS n_lines,
        |  sum(CASE WHEN regexp_matches(line, '[.!?"]\s*$')
        |           AND len(regexp_extract_all(line, '\S+')) >= 5
        |      THEN 1 ELSE 0 END)::BIGINT AS kept_lines FROM l GROUP BY id),
        |f AS (SELECT a.id, k.n_lines, k.kept_lines,
        |  round(kept_lines::DOUBLE / n_lines, 4) AS kept_frac,
        |  contains(lower(a.t), 'lorem ipsum') AS has_lorem,
        |  contains(a.t, '{') AS has_brace FROM aug a JOIN k USING (id))
        |SELECT id, n_lines, kept_lines, kept_frac, has_lorem, has_brace,
        |  (kept_lines >= 3 AND NOT has_lorem AND NOT has_brace) AS keep
        |FROM f ORDER BY id""".stripMargin.replace("\n", " "),
    // code-quality filters: identical augmentation, pinned Stack/StarCoder
    // formulas (lines with trailing empties, rounded fractions, markers)
    "cq_stats" ->
      """WITH aug AS (SELECT
        |  printf('r%02d', doc_id % 97) AS repo,
        |  printf('d/%07d.txt', doc_id) AS path,
        |  lang,
        |  replace(text, 'the ', 'the' || chr(10)) ||
        |  (CASE WHEN doc_id % 13 = 0 THEN ' do not edit' ELSE '' END) ||
        |  (CASE WHEN doc_id % 17 = 0 THEN ' ' || repeat('Ab0+', 20) ELSE '' END) ||
        |  (CASE WHEN doc_id % 19 = 0 THEN ' ' || repeat('x', 1200) ELSE '' END) AS content
        |  FROM documents),
        |m AS (SELECT repo, path, lang, content,
        |  string_split(content, chr(10)) AS ls,
        |  len(content) AS cl FROM aug),
        |x AS (SELECT repo, path, lang,
        |  len(ls)::BIGINT AS n_lines,
        |  coalesce(list_max(list_transform(ls, x -> len(x))), 0)::BIGINT AS max_line_len,
        |  round(list_sum(list_transform(ls, x -> len(x)))::DOUBLE / len(ls), 4) AS avg_line_len,
        |  CASE WHEN cl = 0 THEN 0.0 ELSE round(len(regexp_replace(content, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / cl, 4) END AS alnum_frac,
        |  CASE WHEN cl = 0 THEN 0.0 ELSE round(len(regexp_replace(content, '[^A-Za-z]', '', 'g'))::DOUBLE / cl, 4) END AS alpha_frac,
        |  (contains(lower(content), 'auto-generated') OR contains(lower(content), 'do not edit')
        |    OR contains(lower(content), 'generated by')) AS autogen,
        |  regexp_matches(content, '[A-Za-z0-9+/=]{64,}') AS has_long_run
        |  FROM m)
        |SELECT repo, path, lang, n_lines, max_line_len, avg_line_len, alnum_frac, alpha_frac,
        |  autogen, has_long_run,
        |  (max_line_len <= 1000 AND avg_line_len <= 100 AND alnum_frac >= 0.25
        |   AND NOT autogen AND NOT has_long_run) AS keep
        |FROM x ORDER BY repo, path""".stripMargin.replace("\n", " "),
    // content-split: first 4 sha256 bytes of (text||salt) as a big-endian
    // int mod 1000 (hex fold), then the per-mille thresholds
    "sp_split" ->
      """WITH b AS (SELECT doc_id, substr(sha256(text || 'split'), 1, 8) AS h FROM documents),
        |v AS (SELECT doc_id,
        |  list_reduce([instr('0123456789abcdef', substr(h, i, 1)) - 1 FOR i IN range(1, 9)],
        |    (a, x) -> a * 16 + x) % 1000 AS bucket FROM b)
        |SELECT doc_id AS id, bucket::BIGINT AS bucket,
        |  CASE WHEN bucket < 900 THEN 'train' WHEN bucket < 950 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM v""".stripMargin.replace("\n", " "),
    "sp_sample" ->
      """WITH b AS (SELECT doc_id, substr(sha256(text || 'sample'), 1, 8) AS h FROM documents),
        |v AS (SELECT doc_id,
        |  list_reduce([instr('0123456789abcdef', substr(h, i, 1)) - 1 FOR i IN range(1, 9)],
        |    (a, x) -> a * 16 + x) % 1000 AS bucket FROM b)
        |SELECT doc_id AS id FROM v WHERE bucket < 250""".stripMargin.replace("\n", " "),
    // stratified sampler: the sp_sample hex-fold with per-lang thresholds
    "sp_stratified" ->
      """WITH b AS (SELECT doc_id, lang, substr(sha256(text || 'sample'), 1, 8) AS h FROM documents),
        |v AS (SELECT doc_id, lang,
        |  list_reduce([instr('0123456789abcdef', substr(h, i, 1)) - 1 FOR i IN range(1, 9)],
        |    (a, x) -> a * 16 + x) % 1000 AS bucket FROM b)
        |SELECT doc_id AS id, lang FROM v WHERE bucket <
        |  CASE WHEN lang = 'en' THEN 600 WHEN lang = 'de' THEN 200 ELSE 50 END"""
        .stripMargin.replace("\n", " "),
    // DSIR hashed n-gram importance weights: the simhash FNV fold on
    // unigram+bigram features, mod-64 buckets, smoothed log density ratio
    "sl_dsir" -> OracleSql.slDsir(tgtMaxId = 50L),
    // CCNet perplexity bands: ql_unigram score + per-lang ntile(3)
    "sl_ppl_bucket" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS w
        |  FROM documents),
        |cf AS (SELECT w, count(*)::DOUBLE AS cf FROM tok GROUP BY w),
        |tot AS (SELECT sum(cf) AS total FROM cf),
        |pd AS (SELECT doc_id, avg(ln(cf / (SELECT total FROM tot))) AS lp
        |  FROM tok JOIN cf USING (w) GROUP BY doc_id),
        |sc AS (SELECT d.doc_id AS id, d.lang, round(coalesce(pd.lp, 0.0), 4) AS logprob
        |  FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id)
        |SELECT id, lang, logprob, bucket,
        |  CASE WHEN bucket = 1 THEN 'head' WHEN bucket = 3 THEN 'tail'
        |       ELSE 'middle' END AS band
        |FROM (SELECT id, lang, logprob,
        |        (ntile(3) OVER (PARTITION BY lang ORDER BY logprob DESC, id ASC))::BIGINT AS bucket
        |      FROM sc) t""".stripMargin.replace("\n", " "),
    // TF-IDF long form: smoothed idf ln((N+1)/(df+1)) + 1, per-doc L2 norm
    "ql_tfidf" ->
      """WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
        |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |w AS (SELECT tf.doc_id, tf.term, tf.tf,
        |    tf.tf * (ln(((SELECT n FROM n) + 1.0) / (dfs.df + 1.0)) + 1.0) AS weight
        |  FROM tf JOIN dfs USING (term)),
        |nm AS (SELECT doc_id, sqrt(sum(weight * weight)) AS nrm FROM w GROUP BY 1)
        |SELECT w.doc_id AS id, w.term, w.tf, round(w.weight, 4) AS weight,
        |  round(w.weight / nm.nrm, 4) AS weight_l2
        |FROM w JOIN nm USING (doc_id)""".stripMargin.replace("\n", " "),
    // decontamination: distinct shared 5-grams with the doc_id<10 bench set
    "dc_ngram_overlap" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |   [w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
        |    FOR i IN range(1, len(w)-3)])) AS ngram
        |  FROM t WHERE len(w) >= 5),
        |b AS (SELECT DISTINCT ngram FROM g WHERE doc_id < 10),
        |h AS (SELECT g.doc_id, count(*)::BIGINT AS hits FROM g JOIN b USING (ngram) GROUP BY 1)
        |SELECT d.doc_id AS id, coalesce(h.hits, 0)::BIGINT AS hits,
        |  coalesce(h.hits, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id"""
        .stripMargin.replace("\n", " "),
    // Bloom-prefiltered decontamination: bit-identical output to the exact
    // op (false positives removed by the exact join), so the SAME oracle
    "dc_bloom" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |   [w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
        |    FOR i IN range(1, len(w)-3)])) AS ngram
        |  FROM t WHERE len(w) >= 5),
        |b AS (SELECT DISTINCT ngram FROM g WHERE doc_id < 10),
        |h AS (SELECT g.doc_id, count(*)::BIGINT AS hits FROM g JOIN b USING (ngram) GROUP BY 1)
        |SELECT d.doc_id AS id, coalesce(h.hits, 0)::BIGINT AS hits,
        |  coalesce(h.hits, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id"""
        .stripMargin.replace("\n", " "),
    // per-source quota cap: top-10 by n_chars (desc, id asc tiebreak) —
    // the window model the bounded-heap Aggregator must reproduce
    "sp_cap" ->
      """WITH r AS (SELECT source AS grp,
        |  row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id)::BIGINT AS rank,
        |  doc_id::BIGINT AS id, n_chars::DOUBLE AS score FROM documents)
        |SELECT grp, rank, id, score FROM r WHERE rank <= 10 ORDER BY grp, rank"""
        .stripMargin.replace("\n", " "),
    // repetition fractions (pinned Gopher-style formulas)
    "ql_repetition" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w FROM documents),
        |g2 AS (SELECT doc_id, unnest([w[i]||' '||w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM t WHERE len(w) >= 2),
        |c2 AS (SELECT doc_id, max(cnt) AS mx FROM
        |  (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2) GROUP BY doc_id),
        |g5 AS (SELECT doc_id, unnest(
        |   [w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
        |    FOR i IN range(1, len(w)-3)]) AS g
        |  FROM t WHERE len(w) >= 5),
        |c5 AS (SELECT doc_id, sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup FROM
        |  (SELECT doc_id, g, count(*) AS cnt FROM g5 GROUP BY 1, 2) GROUP BY doc_id)
        |SELECT t.doc_id AS id, len(t.w)::BIGINT AS n_tokens,
        |  round(coalesce(c2.mx * 2.0 / len(t.w), 0.0), 4) AS top2gram_frac,
        |  round(coalesce(least(1.0, c5.dup * 5.0 / len(t.w)), 0.0), 4) AS dup5gram_frac
        |FROM t LEFT JOIN c2 ON c2.doc_id = t.doc_id
        |LEFT JOIN c5 ON c5.doc_id = t.doc_id""".stripMargin.replace("\n", " "),
    // unigram log-prob under the corpus's own distribution
    "ql_unigram" ->
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS w
        |  FROM documents),
        |cf AS (SELECT w, count(*)::DOUBLE AS cf FROM tok GROUP BY w),
        |tot AS (SELECT sum(cf) AS total FROM cf),
        |pd AS (SELECT doc_id, count(*)::BIGINT AS n,
        |    avg(ln(cf / (SELECT total FROM tot))) AS lp
        |  FROM tok JOIN cf USING (w) GROUP BY doc_id)
        |SELECT d.doc_id AS id, coalesce(pd.n, 0)::BIGINT AS n_tokens,
        |  round(coalesce(pd.lp, 0.0), 4) AS logprob
        |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id"""
        .stripMargin.replace("\n", " "),
    // interpolated bigram LM score: lag pairing via parallel unnest of the
    // token list and its shifted copy; (1.0 - 0.7) spelled as the same
    // double subtraction the Scala side performs
    "ql_bigram" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents),
        |tok AS (SELECT doc_id, unnest(ws) AS w,
        |  unnest([CASE WHEN i = 1 THEN NULL ELSE ws[i-1] END
        |          FOR i IN range(1, len(ws)+1)]) AS prev FROM t),
        |cf AS (SELECT w, count(*)::DOUBLE AS cf FROM tok GROUP BY w),
        |tot AS (SELECT sum(cf) AS total FROM cf),
        |c2 AS (SELECT prev, w, count(*)::DOUBLE AS c2 FROM tok
        |  WHERE prev IS NOT NULL GROUP BY prev, w),
        |cx AS (SELECT prev, count(*)::DOUBLE AS ctx FROM tok
        |  WHERE prev IS NOT NULL GROUP BY prev),
        |p AS (SELECT tok.doc_id,
        |    CASE WHEN tok.prev IS NULL THEN cf.cf / (SELECT total FROM tot)
        |      ELSE 0.7 * (c2.c2 / cx.ctx)
        |         + (1.0 - 0.7) * (cf.cf / (SELECT total FROM tot)) END AS p
        |  FROM tok JOIN cf USING (w)
        |  LEFT JOIN c2 ON c2.prev = tok.prev AND c2.w = tok.w
        |  LEFT JOIN cx ON cx.prev = tok.prev),
        |pd AS (SELECT doc_id, count(*)::BIGINT AS n, avg(ln(p)) AS lp
        |  FROM p GROUP BY doc_id)
        |SELECT d.doc_id AS id, coalesce(pd.n, 0)::BIGINT AS n_tokens,
        |  round(coalesce(pd.lp, 0.0), 4) AS logprob
        |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id"""
        .stripMargin.replace("\n", " "),
    // token-budget mixture sampling: pinned integer per-mille rates
    // (1000*budget // group tokens, capped at 1000) over the sp_sample
    // hex fold with salt 'mix'
    "mx_sample" ->
      """WITH tk AS (SELECT doc_id, source, text,
        |    len(regexp_extract_all(lower(text), '\w+'))::BIGINT AS n_tokens
        |  FROM documents),
        |tot AS (SELECT source, sum(n_tokens)::BIGINT AS tot FROM tk
        |  WHERE source IN ('src0','src1','src2') GROUP BY source),
        |rt AS (SELECT source, least(1000, (1000 * CASE source
        |    WHEN 'src0' THEN 700 WHEN 'src1' THEN 2000
        |    WHEN 'src2' THEN 100 END) // tot)::BIGINT AS rate FROM tot),
        |b AS (SELECT doc_id, source, n_tokens,
        |    list_reduce([instr('0123456789abcdef', substr(h, i, 1)) - 1 FOR i IN range(1, 9)],
        |      (a, x) -> a * 16 + x) % 1000 AS bucket
        |  FROM (SELECT doc_id, source, n_tokens,
        |          substr(sha256(text || 'mix'), 1, 8) AS h FROM tk))
        |SELECT b.doc_id AS id, b.source AS grp, b.n_tokens, rt.rate
        |FROM b JOIN rt ON rt.source = b.source
        |WHERE b.bucket < rt.rate ORDER BY id""".stripMargin.replace("\n", " "),
    "ql_tokens" ->
      """SELECT doc_id AS id,
        | len(regexp_extract_all(text, '\S+'))::BIGINT AS ws_tokens,
        | len(regexp_extract_all(text, '\w+'))::BIGINT AS word_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]'))::BIGINT AS bpe_ish_tokens
        |FROM documents""".stripMargin.replace("\n", " "),
    "ql_quality" ->
      s"""WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws, text FROM documents),
         |m AS (SELECT doc_id, len(ws)::BIGINT AS n,
         |  len(list_filter(ws, x -> list_contains([$StopList], x)))::BIGINT AS stops,
         |  length(regexp_replace(text, '[^A-Za-z0-9_]', '', 'g'))::BIGINT AS alpha,
         |  length(text)::BIGINT AS chars FROM w)
         |SELECT doc_id AS id, n AS n_tokens,
         | round(CASE WHEN n = 0 THEN 0 ELSE stops::DOUBLE / n END, 4) AS stop_ratio,
         | round(CASE WHEN chars = 0 THEN 0 ELSE alpha::DOUBLE / chars END, 4) AS alpha_ratio,
         | round(0.4 * least(n / 100.0, 1.0)
         |   + 0.3 * (1.0 - CASE WHEN n = 0 THEN 0 ELSE stops::DOUBLE / n END)
         |   + 0.3 * (CASE WHEN chars = 0 THEN 0 ELSE alpha::DOUBLE / chars END), 4) AS score
         |FROM m""".stripMargin.replace("\n", " "),
    "ql_lang" ->
      s"""WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS ws FROM documents),
         |m AS (SELECT doc_id, len(ws)::BIGINT AS n,
         |  len(list_filter(ws, x -> list_contains([$StopList], x)))::BIGINT AS stops FROM w)
         |SELECT doc_id AS id,
         | round(CASE WHEN n = 0 THEN 0 ELSE stops::DOUBLE / n END, 4) AS en_stop_ratio,
         | CASE WHEN n = 0 THEN 'unknown'
         |      WHEN (CASE WHEN n = 0 THEN 0 ELSE stops::DOUBLE / n END) >= 0.05 THEN 'en'
         |      ELSE 'other' END AS lang_pred
         |FROM m""".stripMargin.replace("\n", " "),
    "ql_fingerprint" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents)
        |SELECT doc_id AS id,
        | CASE WHEN len(ws) = 0 THEN sha256('')
        |      WHEN len(ws) <= 5 THEN sha256(array_to_string(ws, ' '))
        |      ELSE list_aggregate(
        |        [sha256(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])
        |         FOR i IN range(1, len(ws) - 3)], 'min')
        | END AS fingerprint
        |FROM w""".stripMargin.replace("\n", " ")
  )
}
