package graft.streaming

import org.apache.hadoop.fs.FileSystem
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.build.IndexBuilder
import graft.build.IndexBuilder.IndexConfig
import graft.corpus.CorpusSource
import graft.model.{CorpusRow, IndexStats}

/** Micro-batch ingestion (SURVEY.md §2.9): the reference's incremental
  * `put_document` stream is honestly a sequence of writer commits appending
  * immutable segments ([R] cockatrice/indexer.py via Raft log -> Whoosh
  * writer). Spark-native mapping: Structured Streaming `foreachBatch`, each
  * micro-batch appended as NEW segments in fresh docId/segId ranges, with
  * periodic hierarchical compaction (Merger) exactly like the reference's
  * merge policy. No watermark/event-time semantics exist to replicate.
  *
  * docId layout: every append starts at the next segment boundary
  * (docIdBase = (maxSegId+1) * segSize). Gaps in docId space are harmless —
  * N and avgfl come from manifest doc counts, never from max docId.
  */
object StreamingIngest {

  /** instrumentation for tools.StreamBench (round-5 item: make the
    * lexicon-update share of an append's wall measurable — the LSM delta
    * write should be a small constant share, never vocab-growing) */
  object IngestMetrics {
    @volatile var lastAppendLexiconSec: Double = 0.0
  }

  /** Append a static batch of new documents as fresh segments. */
  def append(spark: SparkSession, batch: Dataset[CorpusRow], indexDir: String,
             cfg: IndexConfig = IndexConfig()): IndexStats = {
    import spark.implicits._
    val fs = FileSystem.get(new java.net.URI(indexDir),
      spark.sparkContext.hadoopConfiguration)
    val existing = IndexBuilder.readManifests(fs, indexDir)
    // an index created empty (Engine.createIndex) carries authoritative
    // stats before its first segment exists — appended segments MUST use
    // the INDEX's segSize and analyzer chain, not the caller's cfg
    val statsOpt =
      if (fs.exists(new org.apache.hadoop.fs.Path(IndexBuilder.statsPath(indexDir))))
        Some(IndexBuilder.readStats(fs, indexDir))
      else None
    val (segIdBase, segSize, analyzer) = (existing, statsOpt) match {
      case (Seq(), None) => (0, cfg.segSize, cfg.analyzer)
      case (Seq(), Some(st)) =>
        (0, st.segSize, graft.analysis.AnalyzerSpec.fromString(st.analyzer))
      case (ms, Some(st)) =>
        (ms.map(_.segId).max + 1, st.segSize,
          graft.analysis.AnalyzerSpec.fromString(st.analyzer))
      case (ms, None) => (ms.map(_.segId).max + 1, cfg.segSize, cfg.analyzer)
    }
    val docIdBase = segIdBase.toLong * segSize

    val n = batch.count()
    if (n == 0) return IndexBuilder.readStats(fs, indexDir)
    val numNewSegs = ((n + segSize - 1) / segSize).toInt
    val newSegs = segIdBase until (segIdBase + numNewSegs)

    // stamp within the batch (D1 rank), then shift into the fresh range
    val stamped = IndexBuilder.stampDocIds(batch, cfg.sortPartitions)
      .map(d => d.copy(docId = d.docId + docIdBase))

    newSegs.grouped(cfg.segmentsPerBatch).foreach { group =>
      IndexBuilder.buildBatchForAppend(spark, fs, stamped, indexDir, group,
        cfg.copy(segSize = segSize, analyzer = analyzer))
    }

    val manifests = IndexBuilder.readManifests(fs, indexDir)
    val stats = IndexStats(
      numDocs = manifests.map(_.docCount).sum,
      totalFieldLen = manifests.map(_.rawLenSum).sum,
      numSegments = manifests.size,
      segSize = segSize,
      analyzer = analyzer.asString)
    // incremental: only the appended segments are scanned; the result is a
    // DELTA lexicon file (round-5 LSM — the base is neither read nor
    // rewritten; folds happen at MERGE_SMALL/compact cadence)
    val t0 = System.nanoTime()
    IndexBuilder.updateLexicon(spark, indexDir, newSegs)
    IngestMetrics.lastAppendLexiconSec = (System.nanoTime() - t0) / 1e9
    IndexBuilder.writeStats(fs, indexDir, stats)
    IndexBuilder.writeToc(fs, indexDir)
    stats
  }

  /** Upsert by unique key (the reference's `put_document` semantics:
    * putting an existing id is delete-then-add — [R] cockatrice/indexer.py
    * via Whoosh update_document). Unique key = (repo, path, commit).
    *
    * 1. look up the batch keys in the docstats sidecar (broadcast semi-join
    *    — the collected id set is bounded by the BATCH size, never the
    *    index size); 2. tombstone the old docIds; 3. append the batch as
    *    fresh segments. Like the reference, the replaced docs stay in
    *    N/avgfl until a compaction purges them (stats refresh on optimize
    *    is a separate pass). */
  def upsert(spark: SparkSession, batch: Dataset[CorpusRow], indexDir: String,
             cfg: IndexConfig = IndexConfig()): IndexStats = {
    import spark.implicits._
    val keys = batch.select($"repo", $"path", $"commit").distinct()
    // live-manifest filter (same defense as every docstats consumer): a
    // crashed merge can leave superseded segId dirs behind until GC, and an
    // unfiltered key lookup would return their docIds too
    val fsUp = FileSystem.get(new java.net.URI(indexDir),
      spark.sparkContext.hadoopConfiguration)
    val liveSegs = IndexBuilder.readManifests(fsUp, indexDir).map(_.segId)
    // a created-but-empty index has no docstats yet: nothing to replace
    val existing =
      if (liveSegs.isEmpty) Array.empty[Long]
      else spark.read.parquet(IndexBuilder.docstatsDir(indexDir))
        .filter($"segId".isin(liveSegs: _*))
        .select($"docId", $"repo", $"path", $"commit")
        .join(org.apache.spark.sql.functions.broadcast(keys), Seq("repo", "path", "commit"))
        .select($"docId").as[Long].collect()
    if (existing.nonEmpty) graft.build.Deletes.add(spark, indexDir, existing.toSeq)
    append(spark, batch, indexDir, cfg)
  }

  /** Start a streaming ingest: every micro-batch commits new segments;
    * every `compactEvery` batches the size-tiered MERGE_SMALL policy
    * (Merger.mergeSmall) folds the small tail into full segments — large
    * segments are never rewritten, so per-trigger merge work is bounded by
    * the recent appends, not the index (the round-3 wiring ran a full
    * compact-to-one here: an O(index) rewrite every N batches). */
  def start(spark: SparkSession, stream: Dataset[CorpusRow], indexDir: String,
            checkpointDir: String, cfg: IndexConfig = IndexConfig(),
            compactEvery: Int = 0, groupSize: Int = 8,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[CorpusRow], batchId: Long) =>
        append(spark, batch, indexDir, cfg)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
          graft.merge.Merger.mergeSmall(spark, indexDir, groupSize = groupSize)
          ()
        }
        ()
      }
      .start()
  }
}
