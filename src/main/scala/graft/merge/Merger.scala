package graft.merge

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.build.IndexBuilder
import graft.codec.PostingsCodec
import graft.model._

/** Segment merge / compaction (SURVEY.md §2.5 M1-M2, §3.3): the reference's
  * `optimize()` — k-way merge of term dictionaries, posting lists of shared
  * terms concatenated in docId order ([W] whoosh/writing.py merge policies).
  *
  * Spark-native: a sort-merge cogroup on `term`. Because docIds are global
  * and segments are disjoint docId ranges (decision D1), no docnum remap is
  * needed — runs concatenate in segId order. Pairwise merges use
  * KeyValueGroupedDataset.cogroup (BASELINE.json:6); wider groups use one
  * union + groupByKey pass, i.e. an n-ary cogroup in a single shuffle.
  * Hierarchy: `compact(groupSize)` repeatedly merges adjacent groups —
  * log_groupSize(n) levels to a single segment.
  */
object Merger {

  /** Merge a group of segIds into one NEW segment (fresh segId = max live
    * segId + 1 — never an in-place overwrite), optionally dropping a
    * deletion set (M2: purge at merge).
    *
    * Crash-safe commit protocol (mirrors the build's promote-then-manifest):
    *   1. write merged postings + docstats to staging, promote both into
    *      place under the FRESH segId (no collision with live dirs);
    *   2. write the merged manifest — THE commit point: its `absorbed` list
    *      supersedes the old manifests the moment it lands (readManifests
    *      resolves supersession), and `covers` carries the transitive
    *      build-layout lineage for resume;
    *   3. delete the old manifests, then the old segment dirs — pure GC;
    *      a crash anywhere leaves a readable, correct index.
    *
    * Merged postings are written as `group.size` term-range-partitioned,
    * term-sorted files inside the one segment dir (readers do partition/file
    * discovery; parquet min/max stats on `term` stay sharp per file) — a
    * full compaction never funnels the index through a single task. */
  def mergeGroup(spark: SparkSession, indexDir: String, group: Seq[Int],
                 deletes: Set[Long] = Set.empty): Int = {
    import spark.implicits._
    require(group.nonEmpty)
    val fs = FileSystem.get(new java.net.URI(indexDir),
      spark.sparkContext.hadoopConfiguration)
    val sorted = group.sorted
    val live = IndexBuilder.readManifests(fs, indexDir)
    // GC crash leftovers BEFORE picking the target id: a crash between
    // promote and manifest write leaves segId dirs with no live manifest —
    // a rerun recomputes the same target (max live segId + 1) and the
    // promote rename would collide. Readers trust manifests only, so any
    // segments/docstats dir without one is garbage (this also sweeps
    // superseded dirs left by a crash after the manifest commit, which
    // would otherwise double-count into the next lexicon rebuild).
    gcOrphanDirs(fs, indexDir, live.map(_.segId).toSet)
    val target = live.map(_.segId).max + 1
    val manifests = live.filter(m => sorted.contains(m.segId))
    require(manifests.size == sorted.size, s"missing manifests for $sorted")

    // tombstones ride as a broadcast SORTED ARRAY probed by binary search
    // (exactly like the query kernel) — never as Catalyst literals: a full
    // compaction of a heavily-deleted index can carry 10^5-10^6 ids, and an
    // `isin` of that many literals bloats the plan toward driver OOM
    val delB = spark.sparkContext.broadcast {
      val a = deletes.toArray
      java.util.Arrays.sort(a)
      a
    }
    val targetId = target

    // concatenation order = docId order = the segments' docLo order. With
    // fresh merge segIds this is NOT segId order: a second-level merge can
    // pair a high-segId merged segment holding LOW docIds with a low-segId
    // original holding high ones.
    val docLoRank: Map[Int, Int] = manifests.sortBy(m => (m.docLo, m.segId))
      .map(_.segId).zipWithIndex.toMap
    // whole-run concatenation cannot interleave docIds: group members must
    // not straddle each other's ranges (compact() guarantees this by
    // grouping docLo-adjacent segments; reject misuse fast)
    manifests.filter(_.docCount > 0).sortBy(_.docLo).sliding(2).foreach {
      case Seq(a, b) => require(a.docHi < b.docLo,
        s"segments ${a.segId} [${a.docLo},${a.docHi}] and ${b.segId} " +
          s"[${b.docLo},${b.docHi}] interleave; merge docLo-adjacent groups")
      case _ => ()
    }

    val segs = sorted.map { id =>
      spark.read.parquet(s"${IndexBuilder.segmentsDir(indexDir)}/segId=$id")
        .select($"term", $"df", $"maxTf", $"blocks", lit(id).as("segId"))
        .as[SegRead]
    }

    def mergeRuns(term: String, runs: Seq[SegRead]): Option[SegRow] = {
      // concatenate in docLo order (== docId order); re-encode; drop deletes
      val ordered = runs.sortBy(r => docLoRank(r.segId))
      val dels = delB.value
      val it = ordered.iterator.flatMap(r => PostingsCodec.decodeIterator(r.blocks))
        .filterNot(p => java.util.Arrays.binarySearch(dels, p.docId) >= 0)
      val enc = PostingsCodec.encode(it)
      if (enc.df == 0) None
      else Some(SegRow(targetId, term, enc.df, enc.maxTf, enc.cf, enc.bytes))
    }

    val merged =
      if (segs.size == 2) {
        // the pinned pairwise sort-merge cogroup
        segs(0).groupByKey(_.term).cogroup(segs(1).groupByKey(_.term)) {
          (term, as, bs) => mergeRuns(term, (as ++ bs).toSeq).iterator
        }
      } else {
        segs.reduce(_ union _).groupByKey(_.term).flatMapGroups { (term, it) =>
          mergeRuns(term, it.toSeq).iterator
        }
      }

    val staging = s"${IndexBuilder.stagingDir(indexDir)}-merge"
    fs.delete(new Path(staging), true)
    merged.repartitionByRange(math.max(2, sorted.size), $"term")
      .sortWithinPartitions("term")
      .write.mode(SaveMode.Overwrite).partitionBy("segId").parquet(staging)

    // real metrics for the merged manifest — same digest/row/byte contract
    // as a fresh build (BASELINE.json "per-partition lineage and
    // row-count/sha256 metrics" must survive compaction). A fully-
    // tombstoned group writes no files at all — empty metrics.
    val (postRows, postBytes, digest) =
      if (!fs.exists(new Path(s"$staging/segId=$targetId"))) (0L, 0L, "0" * 32)
      else IndexBuilder.postingMetrics(spark, staging)
        .getOrElse(targetId, (0L, 0L, "0" * 32))

    // docstats: the group's sidecars re-keyed under the fresh segId (the
    // sidecar is keyed by docId; segId is only physical placement)
    val dsStaging = s"$staging-docstats"
    fs.delete(new Path(dsStaging), true)
    val docstats = sorted.map { id =>
      spark.read.parquet(s"${IndexBuilder.docstatsDir(indexDir)}/segId=$id")
    }.reduce(_ unionByName _)
    val filtered = if (deletes.isEmpty) docstats
      else {
        // same broadcast binary-search probe as mergeRuns (bounded by the
        // group's ranges but NOT by literal-count — see delB note above)
        val docIdIdx = docstats.schema.fieldIndex("docId")
        docstats.filter((r: org.apache.spark.sql.Row) =>
          java.util.Arrays.binarySearch(delB.value, r.getLong(docIdIdx)) < 0)
      }
    val (mergedDocCount, mergedRawLen) = {
      val r = filtered.agg(count(lit(1)), sum($"rawLen")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    filtered.withColumn("segId", lit(targetId))
      .write.mode(SaveMode.Overwrite).partitionBy("segId").parquet(dsStaging)

    // 1. promote into place under the fresh segId (a group whose docs were
    // ALL tombstoned writes no partition dir — commit an empty segment)
    def promote(from: String, to: String): Unit = {
      val src = new Path(from)
      val dst = new Path(to)
      if (!fs.exists(src)) { fs.mkdirs(dst); return }
      if (!fs.exists(dst.getParent)) fs.mkdirs(dst.getParent)
      require(fs.rename(src, dst), s"promote failed: $from -> $to")
    }
    promote(s"$staging/segId=$targetId",
      s"${IndexBuilder.segmentsDir(indexDir)}/segId=$targetId")
    promote(s"$dsStaging/segId=$targetId",
      s"${IndexBuilder.docstatsDir(indexDir)}/segId=$targetId")
    fs.delete(new Path(staging), true)
    fs.delete(new Path(dsStaging), true)

    // 2. the commit point: merged manifest supersedes the group
    val m = SegmentManifest(
      segId = targetId,
      docLo = manifests.map(_.docLo).min,
      docHi = manifests.map(_.docHi).max,
      docCount = mergedDocCount,
      rawLenSum = mergedRawLen,
      postingRows = postRows, postingBytes = postBytes,
      digest = digest,
      source = s"merge(${sorted.mkString(",")})",
      covers = manifests.flatMap(_.coverSet).distinct.sorted,
      absorbed = sorted)
    IndexBuilder.writeManifest(fs, indexDir, m)

    // 3. GC the superseded manifests, then their dirs
    sorted.foreach { id =>
      fs.delete(new Path(s"${IndexBuilder.manifestsDir(indexDir)}/seg-$id.json"), false)
    }
    sorted.foreach { id =>
      fs.delete(new Path(s"${IndexBuilder.segmentsDir(indexDir)}/segId=$id"), true)
      fs.delete(new Path(s"${IndexBuilder.docstatsDir(indexDir)}/segId=$id"), true)
    }
    // refresh the TOC cache at the commit point (cheap: one listing + one
    // small write; stale-TOC readers fall back to per-file reads anyway)
    IndexBuilder.writeToc(fs, indexDir)
    targetId
  }

  /** delete segments/docstats `segId=N` dirs whose N has no live manifest
    * (single-writer assumption: no build or merge runs concurrently) */
  private[graft] def gcOrphanDirs(fs: FileSystem, indexDir: String,
                                  live: Set[Int]): Unit = {
    Seq(IndexBuilder.segmentsDir(indexDir), IndexBuilder.docstatsDir(indexDir))
      .foreach { d =>
        val p = new Path(d)
        if (fs.exists(p)) fs.listStatus(p).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith("segId=") &&
              n.stripPrefix("segId=").toIntOption.exists(id => !live.contains(id)))
            fs.delete(st.getPath, true)
        }
      }
  }

  /** Size-tiered incremental merge policy ([W] whoosh/writing.py
    * MERGE_SMALL: "merge only small segments, leave big ones alone" — the
    * default policy of every Whoosh writer commit): merge runs of ADJACENT
    * (docLo-ordered) segments whose docCount < `smallDocs` (default: the
    * index's segSize, i.e. "not yet a full segment") into one fresh
    * segment each, leaving large segments untouched.
    *
    * This is the continuous-ingestion policy: work per invocation is
    * proportional to the small TAIL, never the index, so segment count
    * stays bounded (large segments + at most one growing small run)
    * without the compact-to-one full rewrite — at 10^12 docs an optimize
    * per N micro-batches would rewrite the whole index; this rewrites only
    * the freshly appended data. Deletes are NOT purged here (a pure
    * concatenation keeps every term's global df, so the lexicon needs no
    * rebuild); purge stays with compact(applyDeletes)/optimize.
    *
    * Returns the freshly minted segIds. */
  def mergeSmall(spark: SparkSession, indexDir: String, smallDocs: Long = 0,
                 groupSize: Int = 8): Seq[Int] = {
    require(groupSize >= 2)
    val fs = FileSystem.get(new java.net.URI(indexDir),
      spark.sparkContext.hadoopConfiguration)
    val target =
      if (smallDocs > 0) smallDocs
      else IndexBuilder.readStats(fs, indexDir).segSize.toLong
    val ms = IndexBuilder.readManifests(fs, indexDir)
    val minted = scala.collection.mutable.ArrayBuffer.empty[Int]
    var run = List.empty[SegmentManifest]
    def flush(): Unit = {
      if (run.size >= 2) minted += mergeGroup(spark, indexDir, run.map(_.segId))
      run = Nil
    }
    ms.sortBy(m => (m.docLo, m.segId)).foreach { m =>
      if (m.docCount >= target) flush() // a large segment breaks the run
      else {
        run = run :+ m
        // the accumulated run has reached full-segment size (its merge
        // graduates to "large") or the fan-in cap: merge it now
        if (run.size == groupSize || run.map(_.docCount).sum >= target) flush()
      }
    }
    flush()
    if (minted.nonEmpty) {
      val st = IndexBuilder.readStats(fs, indexDir)
      IndexBuilder.writeStats(fs, indexDir, st.copy(
        numSegments = IndexBuilder.readManifests(fs, indexDir).size))
    }
    // LSM lexicon fold (round-5): the same cadence that bounds the segment
    // tail folds pending delta lexicons into the base — per-append work
    // stays delta-sized, the vocab-sized rewrite is paid here
    IndexBuilder.foldLexiconDeltas(spark, indexDir)
    minted.toSeq
  }

  /** hierarchical compaction: repeatedly merge adjacent groups of
    * `groupSize` until one segment remains (reference `optimize_index`).
    * With `applyDeletes`, the index's tombstone set is purged during the
    * merge and cleared once fully compacted (M2). */
  /** Whoosh `writer.optimize()` / the reference's optimize endpoint
    * ([R] cockatrice optimize): hierarchically compact the whole index to
    * ONE segment, physically purging tombstones and refreshing stats. */
  def optimize(spark: SparkSession, indexDir: String): Unit =
    compact(spark, indexDir, applyDeletes = true)

  def compact(spark: SparkSession, indexDir: String, groupSize: Int = 8,
              applyDeletes: Boolean = false): Unit = {
    require(groupSize >= 2)
    val fs = FileSystem.get(new java.net.URI(indexDir),
      spark.sparkContext.hadoopConfiguration)
    val delRids = if (applyDeletes) graft.build.Deletes.listRanges(fs, indexDir)
      else Set.empty[Long]
    val hadDeletes = delRids.nonEmpty
    val purged = scala.collection.mutable.Set.empty[Int]
    var ms = IndexBuilder.readManifests(fs, indexDir)
    while (ms.size > 1) {
      // group segments ADJACENT IN docId ORDER (docLo), the LSM invariant:
      // merged ranges stay concatenable at every level regardless of the
      // fresh segIds merges mint
      val byId = ms.map(m => m.segId -> m).toMap
      ms.sortBy(m => (m.docLo, m.segId)).map(_.segId).grouped(groupSize).foreach { g =>
        if (g.size > 1) {
          // purge set bounded by THIS group's doc ranges (per-range
          // sidecars), never the index-wide tombstone count
          val dels = if (applyDeletes)
            graft.build.Deletes.forCovers(fs, indexDir, g.flatMap(byId(_).coverSet))
          else Set.empty[Long]
          val merged = mergeGroup(spark, indexDir, g, dels)
          if (applyDeletes) purged += merged
        }
      }
      ms = IndexBuilder.readManifests(fs, indexDir)
    }
    if (hadDeletes) {
      // segments the merge loop never rewrote (odd leftovers, or an index
      // already compacted to one segment) still hold tombstoned postings:
      // rewrite each one whose covered ranges intersect the tombstones —
      // without this, the clear() below would silently DROP deletions
      IndexBuilder.readManifests(fs, indexDir)
        .filterNot(m => purged.contains(m.segId))
        .filter(m => m.coverSet.exists(r => delRids.contains(r.toLong)))
        .foreach { m =>
          val dels = graft.build.Deletes.forCovers(fs, indexDir, m.coverSet)
          if (dels.nonEmpty) mergeGroup(spark, indexDir, Seq(m.segId), dels)
        }
    }
    val manifests = IndexBuilder.readManifests(fs, indexDir)
    val st = IndexBuilder.readStats(fs, indexDir)
    if (hadDeletes) {
      // stats refresh after physical purge (N/avgfl shrink with the purge)
      IndexBuilder.writeStats(fs, indexDir, st.copy(
        numDocs = manifests.map(_.docCount).sum,
        totalFieldLen = manifests.map(_.rawLenSum).sum,
        numSegments = manifests.size))
      // full lexicon rebuild covers everything — writeLexicon GCs lexdeltas
      IndexBuilder.writeLexicon(spark, indexDir)
      graft.build.Deletes.clear(spark, indexDir)
    } else {
      IndexBuilder.writeStats(fs, indexDir, st.copy(numSegments = manifests.size))
      IndexBuilder.foldLexiconDeltas(spark, indexDir)
    }
  }
}
