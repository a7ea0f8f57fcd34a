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

  /** merge an adjacent group of segIds into one segment (id = min of group);
    * optionally dropping a deletion set (M2: purge at merge). */
  def mergeGroup(spark: SparkSession, indexDir: String, group: Seq[Int],
                 deletes: Set[Long] = Set.empty): Int = {
    import spark.implicits._
    require(group.nonEmpty)
    val fs = FileSystem.get(new java.net.URI(indexDir),
      spark.sparkContext.hadoopConfiguration)
    val sorted = group.sorted
    val target = sorted.head
    val manifests = IndexBuilder.readManifests(fs, indexDir)
      .filter(m => sorted.contains(m.segId))
    require(manifests.size == sorted.size, s"missing manifests for $sorted")

    val delB = spark.sparkContext.broadcast(deletes)

    val segs = sorted.map { id =>
      spark.read.parquet(s"${IndexBuilder.segmentsDir(indexDir)}/segId=$id")
        .select($"term", $"df", $"maxTf", $"blocks", lit(id).as("segId"))
        .as[SegRead]
    }

    def mergeRuns(term: String, runs: Seq[SegRead]): Option[SegRow] = {
      // concatenate in segId order (== docId order); re-encode; drop deletes
      val ordered = runs.sortBy(_.segId)
      val dels = delB.value
      val it = ordered.iterator.flatMap(r => PostingsCodec.decodeIterator(r.blocks))
        .filterNot(p => dels.contains(p.docId))
      val enc = PostingsCodec.encode(it)
      if (enc.df == 0) None else Some(SegRow(target, term, enc.df, enc.maxTf, enc.bytes))
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
    merged.repartition(1, $"segId").sortWithinPartitions("segId", "term")
      .write.mode(SaveMode.Overwrite).partitionBy("segId").parquet(staging)

    // docstats: move the group's sidecars under the surviving segId (the
    // sidecar is keyed by docId; segId is only physical placement)
    val dsStaging = s"$staging-docstats"
    fs.delete(new Path(dsStaging), true)
    val docstats = sorted.map { id =>
      spark.read.parquet(s"${IndexBuilder.docstatsDir(indexDir)}/segId=$id")
    }.reduce(_ unionByName _)
    val filtered = if (deletes.isEmpty) docstats
      else docstats.filter(!$"docId".isin(deletes.toSeq: _*))
    val (mergedDocCount, mergedRawLen) = {
      val r = filtered.agg(count(lit(1)), sum($"rawLen")).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    filtered.withColumn("segId", lit(target))
      .write.mode(SaveMode.Overwrite).partitionBy("segId").parquet(dsStaging)

    // commit: remove old segment dirs + manifests, promote merged one
    sorted.foreach { id =>
      fs.delete(new Path(s"${IndexBuilder.segmentsDir(indexDir)}/segId=$id"), true)
      fs.delete(new Path(s"${IndexBuilder.docstatsDir(indexDir)}/segId=$id"), true)
      fs.delete(new Path(s"${IndexBuilder.manifestsDir(indexDir)}/seg-$id.json"), false)
    }
    require(fs.rename(new Path(s"$staging/segId=$target"),
      new Path(s"${IndexBuilder.segmentsDir(indexDir)}/segId=$target")))
    require(fs.rename(new Path(s"$dsStaging/segId=$target"),
      new Path(s"${IndexBuilder.docstatsDir(indexDir)}/segId=$target")))
    fs.delete(new Path(staging), true)
    fs.delete(new Path(dsStaging), true)

    // refreshed manifest for the merged segment
    val m = SegmentManifest(
      segId = target,
      docLo = manifests.map(_.docLo).min,
      docHi = manifests.map(_.docHi).max,
      docCount = mergedDocCount,
      rawLenSum = mergedRawLen,
      postingRows = -1, postingBytes = -1, // recomputable; not load-bearing
      digest = "merged",
      source = s"merge(${sorted.mkString(",")})")
    IndexBuilder.writeManifest(fs, indexDir, m)
    target
  }

  /** hierarchical compaction: repeatedly merge adjacent groups of
    * `groupSize` until one segment remains (reference `optimize_index`).
    * With `applyDeletes`, the index's tombstone set is purged during the
    * merge and cleared once fully compacted (M2). */
  def compact(spark: SparkSession, indexDir: String, groupSize: Int = 8,
              applyDeletes: Boolean = false): Unit = {
    require(groupSize >= 2)
    val fs = FileSystem.get(new java.net.URI(indexDir),
      spark.sparkContext.hadoopConfiguration)
    val dels = if (applyDeletes) graft.build.Deletes.read(spark, indexDir) else Set.empty[Long]
    var ids = IndexBuilder.readManifests(fs, indexDir).map(_.segId)
    while (ids.size > 1) {
      ids = ids.sorted.grouped(groupSize).map { g =>
        if (g.size == 1) g.head else mergeGroup(spark, indexDir, g, dels)
      }.toSeq
    }
    if (applyDeletes && dels.nonEmpty) {
      // stats refresh after physical purge (N/avgfl shrink with the purge)
      val manifests = IndexBuilder.readManifests(fs, indexDir)
      val st = IndexBuilder.readStats(fs, indexDir)
      IndexBuilder.writeStats(fs, indexDir, st.copy(
        numDocs = manifests.map(_.docCount).sum,
        totalFieldLen = manifests.map(_.rawLenSum).sum))
      IndexBuilder.writeLexicon(spark, indexDir)
      graft.build.Deletes.clear(spark, indexDir)
    }
  }
}
