package graft

import org.apache.spark.sql.SparkSession

import graft.build.IndexBuilder
import graft.build.IndexBuilder.IndexConfig
import graft.corpus.CorpusSource
import graft.search.Searcher

/** Benchmark main (BASELINE.md protocol): index-build throughput (docs/sec)
  * + BM25 query latency sweep over the deterministic synthetic corpus, at
  * the parallelism given by SPARK_GRAFT_CPUS. Run at 8 and 32 cpus on the
  * same input to evidence the N -> 4N scaling-efficiency rule
  * (BASELINE.json:14; no real cluster in the sandbox — see BENCH/BASELINE.md).
  *
  * Prints ONE JSON line: metric/value/unit/queries/sf plus extras
  * (docs_per_sec, build_sec, query p50/p95, index digest for cross-
  * parallelism determinism checks).
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // shuffle + ephemeral bench artifacts live on tmpfs when available: the
    // sandbox's shared virtio disk is the noisiest non-scaling resource, and
    // a real cluster's local NVMe + network shuffle is better approximated
    // by RAM than by a contended /dev/vda (set GRAFT_BENCH_TMPFS=0 to opt out)
    val tmpfs = !sys.env.get("GRAFT_BENCH_TMPFS").contains("0") &&
      new java.io.File("/dev/shm").isDirectory
    val scratch = if (tmpfs) "/dev/shm/graft-bench" else "/tmp/graft-bench"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus size scales with the sf tier: sf0.1 -> 120k docs (~30M tokens)
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)
    val nDocs = sys.env.get("SPARK_GRAFT_BENCH_DOCS").map(_.toLong)
      .getOrElse(math.max(2000L, (sf * 1.2e6).toLong))

    val ixDir = s"$scratch/ix-c$cpus-n$nDocs"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(ixDir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(ixDir), true)

    // job-boundary tracing: wall time per job + inter-job driver gaps
    if (sys.env.get("GRAFT_BUILD_TIMING").contains("1")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private var lastEnd = System.nanoTime()
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val now = System.nanoTime()
          starts.put(js.jobId, now)
          System.err.println(f"[jobs] gap before job ${js.jobId}: ${(now - lastEnd) / 1e9}%.2f s")
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val now = System.nanoTime()
          val st = Option(starts.get(je.jobId)).getOrElse(now)
          System.err.println(f"[jobs] job ${je.jobId}: ${(now - st) / 1e9}%.2f s")
          lastEnd = now
        }
      })
    }

    // ---- corpus as a TABLE (untimed prep): the production input is an
    // Iceberg/parquet table (BASELINE.json:15), so the timed build reads a
    // materialized corpus, not an in-flight generator ----
    val corpusPath = s"$scratch/corpus-n$nDocs"
    val cfs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(corpusPath), spark.sparkContext.hadoopConfiguration)
    if (!cfs.exists(new org.apache.hadoop.fs.Path(corpusPath, "_SUCCESS"))) {
      CorpusSource.synth(spark, nDocs, 42L, cpus * 2)
        .write.mode("overwrite").parquet(corpusPath)
    }
    val corpus = CorpusSource.read(spark, "parquet", corpusPath)

    // ---- build throughput (fixed work W = full index build) ----
    val t0 = System.nanoTime()
    // segment size scales with the corpus (target ~128 segments) but NOT
    // with cpus: the N- and 4N-core runs must execute identical work
    val segSize = math.max(4096L, nDocs / 128L).toInt
    // tuning knobs for the scaling experiments (BENCH/BASELINE.md)
    val phase2Parts = sys.env.get("GRAFT_BENCH_PHASE2_PARTS").map(_.toInt).getOrElse(0)
    val noPersist = sys.env.get("GRAFT_BENCH_NO_PERSIST").contains("1")
    IndexBuilder.build(spark, corpus, ixDir,
      IndexConfig(segSize = segSize, sortPartitions = cpus * 2,
        phase2Partitions = phase2Parts, persistAnalyzed = !noPersist))
    val buildSec = (System.nanoTime() - t0) / 1e9
    val docsPerSec = nDocs / buildSec

    // determinism witness across parallelism levels: digest over manifests
    val manifests = IndexBuilder.readManifests(fs, ixDir)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    manifests.sortBy(_.segId).foreach(m => md.update(m.digest.getBytes))
    val indexDigest = md.digest().take(8).map(b => f"$b%02x").mkString

    // ---- query latency sweep ----
    val handle = Searcher.open(spark, ixDir)
    val queries = Seq(
      "q_term_hot" -> "w0000",
      "q_term_mid" -> "w0100",
      "q_term_cold" -> "w5000",
      "q_and" -> "w0003 AND w0007",
      "q_and_hot" -> "w0000 AND w0001",
      "q_or_hot" -> "w0000 OR w0001 OR w0002",
      "q_or_mixed" -> "w0005 OR w2000 OR w7000",
      "q_phrase" -> "\"needle alpha beta\"",
      "q_mixed" -> "w0002 AND (w0010 OR w0020)",
      "q_not" -> "w0004 NOT w0000")

    // warm-up (JIT + parquet footer caches), then timed reps
    queries.foreach { case (_, q) => Searcher.search(spark, handle, q, 10).collect() }
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val lats = scala.collection.mutable.ArrayBuffer.empty[Double]
    val perQuery = queries.map { case (name, q) =>
      val ts = (0 until reps).map { _ =>
        val s = System.nanoTime()
        Searcher.search(spark, handle, q, 10).collect()
        val d = (System.nanoTime() - s) / 1e9
        lats += d
        d
      }
      name -> ts.sum / reps
    }

    // ---- round-3/4 surfaces: Every/NOT (persisted pseudo lists), batch
    // serving, multi-field, delete-laden. Timed per query and reported in
    // the same queries map, but EXCLUDED from p50/p95 so percentiles stay
    // comparable with earlier rounds' 10-query sweep (protocol note in
    // BENCH/BASELINE.md). ----
    val extras = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timeIt(name: String)(f: => Unit): Unit = {
      f // warm-up
      val ts = (0 until reps).map { _ =>
        val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
      }
      extras += name -> (ts.sum / reps)
    }
    // pure negation: the D14 persisted match-all pseudo-list path
    timeIt("q_every") { Searcher.search(spark, handle, "NOT w0004", 10).collect(); () }
    // span proximity over the positional cursors
    timeIt("q_spannear") {
      Searcher.search(spark, handle, "w0000 NEAR/5 w0001", 10).collect(); ()
    }
    // the serving shape: all 10 base queries as ONE job
    timeIt("q_batch10") {
      Searcher.searchMany(spark, handle, queries, 10).collect(); ()
    }
    // round-5: SpanFirst over the positional cursors (early-position filter)
    timeIt("q_spanfirst") {
      Searcher.searchQ(spark, handle,
        graft.search.QSpanFirst(graft.search.QTerm("w0000"), 16), 10)
        .collect(); ()
    }
    // round-5: combined facets + sorted hits from ONE kernel pass
    timeIt("q_faceted") {
      val fsr = Searcher.searchFaceted(spark, handle, "w0000", "lang",
        Seq("rawLen" -> false), k = 10)
      try { fsr.facets.collect(); fsr.hits.collect(); () }
      finally fsr.close()
    }
    // multi-field: a path-field index built UNTIMED beside the content
    // index (deterministic, cached in scratch); the two-field handle runs
    // a field-qualified OR
    locally {
      import spark.implicits._
      val pathIx = s"$scratch/ixpath-c$cpus-n$nDocs"
      val pfs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(pathIx), spark.sparkContext.hadoopConfiguration)
      // wipe a cached index with a stale on-disk format (Searcher.open
      // fails fast on foreign layouts, so the cache must migrate here)
      if (pfs.exists(new org.apache.hadoop.fs.Path(
            graft.build.IndexBuilder.statsPath(pathIx))) &&
          IndexBuilder.readStats(pfs, pathIx).formatVersion !=
            graft.model.IndexStats.CurrentFormat) {
        pfs.delete(new org.apache.hadoop.fs.Path(pathIx), true)
      }
      if (!pfs.exists(new org.apache.hadoop.fs.Path(
          graft.build.IndexBuilder.statsPath(pathIx)))) {
        IndexBuilder.build(spark,
          corpus.map(r => r.copy(content = r.path)), pathIx,
          IndexConfig(segSize = segSize, sortPartitions = cpus * 2))
      }
      val mfFields = Seq(
        graft.build.MultiFieldIndex.FieldSpec("content", _.content),
        graft.build.MultiFieldIndex.FieldSpec("path", _.path))
      val mh = new graft.search.MultiFieldSearcher.MultiHandle(ixDir, mfFields,
        Map("content" -> handle, "path" -> Searcher.open(spark, pathIx)))
      timeIt("q_field") {
        // doc 40's synth path is src/f0000000040.scala (ext cycles i%5)
        graft.search.MultiFieldSearcher.search(spark, mh,
          "w0003 OR path:f0000000040.scala^2", 10).collect(); ()
      }
    }
    // delete-laden: tombstone 2% of docs, reopen (handles snapshot the
    // delete set), remeasure the hot term and the pure-NOT query — the
    // kernel's executor-side tombstone probe is on the path
    graft.build.Deletes.add(spark, ixDir, 0L until math.max(1L, nDocs / 50L))
    val handleDel = Searcher.open(spark, ixDir)
    timeIt("q_term_del") { Searcher.search(spark, handleDel, "w0000", 10).collect(); () }
    timeIt("q_every_del") { Searcher.search(spark, handleDel, "NOT w0004", 10).collect(); () }

    val sorted = lats.sorted
    def pct(p: Double) = sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))
    val total = buildSec + lats.sum

    val qJson = (("build" -> buildSec) +: (perQuery ++ extras))
      .map { case (k, v) => s""""$k":${f"$v%.4f"}""" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qJson,""" +
        s""""sf":"$sfDir","n_docs":$nDocs,"cpus":$cpus,""" +
        s""""build_sec":${f"$buildSec%.3f"},"docs_per_sec":${f"$docsPerSec%.1f"},""" +
        s""""query_p50_ms":${f"${pct(0.5) * 1000}%.1f"},"query_p95_ms":${f"${pct(0.95) * 1000}%.1f"},""" +
        s""""num_segments":${manifests.size},"index_digest":"$indexDigest"}""")
    spark.stop()
  }
}
