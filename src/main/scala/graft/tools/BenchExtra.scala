package graft.tools

import org.apache.spark.sql.SparkSession

import graft.search.Searcher

/** r6 query-path micro-bench (guide §1.4): opens an ALREADY-BUILT bench
  * index (build it once with graft.Bench) and times each bench query with
  * many reps, optionally with AQE disabled (GRAFT_EXTRA_AQE=0), printing
  * avg/min per query plus driver-side job/gap decomposition for the first
  * query. NOT part of the driver contract — graft.Bench stays the measured
  * harness; numbers here are cited in OPTIMIZATION_r06.md only. */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "120000").toLong
    val reps = sys.env.getOrElse("GRAFT_EXTRA_REPS", "20").toInt
    val aqe = !sys.env.get("GRAFT_EXTRA_AQE").contains("0")
    val tmpfs = new java.io.File("/dev/shm").isDirectory
    val scratch = if (tmpfs) "/dev/shm/graft-bench" else "/tmp/graft-bench"
    val ixDir = s"$scratch/ix-c$cpus-n$nDocs"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val handle = Searcher.open(spark, ixDir)
    val queries = Seq(
      "q_term_hot" -> "w0000",
      "q_term_cold" -> "w5000",
      "q_and" -> "w0003 AND w0007",
      "q_or_hot" -> "w0000 OR w0001 OR w0002",
      "q_phrase" -> "\"needle alpha beta\"",
      "q_mixed" -> "w0002 AND (w0010 OR w0020)",
      "q_not" -> "w0004 NOT w0000")

    // decompose one warm query: job wall + inter-job driver gap
    queries.take(1).foreach { case (_, q) =>
      Searcher.search(spark, handle, q, 10).collect() // warm
      val t0 = System.nanoTime()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private var lastEnd = System.nanoTime()
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val now = System.nanoTime()
          starts.put(js.jobId, now)
          System.err.println(f"[extra] gap before job ${js.jobId}: ${(now - lastEnd) / 1e6}%.1f ms")
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val now = System.nanoTime()
          val st = Option(starts.get(je.jobId)).getOrElse(now)
          System.err.println(f"[extra] job ${je.jobId}: ${(now - st) / 1e6}%.1f ms")
          lastEnd = now
        }
      })
      (0 until 3).foreach { i =>
        val s = System.nanoTime()
        Searcher.search(spark, handle, q, 10).collect()
        System.err.println(f"[extra] rep $i total: ${(System.nanoTime() - s) / 1e6}%.1f ms")
      }
      System.err.println(f"[extra] decomposition block: ${(System.nanoTime() - t0) / 1e6}%.1f ms")
    }

    val out = queries.map { case (name, q) =>
      Searcher.search(spark, handle, q, 10).collect() // warm
      val ts = (0 until reps).map { _ =>
        val s0 = System.nanoTime()
        val ds = Searcher.search(spark, handle, q, 10)
        val s1 = System.nanoTime()
        ds.queryExecution.executedPlan // force analysis+optimization+planning
        val s2 = System.nanoTime()
        ds.collect()
        val s3 = System.nanoTime()
        ((s1 - s0) / 1e6, (s2 - s1) / 1e6, (s3 - s2) / 1e6)
      }
      def stat(f: ((Double, Double, Double)) => Double) =
        f"avg=${ts.map(f).sum / reps}%.1f min=${ts.map(f).min}%.1f"
      f"$name total[${stat(t => t._1 + t._2 + t._3)}] construct[${stat(_._1)}] " +
        f"plan[${stat(_._2)}] exec[${stat(_._3)}] ms"
    }
    println(s"[extra] aqe=$aqe cpus=$cpus")
    out.foreach(println)

    // composite surfaces (same actions the bench times)
    def timed(name: String)(body: => Unit): Unit = {
      body // warm
      val ts = (0 until math.max(5, reps / 2)).map { _ =>
        val s = System.nanoTime(); body; (System.nanoTime() - s) / 1e6
      }
      println(f"$name avg=${ts.sum / ts.size}%.1f min=${ts.min}%.1f ms")
    }
    timed("q_every") { Searcher.search(spark, handle, "NOT w0004", 10).collect(); () }
    timed("q_spannear") {
      Searcher.search(spark, handle, "w0000 NEAR/5 w0001", 10).collect(); ()
    }
    timed("q_batch10") {
      Searcher.searchMany(spark, handle, queries, 10).collect(); ()
    }
    timed("q_faceted") {
      val fsr = Searcher.searchFaceted(spark, handle, "w0000", "lang",
        Seq("rawLen" -> false), k = 10)
      try { fsr.facets.collect(); fsr.hits.collect(); () }
      finally fsr.close()
    }
    // A/B: same queries through the r5 shuffle kernel (guard forced off)
    val hShuffle = new Searcher.IndexHandle(handle.indexDir, handle.stats,
      handle.segSize, handle.segments, handle.lexicon, handle.delRanges,
      handle.chain, handle.lexgrams, handle.liveSegIds, segColocated = false)
    timed("q_term_hot_shuffle") {
      Searcher.search(spark, hShuffle, "w0000", 10).collect(); ()
    }
    timed("q_faceted_shuffle") {
      val fsr = Searcher.searchFaceted(spark, hShuffle, "w0000", "lang",
        Seq("rawLen" -> false), k = 10)
      try { fsr.facets.collect(); fsr.hits.collect(); () }
      finally fsr.close()
    }
    spark.stop()
  }
}
