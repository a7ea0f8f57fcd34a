package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r6 optimization-round plan dumps: explain("formatted") for every
  * operator/query touched this round, written to plans/r06/<name>_<tag>.txt
  * (tag = argv(0), "before" or "after"). Not part of the driver contract. */
object PlansR06 {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "after"
    val outDir = new java.io.File("plans/r06")
    outDir.mkdirs()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(new java.io.File(outDir, s"${name}_$tag.txt"))
      try w.write(txt) finally w.close()
      System.err.println(s"[plans-r06] wrote ${name}_$tag.txt")
    }

    // deterministic mini corpus (shape only — plans don't depend on size)
    val docs = (0L until 64L).map { i =>
      (i, s"alpha beta w$i gamma delta line one\nshared boilerplate line\n" +
        s"tail ${i % 7} text", if (i % 5 == 0) "en" else s"l${i % 3}")
    }.toDF("doc_id", "text", "lang")
    val vecs = (0L until 64L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat / 13f))
    }.toDF("vec_id", "embedding")
    val q = Array.tabulate(8)(d => (d % 5).toFloat / 5f)

    dump("dd_dupspans",
      graft.ops.Dedup.dupSpanStats(docs, "doc_id", "text", 5, 2))
    dump("dd_striplines",
      graft.ops.Dedup.stripRepeatedLines(docs, "doc_id", "text", 3L))
    dump("sl_ppl_bucket",
      graft.ops.Selection.pplBuckets(docs, "doc_id", "text", "lang", 3))
    dump("ann_sq8_topk",
      graft.ops.Similarity.sq8TopK(vecs, "vec_id", "embedding", q, 10))

    // bench-query plans against a pre-built bench index (run graft.Bench
    // first); skipped when the index is absent
    val ixDir = sys.env.getOrElse("GRAFT_PLANS_IX",
      "/dev/shm/graft-bench/ix-c32-n120000")
    if (new java.io.File(ixDir).isDirectory) {
      val h = graft.search.Searcher.open(spark, ixDir)
      val qs = Seq(
        "q_term_hot" -> "w0000",
        "q_and" -> "w0003 AND w0007",
        "q_or_hot" -> "w0000 OR w0001 OR w0002",
        "q_phrase" -> "\"needle alpha beta\"",
        "q_mixed" -> "w0002 AND (w0010 OR w0020)",
        "q_not" -> "w0004 NOT w0000",
        "q_every" -> "NOT w0004")
      qs.foreach { case (name, q) =>
        dump(name, graft.search.Searcher.search(spark, h, q, 10).toDF())
      }
      dump("q_spannear", graft.search.Searcher.search(spark, h,
        "w0000 NEAR/5 w0001", 10).toDF())
      dump("q_spanfirst", graft.search.Searcher.searchQ(spark, h,
        graft.search.QSpanFirst(graft.search.QTerm("w0000"), 16), 10).toDF())
      dump("q_batch10", graft.search.Searcher.searchMany(spark, h,
        qs.map(x => (x._1, x._2)), 10))
      val fsr = graft.search.Searcher.searchFaceted(spark, h, "w0000", "lang",
        Seq("rawLen" -> false), k = 10)
      try {
        dump("q_faceted_hits", fsr.hits)
        dump("q_faceted_facets", fsr.facets)
      } finally fsr.close()
      // multi-field (q_field) — needs the bench's path-field sibling index
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val pathIx = new java.io.File(ixDir).getParent + s"/ixpath-c$cpus-n120000"
      if (new java.io.File(pathIx).isDirectory) {
        val mfFields = Seq(
          graft.build.MultiFieldIndex.FieldSpec("content", _.content),
          graft.build.MultiFieldIndex.FieldSpec("path", _.path))
        val mh = new graft.search.MultiFieldSearcher.MultiHandle(ixDir, mfFields,
          Map("content" -> h, "path" -> graft.search.Searcher.open(spark, pathIx)))
        dump("q_field", graft.search.MultiFieldSearcher.search(spark, mh,
          "w0003 OR path:f0000000040.scala^2", 10).toDF())
      }
    }

    spark.stop()
  }
}
