package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.CorpusSource
import graft.ops.{Dedup, Sampling, Similarity, TextQuality}

/** Pipeline-operator benchmark: times the LLM-data ops (dedup, quality,
  * sampling, ANN) over the deterministic synthetic corpus at a scale the
  * sf-dir parquet fixtures don't reach (default 500k docs / 100k x 64
  * vectors), and prints a per-op order-independent checksum as determinism
  * evidence: hash/count-based ops (dedup, sampling, token counts) must be
  * bit-identical across parallelism levels like the index build is;
  * FP-averaged scores (unigram/bigram log-prob, cosine) are bit-identical
  * across reruns at the SAME parallelism (partial-sum order is fixed by the
  * partitioning) but may differ in final ulps across core counts — which is
  * exactly why the ORACLED outputs of those ops round to 4 decimals.
  *
  * Env: SPARK_GRAFT_CPUS (default 32), GRAFT_OPS_DOCS (default 500000),
  * GRAFT_OPS_VECS (default 100000). One JSON line to stdout.
  */
object OpsBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nDocs = sys.env.getOrElse("GRAFT_OPS_DOCS", "500000").toLong
    val nVecs = sys.env.getOrElse("GRAFT_OPS_VECS", "100000").toLong
    val tmpfs = new java.io.File("/dev/shm").isDirectory
    val scratch = if (tmpfs) "/dev/shm/graft-opsbench" else "/tmp/graft-opsbench"

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", s"$scratch/spark-local")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // path = src/f%010d.<ext> -> doc_id; repo (557 values) as the mix group
    val corpus = CorpusSource.synth(spark, nDocs).toDF()
      .select(substring(col("path"), 6, 10).cast("long").as("doc_id"),
        col("content").as("text"), col("repo").as("source"))
      .cache()
    corpus.count() // materialize untimed

    val vecs = spark.range(nVecs)
      .select(col("id"), expr(
        "transform(sequence(0, 63), d -> " +
          "cast(cast(pmod(xxhash64(id, d), 1000) as double) / 1000.0 - 0.5 as float))")
        .as("embedding"))
      .cache()
    vecs.count()
    val q = vecs.filter(col("id") === 0L)
      .select("embedding").head().getSeq[Float](0).toArray

    // order-independent content checksum (XOR fold — no ANSI overflow):
    // forces every column of every row
    def checksum(df: DataFrame): Long = {
      val h = df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).head()
      if (h.isNullAt(0)) 0L else h.getLong(0)
    }
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val sums = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def bench(name: String)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val s = checksum(mk)
      times(name) = (System.nanoTime() - t0) / 1e9
      sums(name) = s
    }

    bench("ql_tokens") { TextQuality.tokenCounts(corpus, "doc_id", "text") }
    bench("ql_unigram") { TextQuality.unigramLogProb(corpus, "doc_id", "text") }
    bench("ql_bigram") { TextQuality.bigramLogProb(corpus, "doc_id", "text") }
    bench("dd_exact") { Dedup.exact(corpus, "doc_id", "text") }
    bench("dd_minhash_pairs") {
      Dedup.minhashPairs(corpus, "doc_id", "text", threshold = 0.7)
    }
    bench("dd_striplines") {
      Dedup.stripRepeatedLines(corpus, "doc_id", "text", minDf = 2, sep = " w0000 ")
    }
    // r6 additions: the two ops whose scale shape was reworked this round.
    // dupSpanStats explodes ~ntok span rows per doc; pplBuckets runs on a
    // 90%-dominant stratum (the CCNet shape the r5 window form single-tasked)
    bench("dd_dupspans") {
      Dedup.dupSpanStats(corpus, "doc_id", "text", window = 10, minDocs = 2)
    }
    bench("sl_ppl_bucket") {
      graft.ops.Selection.pplBuckets(
        corpus.withColumn("lang",
          when(col("doc_id") % 10 < 9, lit("en")).otherwise(lit("lx"))),
        "doc_id", "text", "lang", 3)
    }
    bench("sp_split") { Sampling.contentSplit(corpus, "doc_id", "text") }
    bench("mx_sample") {
      Sampling.tokenBudgetSample(corpus, "doc_id", "text", "source",
        Map("r000/projA" -> 20000L, "r001/projB" -> 20000L, "r002/projC" -> 5000L))
    }
    bench("ann_brute") { Similarity.cosineTopK(vecs, "id", "embedding", q, 10) }
    bench("ann_sq8") { Similarity.sq8TopK(vecs, "id", "embedding", q, 10) }
    val annDir = s"$scratch/srp-$nVecs"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(annDir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(annDir), true)
    Similarity.buildAnnIndex(vecs, "id", "embedding", annDir) // untimed
    bench("ann_srp_probe") { Similarity.srpTopKIndexed(spark, annDir, q, 10) }

    val total = times.values.sum
    val opsJson = times.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString(",")
    val sumJson = sums.map { case (k, v) => s""""$k":"${java.lang.Long.toHexString(v)}"""" }.mkString(",")
    println(s"""{"metric":"ops_total","value":${f"$total%.3f"},"unit":"sec",""" +
      s""""ops":{$opsJson},"checksums":{$sumJson},""" +
      s""""docs":$nDocs,"vecs":$nVecs,"cpus":$cpus}""")
    spark.stop()
  }
}
