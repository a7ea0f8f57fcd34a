package graft.tools

import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusSource
import graft.build.IndexBuilder

/** ad-hoc phase profiler (not part of the driver contract) */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "30000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val corpus = CorpusSource.synth(spark, n, 42L, cpus * 2)
    t("COLD stamp+write")(IndexBuilder.stampDocIds(corpus, cpus * 2)
      .write.mode("overwrite").parquet(s"/tmp/graft-profile-docs"))
    t("gen only (count)")(corpus.map(_.content.length).reduce(_ + _))
    t("gen only again")(corpus.map(_.content.length).reduce(_ + _))
    val sorted = corpus.repartitionByRange(cpus * 2, $"repo", $"path", $"commit")
      .sortWithinPartitions("repo", "path", "commit")
    t("gen+sort (count)")(sorted.count())
    t("zipWithIndex count-only")(sorted.rdd.zipWithIndex().count())
    t("stamp full")(IndexBuilder.stampDocIds(corpus, cpus * 2).count())
    t("stamp+write")(IndexBuilder.stampDocIds(corpus, cpus * 2)
      .write.mode("overwrite").parquet(s"/tmp/graft-profile-docs"))
    spark.stop()
  }
}
