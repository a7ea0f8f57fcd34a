package graft.build

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Deletion set (SURVEY.md S6): tombstoned docIds are hidden at query time
  * and physically purged at merge/compaction (M2), mirroring the
  * reference's per-segment deletion sets ([W] whoosh/writing.py).
  *
  * Sandbox representation: a small parquet of docIds loaded into an
  * in-memory set per index handle. Scale note: beyond ~10^8 tombstones this
  * becomes a per-segment bitmap keyed by the segment's docId range — the
  * query- and merge-side hooks (a Long => Boolean predicate) are already
  * shaped for that.
  */
object Deletes {
  def dir(indexDir: String): String = s"$indexDir/deletes"

  def add(spark: SparkSession, indexDir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("docId").coalesce(1)
      .write.mode(SaveMode.Append).parquet(dir(indexDir))
  }

  def read(spark: SparkSession, indexDir: String): Set[Long] = {
    val fs = FileSystem.get(new java.net.URI(indexDir),
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir(indexDir)))) Set.empty
    else {
      import spark.implicits._
      spark.read.parquet(dir(indexDir)).as[Long].collect().toSet
    }
  }

  def clear(spark: SparkSession, indexDir: String): Unit = {
    val fs = FileSystem.get(new java.net.URI(indexDir),
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dir(indexDir)), true)
    ()
  }
}
