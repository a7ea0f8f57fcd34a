package graft.corpus

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.CorpusRow

/** The corpus seam (SURVEY.md §1.2, decision D6).
  *
  * Production path: an Iceberg table of source-code repositories with
  * columns (repo, path, commit, lang, content) — `spark.read.format(fmt)`.
  * Sandbox path: the same shape synthesized deterministically, either from
  * the driver's `documents.parquet` (for DuckDB-comparable oracle queries)
  * or from the seeded generator (bench / scale tests). Code above this seam
  * never knows which.
  */
object CorpusSource {

  /** production read: e.g. format="iceberg", source="db.code_files" */
  def read(spark: SparkSession, format: String, source: String): Dataset[CorpusRow] = {
    import spark.implicits._
    spark.read.format(format).load(source)
      .select($"repo", $"path", $"commit", $"lang", $"content")
      .as[CorpusRow]
  }

  /** Deterministic derivation from the driver's documents table at sfDir
    * (FIXTURES.md §5, adapted: the table has (doc_id, text, lang, source,
    * n_chars)). Pure integer/printf mapping so DuckDB reproduces it exactly. */
  def fromDocumentsTable(spark: SparkSession, sfDir: String): Dataset[CorpusRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        format_string("r%02d", col("doc_id") % 97).as("repo"),
        format_string("d/%07d.txt", col("doc_id")).as("path"),
        format_string("%040x", col("doc_id")).as("commit"),
        col("lang"),
        col("text").as("content"))
      .as[CorpusRow]
  }

  /** Seeded synthetic corpus of exactly the authoritative shape
    * (FIXTURES.md §4): counter-based PRNG, Zipf-ish vocabulary — hot head
    * terms exercise the salted aggregation path. Distributed generation:
    * spark.range is evenly partitioned, each row derived purely from (seed, i). */
  def synth(spark: SparkSession, numDocs: Long, seed: Long = 42L,
            partitions: Int = 0): Dataset[CorpusRow] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0L, numDocs, 1L, p).map(i => SynthCorpus.row(seed, i))
  }
}

/** Pure-function corpus generator — byte-identical across runs and
  * parallelism levels (every field a function of (seed, i) only). */
object SynthCorpus extends Serializable {

  private val langs = Array("scala", "python", "java", "rust", "text")
  private val exts = Array("scala", "py", "java", "rs", "txt")

  def row(seed: Long, i: Long): CorpusRow = {
    val li = (i % 5).toInt
    CorpusRow(
      repo = f"r${i % 557}%03d/proj${('A' + (i % 11)).toChar}",
      path = f"src/f$i%010d.${exts(li)}",
      commit = f"${hash64(seed, i, -2L)}%016x" * 2 + f"${i}%08d".takeRight(8),
      lang = langs(li),
      content = doc(seed, i))
  }

  /** Zipf(s~1.07)-flavoured draws from a 10k vocabulary w0000..w9999, doc
    * length 50..449 tokens, plus the needle phrase every 1000th doc. */
  def doc(seed: Long, i: Long): String = {
    val len = 50 + java.lang.Long.remainderUnsigned(hash64(seed, i, -1L), 400L).toInt
    val sb = new java.lang.StringBuilder(len * 6 + 20)
    var j = 0
    while (j < len) {
      if (j > 0) sb.append(' ')
      sb.append(word(hash64(seed, i, j.toLong)))
      j += 1
    }
    if (i % 1000L == 0L) sb.append(" needle alpha beta")
    sb.toString
  }

  private def word(h: Long): String = {
    val u = java.lang.Long.remainderUnsigned(h, 1L << 40).toDouble / (1L << 40).toDouble
    val rank = math.min(9999, (math.pow(10000.0, u) - 1.0).toInt)
    val cs = new Array[Char](5)
    cs(0) = 'w'
    cs(1) = ('0' + rank / 1000).toChar
    cs(2) = ('0' + rank / 100 % 10).toChar
    cs(3) = ('0' + rank / 10 % 10).toChar
    cs(4) = ('0' + rank % 10).toChar
    new String(cs)
  }

  def hash64(seed: Long, a: Long, b: Long): Long = {
    var h = seed * 0x9e3779b97f4a7c15L + a * 0xc2b2ae3d27d4eb4fL + b * 0x165667b19e3779f9L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }
}
