package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.search.{BM25Weighting, Searcher, Weighting}

/** Rank fusion for hybrid retrieval — combining the engine's lexical BM25
  * top-k with embedding-cosine top-k over the same document ids.
  *
  * Method: Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009
  * — public method): fused(d) = sum over lists L of 1 / (kRrf + rank_L(d)),
  * the standard kRrf = 60. RRF is score-scale-free, which is exactly what a
  * lexical x vector combination needs (BM25 and cosine live on unrelated
  * scales), and is the fusion every current hybrid-search system ships.
  *
  * Scale shape: the INPUTS are already bounded top-k lists (k rows each —
  * the distributed work is the upstream search/ANN probe), so ranking them
  * with an unpartitioned window over <= sum(k) rows is the right plan: the
  * window, union and group-by all run over driver-bounded row counts while
  * the heavy scans stay in the upstream operators. Nothing here is ever
  * O(corpus).
  */
object Fusion {

  /** RRF over ranked lists. Each input df carries (id, score); rank within
    * a list = row_number by (score desc, id asc). Returns (id, rrf,
    * n_lists) for every id present in at least one list. */
  def rrf(lists: Seq[DataFrame], kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf of zero lists")
    require(kRrf >= 1, s"kRrf must be >= 1: $kRrf")
    val contribs = lists.map { df =>
      df.select(col("id").cast("long").as("id"),
          col("score").cast("double").as("score"))
        .withColumn("rank",
          row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
        .select(col("id"),
          (lit(1.0) / (lit(kRrf.toDouble) + col("rank"))).as("contrib"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy("id")
      .agg(sum(col("contrib")).as("rrf"), count(lit(1)).as("n_lists"))
  }

  /** Hybrid top-k: the engine's BM25 hits for `query` fused with exact
    * cosine top-k around `queryVec`, RRF-combined on a shared id space.
    *
    * `idMap` maps the index's dense docId to the embedding table's id
    * (docId, id) — e.g. parsed from a stored field; pass null when the
    * index was built with docId == embedding id. Each side contributes its
    * top `kPer` candidates; output is the fused top `k`.
    */
  def hybridTopK(spark: SparkSession, handle: Searcher.IndexHandle,
                 query: String, idMap: DataFrame,
                 emb: DataFrame, idCol: String, vecCol: String,
                 queryVec: Array[Float], k: Int = 10, kPer: Int = 100,
                 kRrf: Int = 60,
                 weighting: Weighting = BM25Weighting): DataFrame = {
    val hits0 = Searcher.search(spark, handle, query, kPer, weighting = weighting)
    val lexical =
      (if (idMap == null) hits0.select(col("docId").as("id"), col("score"))
       else hits0.join(idMap, Seq("docId")).select(col("id"), col("score")))
    val vector = Similarity.cosineTopK(emb, idCol, vecCol, queryVec, kPer)
      .select(col("id"), col("sim").as("score"))
    rrf(Seq(lexical, vector), kRrf)
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(k)
  }
}
