package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag documents sharing
  * any word n-gram with an evaluation/benchmark set — the published
  * n-gram-collision method (GPT-3 appendix C uses 13-gram overlap; the C4
  * audit of Dodge et al. uses exact substring/n-gram matching).
  *
  * Fully relational scale shape: both sides shingle into distinct
  * (id, ngram) rows, the benchmark side reduces to a distinct ngram set
  * (typically small -> broadcast), and contamination is one equi-join +
  * count per doc. Nothing is collected; at 10^12 docs the cost is one
  * pass over each side plus a hash join keyed by ngram.
  */
object Decontam {

  /** distinct space-joined word n-grams of lowercased \w+ tokens (empty
    * when the doc has fewer than n tokens — never a descending sequence) */
  private def ngramsCol(textCol: String, n: Int): Column = {
    val toks = expr(s"regexp_extract_all(lower($textCol), '\\\\w+', 0)")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
  }

  /** (id, hits, contaminated) for EVERY doc: hits = number of distinct
    * n-grams the doc shares with the benchmark set. */
  def flagNgramOverlap(docs: DataFrame, idCol: String, textCol: String,
                       bench: DataFrame, benchTextCol: String,
                       n: Int = 13, broadcastBench: Boolean = true): DataFrame = {
    require(n >= 1)
    val docNg = docs
      .select(col(idCol).cast("long").as("id"),
        explode(ngramsCol(textCol, n)).as("ngram"))
    val benchNg0 = bench
      .select(explode(ngramsCol(benchTextCol, n)).as("ngram"))
      .distinct()
    // eval sets are tiny next to a training corpus -> broadcast by default;
    // a corpus-sized bench side opts into the shuffle join
    val benchNg = if (broadcastBench) broadcast(benchNg0) else benchNg0
    val hits = docNg.join(benchNg, Seq("ngram"))
      .groupBy(col("id")).agg(count(lit(1)).as("hits"))
    docs.select(col(idCol).cast("long").as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Same output as [[flagNgramOverlap]], for eval sets too LARGE to
    * broadcast as strings (a full eval-suite union can run to 10^8+
    * distinct n-grams): a Bloom filter over the benchmark n-grams — a few
    * bits per entry instead of the strings — is broadcast and probed
    * MAP-SIDE, so the corpus-side exchange of the exact shuffle join
    * carries only probable hits (at a 10^12-doc corpus vs any eval set,
    * that drops ~all of the shuffle). False positives are then removed by
    * the exact equi-join, so the result is bit-identical to the exact op.
    * The probe is a UDF by necessity (no codegen'd Bloom probe is exposed
    * to the column API); it gates rows BEFORE the exchange, where the
    * saved shuffle dwarfs the call overhead. */
  def flagNgramOverlapBloom(docs: DataFrame, idCol: String, textCol: String,
                            bench: DataFrame, benchTextCol: String,
                            n: Int = 13, expectedNgrams: Long = 1L << 24,
                            fpp: Double = 0.01): DataFrame = {
    require(n >= 1)
    val docNg = docs
      .select(col(idCol).cast("long").as("id"),
        explode(ngramsCol(textCol, n)).as("ngram"))
    val benchNg = bench
      .select(explode(ngramsCol(benchTextCol, n)).as("ngram"))
      .distinct()
    val bloom = benchNg.stat.bloomFilter("ngram", expectedNgrams, fpp)
    val bloomB = docs.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => bloomB.value.mightContain(s))
    val hits = docNg.filter(mightContain(col("ngram")))
      .join(benchNg, Seq("ngram"))
      .groupBy(col("id")).agg(count(lit(1)).as("hits"))
    docs.select(col(idCol).cast("long").as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
  }
}
