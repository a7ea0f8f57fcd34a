package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Both ops are pure functions of row CONTENT (sha256), not of row order,
  * partitioning, or a driver-side RNG — so a split computed on 100 TB
  * re-derives identically on any cluster layout, survives re-partitioning,
  * and two near-identical pipelines agree on membership. Content
  * addressing also means exact duplicates land in the SAME split — no
  * train/test leakage through copies (the reason to prefer it over
  * hash-of-id for LLM corpora).
  *
  * Bucketing: the first 4 bytes of sha256(text || salt) read as an
  * unsigned big-endian int, modulo `buckets` — narrow codegen'd column
  * expressions (sha2 / substring / conv), no UDF, no shuffle.
  */
object Sampling {

  private def bucketCol(textCol: String, salt: String, buckets: Int) =
    (conv(substring(sha2(concat(col(textCol), lit(salt)), 256), 1, 8), 16, 10)
      .cast("long") % buckets).cast("int")

  /** Assign each row to "train" / "val" / "test" with the given
    * per-mille weights (must sum to 1000). */
  def contentSplit(df: DataFrame, idCol: String, textCol: String,
                   trainPerMille: Int = 900, valPerMille: Int = 50,
                   salt: String = "split"): DataFrame = {
    require(trainPerMille + valPerMille <= 1000 && trainPerMille >= 0 && valPerMille >= 0)
    val b = bucketCol(textCol, salt, 1000)
    df.select(col(idCol).cast("long").as("id"), b.as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPerMille, "train")
          .when(col("bucket") < trainPerMille + valPerMille, "val")
          .otherwise("test"))
  }

  /** Keep a deterministic `perMille`/1000 fraction of rows. */
  def contentSample(df: DataFrame, textCol: String, perMille: Int,
                    salt: String = "sample"): DataFrame = {
    require(perMille >= 0 && perMille <= 1000)
    df.filter(bucketCol(textCol, salt, 1000) < perMille)
  }

  /** Stratified deterministic sampling (round-5): per-stratum keep rates
    * (per mille) over the same content-addressed buckets as
    * `contentSample` — duplicates still land together and membership stays
    * independent of layout; a stratum's sample is exactly what
    * contentSample(rate) would keep of that stratum. Strata absent from
    * the map keep `defaultPerMille`. The strata->rate map rides the plan
    * as a literal CASE chain (codegen'd), never a join — the map is
    * config-sized (languages, sources), not data-sized. */
  def contentSampleStratified(df: DataFrame, strataCol: String, textCol: String,
                              perMille: Map[String, Int],
                              defaultPerMille: Int = 0,
                              salt: String = "sample"): DataFrame = {
    require((defaultPerMille +: perMille.values.toSeq).forall(p => p >= 0 && p <= 1000))
    val rate = perMille.toSeq.sortBy(_._1).foldLeft(lit(defaultPerMille)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(bucketCol(textCol, salt, 1000) < rate)
  }

  /** Token-budget mixture sampling (round-5; the Pile / RefinedWeb recipe:
    * a training mix is specified as a TOKEN budget per source, and each
    * source is downsampled to hit it). Two passes:
    *   1. per-budgeted-group token totals — ONE aggregation filtered to the
    *      budget keys (map-side partial; the collect is <= |budgets| rows,
    *      config-sized: pile components, not hosts);
    *   2. per-group keep rate (per mille, pinned INTEGER arithmetic
    *      `min(1000, 1000*budget / tokens)` so the oracle replicates it
    *      bit-for-bit) folded into the plan as a literal CASE chain over
    *      the same content-addressed buckets as `contentSample` — the
    *      data pass is a narrow codegen'd filter, no join, no shuffle.
    * Groups without a budget are dropped (rate 0). Duplicates still land
    * together (content addressing), so a downsampled mix cannot leak a
    * dropped copy back in. Output: the kept rows as (id, grp, n_tokens,
    * rate) — rate carried so downstream loss-weighting can undo the
    * sampling bias if it wants to. */
  def tokenBudgetSample(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String, tokenBudget: Map[String, Long],
                        salt: String = "mix"): DataFrame = {
    require(tokenBudget.nonEmpty && tokenBudget.values.forall(_ >= 0))
    val nTok = size(expr(s"regexp_extract_all(lower($textCol), '\\\\w+', 0)"))
    val keys = tokenBudget.keys.toSeq.sorted
    val totals = df
      .filter(col(groupCol).isin(keys: _*))
      .groupBy(col(groupCol).as("grp"))
      .agg(sum(nTok.cast("long")).as("tot"))
      .collect() // bounded: one row per budgeted group (config-sized)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rateOf: Map[String, Long] = keys.map { g =>
      val t = totals.getOrElse(g, 0L)
      g -> (if (t <= 0L) 0L else math.min(1000L, 1000L * tokenBudget(g) / t))
    }.toMap
    val rate = keys.foldLeft(lit(0L)) { (acc, g) =>
      when(col(groupCol) === g, lit(rateOf(g))).otherwise(acc)
    }
    df.select(col(idCol).cast("long").as("id"), col(groupCol).as("grp"),
        nTok.cast("long").as("n_tokens"),
        rate.as("rate"), bucketCol(textCol, salt, 1000).as("bucket"))
      .filter(col("bucket") < col("rate"))
      .select(col("id"), col("grp"), col("n_tokens"), col("rate"))
  }
}
