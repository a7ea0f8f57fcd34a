package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus reporting for training-data pipelines: the per-source "data
  * card" rollup every curated release publishes (Datasheets for Datasets,
  * Gebru et al. 2021; the per-component tables in the Pile / RefinedWeb /
  * Stack papers) — document and token volumes plus an exact-duplication
  * rate per source, computed in one pass so a 100 TB mix can be audited
  * before (and after) the dedup/filter stages run.
  */
object Report {

  /** Per-group corpus stats: doc count, token volume, mean tokens/chars,
    * and how many of the group's docs are exact duplicates CORPUS-WIDE
    * (sha256 of the raw text occurring >= 2 times anywhere — cross-source
    * copies count, which is the number a mix audit needs; a source can be
    * 100% "internally clean" yet all copies of another source).
    *
    * Scale shape: one map-side-partial count per content hash (the only
    * corpus-sized exchange, hash rows not documents), joined back and
    * folded into a per-group aggregate whose output is |groups| rows.
    * All rounding pinned for the oracle. */
  def sourceStats(df: DataFrame, idCol: String, textCol: String,
                  groupCol: String): DataFrame = {
    val base = df.select(
      col(groupCol).as("grp"),
      col(idCol).cast("long").as("id"),
      sha2(col(textCol).cast("string"), 256).as("h"),
      size(expr(s"regexp_extract_all(lower($textCol), '\\\\w+', 0)"))
        .cast("long").as("n_tok"),
      length(col(textCol)).cast("long").as("n_chars"))
    val dupH = base.groupBy(col("h")).agg(count(lit(1)).as("c"))
    base.join(dupH, Seq("h"))
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        round(avg(col("n_tok")), 2).as("mean_tokens"),
        round(avg(col("n_chars")), 2).as("mean_chars"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("dup_docs"))
      .withColumn("dup_frac",
        round(col("dup_docs").cast("double") / col("n_docs"), 4))
  }
}
