package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sequence-packing plan for LM pretraining: documents are concatenated in
  * ascending id order and the resulting token stream is cut into
  * fixed-capacity training sequences — the standard concat-then-chunk data
  * prep used by GPT-style pretraining (documents joined with a separator,
  * stream sliced every `capacity` tokens; see e.g. Brown et al. 2020 §2.1,
  * public method). This op computes the PLAN: for every document, the
  * exclusive running token total before it (`tok_before`), the first/last
  * sequence index it touches, its offset inside the first sequence, and how
  * many sequences it spans. Empty documents occupy no tokens (`n_seqs` 0,
  * `first_seq`/`last_seq` pinned to the position their zero-width start
  * falls in).
  *
  * Scale shape — a distributed prefix sum, NOT a global single-partition
  * window: range-repartition on id, per-partition token subtotals (ONE tiny
  * aggregate, bounded by the partition count) collected and turned into
  * broadcast per-partition offsets, then a per-partition streaming running
  * sum over the sorted rows (mapPartitions — genuine scan logic). The only
  * corpus-wide movement is the single range exchange; the widest collected
  * thing is one row per partition. The ranged (id, ntok, pid) projection is
  * persisted (MEMORY_AND_DISK) because the offsets are keyed by the
  * physical partition ids of THAT materialization — without it, a
  * recomputed lineage could re-sample different range boundaries between
  * the subtotal job and the output job. Callers should unpersist via their
  * session's catalog once the plan is written out.
  */
object Packing {

  def packPlan(df: DataFrame, idCol: String, textCol: String,
               capacity: Long, parts: Int = 0): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    val nParts = if (parts > 0) parts
      else spark.sessionState.conf.numShufflePartitions
    val toks = df.select(col(idCol).cast("long").as("id"),
      size(expr(s"regexp_extract_all($textCol, '\\\\S+', 0)")).cast("long").as("ntok"))
    val ranged = toks.repartitionByRange(nParts, col("id"))
      .withColumn("pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one row per non-empty partition; cumulative-exclusive offsets
    val subs = ranged.groupBy("pid").agg(sum("ntok").as("s")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = subs.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) =>
      (pid, acc + s)
    }
    val poffs = subs.map(_._1).zip(offsets.map(_._2)).toSeq
    val offDf = poffs.toDF("pid", "poff")
    val before = ranged.sortWithinPartitions("id")
      .join(broadcast(offDf), Seq("pid"))
      .select($"pid", $"id", $"ntok", $"poff").as[(Int, Long, Long, Long)]
      .mapPartitions { it =>
        var run = -1L
        it.map { case (_, id, ntok, poff) =>
          if (run < 0) run = poff
          val b = run
          run += ntok
          (id, ntok, b)
        }
      }
      .toDF("id", "ntok", "tok_before")
    before
      .withColumn("first_seq", expr(s"tok_before div ${capacity}L"))
      .withColumn("first_off", col("tok_before") % capacity)
      .withColumn("last_seq", when(col("ntok") === 0L, col("first_seq"))
        .otherwise(expr(s"(tok_before + ntok - 1) div ${capacity}L")))
      .withColumn("n_seqs", when(col("ntok") === 0L, lit(0L))
        .otherwise(col("last_seq") - col("first_seq") + lit(1L)))
      .select("id", "ntok", "tok_before", "first_seq", "first_off",
        "last_seq", "n_seqs")
  }
}
