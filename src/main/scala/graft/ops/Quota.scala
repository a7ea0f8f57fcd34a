package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group document quotas for web-corpus curation: keep at most `k`
  * documents per group (host / domain / source), preferring the highest
  * score — the per-domain cap every published web-pipeline applies so a
  * handful of giant hosts cannot dominate the training mix (RefinedWeb,
  * Penedo et al. 2023 §3.3; C4 caps near-duplicate URLs the same way).
  *
  * Scale shape — a bounded-heap aggregation, NOT a window: the naive
  * `row_number() OVER (PARTITION BY host ORDER BY score)` shuffles and
  * SORTS every row of every group, so one hot host with 10^9 pages costs
  * a 10^9-row sort in a single task. Here a typed [[Aggregator]] keeps at
  * most 2k candidate pairs per group per map task (ObjectHashAggregate
  * runs it partially BEFORE the exchange), so the shuffle carries
  * O(k * maps) rows per group no matter how hot the host, and no full
  * group is ever materialized or sorted. Ordering is pinned (score desc,
  * id asc) so results are deterministic and oracle-able.
  */
object Quota {

  /** Bounded top-k of (score, id) pairs under (score desc, id asc); the
    * buffer is trimmed back to k whenever it exceeds 2k, so reduce/merge
    * stay O(k log k) amortized and the shuffled partial state is bounded. */
  private final class TopKAgg(k: Int)
      extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def best(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.sortBy { case (s, id) => (-s, id) }.take(k)
    private def trim(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      if (b.length <= 2 * k) b else best(b)
    def zero: Seq[(Double, Long)] = Vector.empty
    def reduce(b: Seq[(Double, Long)], a: (Long, Double)): Seq[(Double, Long)] =
      trim(b :+ ((a._2, a._1)))
    def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(x ++ y)
    def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = best(b)
    def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  }

  /** The survivors: (grp, rank, id, score) — at most `k` rows per group,
    * rank 1..k under (score desc, id asc). Callers wanting the full rows
    * join the kept ids back (a k-bounded semi-join, broadcast-able when
    * groups * k is small). */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
                  scoreCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val top = udaf(new TopKAgg(k))
    df.groupBy(col(groupCol).as("grp"))
      .agg(top(col(idCol).cast("long"), col(scoreCol).cast("double")).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("id"), col("col._1").as("score"))
  }
}
