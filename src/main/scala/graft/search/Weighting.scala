package graft.search

/** Pluggable scoring models (SURVEY.md §2.10: the reference's
  * `search_documents(..., weighting=...)` parameter — [R]
  * cockatrice/indexer.py passes a whoosh.scoring.WeightingModel; Whoosh
  * ships BM25F (default), TF_IDF and Frequency).
  *
  * A Weighting is a pure per-posting scoring function, threaded through the
  * kernel's matcher tree and the RefModel oracle alike. The contract the
  * WAND pruning relies on:
  *
  *  - `score` depends only on (effIdf, tf, fl, avgfl) — effIdf is the
  *    model's idf() times the query/schema boost, pinned exactly as BM25's
  *    effIdf folding (Kernel.buildMatcher);
  *  - `upperBound(effIdf, maxTf) >= score(effIdf, tf, fl, avgfl)` for every
  *    tf <= maxTf and every fl >= 0 — the block-max bound must dominate.
  */
trait Weighting extends Serializable {
  /** the model's idf form (multiplied by boost into effIdf) */
  def idf(df: Long, n: Long): Double
  /** contribution of one term (or phrase, with summed idf) at a doc */
  def score(effIdf: Double, tf: Int, fl: Int, avgfl: Double): Double
  /** upper bound of score over fl >= 0 given the block's max tf */
  def upperBound(effIdf: Double, maxTf: Int): Double
}

/** Okapi BM25 with the pinned constants (K1=1.2, B=0.75) — the default and
  * the graded core (§2.7). Delegates to the BM25 object so the formula has
  * exactly one definition. */
case object BM25Weighting extends Weighting {
  def idf(df: Long, n: Long): Double = BM25.idf(df, n)
  def score(effIdf: Double, tf: Int, fl: Int, avgfl: Double): Double =
    BM25.score(effIdf, tf, fl, avgfl)
  def upperBound(effIdf: Double, maxTf: Int): Double =
    BM25.upperBound(effIdf, maxTf)
}

/** Whoosh TF_IDF: score = tf * idf, length-independent
  * ([W] whoosh/scoring.py TF_IDF — same WeightingModel.idf form). */
case object TfIdfWeighting extends Weighting {
  def idf(df: Long, n: Long): Double = BM25.idf(df, n)
  def score(effIdf: Double, tf: Int, fl: Int, avgfl: Double): Double =
    effIdf * tf
  def upperBound(effIdf: Double, maxTf: Int): Double = effIdf * maxTf
}

/** Whoosh Frequency: score = raw tf (idf = 1, so effIdf carries only the
  * boost). */
case object FrequencyWeighting extends Weighting {
  def idf(df: Long, n: Long): Double = 1.0
  def score(effIdf: Double, tf: Int, fl: Int, avgfl: Double): Double =
    effIdf * tf
  def upperBound(effIdf: Double, maxTf: Int): Double = effIdf * maxTf
}

/** Whoosh FunctionWeighting ([W] whoosh/scoring.py `FunctionWeighting`: a
  * model built from a user-supplied scoring function): the caller provides
  * the three pure pieces the kernel contract needs as plain Scala
  * functions. The WAND dominance obligation
  * (`upperBoundFn(e, m) >= scoreFn(e, tf, fl, avgfl)` for all tf <= m,
  * fl >= 0) is the CALLER's to uphold — a violating bound silently drops
  * hits, exactly as a mis-stated Whoosh function mis-ranks. Functions must
  * be serializable (plain lambdas are); they ship to executors inside the
  * kernel closures. */
final case class FunctionWeighting(
    idfFn: (Long, Long) => Double,
    scoreFn: (Double, Int, Int, Double) => Double,
    upperBoundFn: (Double, Int) => Double) extends Weighting {
  def idf(df: Long, n: Long): Double = idfFn(df, n)
  def score(effIdf: Double, tf: Int, fl: Int, avgfl: Double): Double =
    scoreFn(effIdf, tf, fl, avgfl)
  def upperBound(effIdf: Double, maxTf: Int): Double =
    upperBoundFn(effIdf, maxTf)
}

object FunctionWeighting {
  /** Pinned example instance (and the `ft_topk_funcw` oracle target):
    * sublinear tf saturation, length-independent —
    * score = effIdf * (1 + ln tf). Dominance holds: monotone in tf. */
  val LogTf: FunctionWeighting = FunctionWeighting(
    (df, n) => BM25.idf(df, n),
    (effIdf, tf, _, _) => effIdf * (1.0 + math.log(tf.toDouble)),
    (effIdf, maxTf) => effIdf * (1.0 + math.log(maxTf.toDouble)))
}
