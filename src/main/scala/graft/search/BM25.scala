package graft.search

/** Okapi BM25, the reference's scoring model with pinned constants
  * K1=1.2, B=0.75 (SURVEY.md §2.7, [W] whoosh/scoring.py BM25F;
  * BASELINE.json:6). One formula, used identically by the distributed
  * kernel and the single-threaded oracle (RefModel) — rank identity between
  * the two is the graded correctness bar.
  *
  * {{{
  * idf(t)      = ln(N / (df + 1)) + 1          // Whoosh WeightingModel.idf
  * score(t, d) = idf * tf * (K1+1) / (tf + K1 * (1 - B + B * fl/avgfl))
  * fl(d)       = LengthByte.roundtrip(rawLen)  // lossy byte code, D2
  * avgfl       = totalRawLen / N               // raw totals, D2
  * }}}
  *
  * Phrase scoring (D3): tf = number of position-pattern occurrences,
  * idf = sum of constituent-term idfs (pinned in-repo; computable in one
  * distributed pass — a phrase-df idf would need a pre-pass at scale).
  */
object BM25 extends Serializable {
  final val K1 = 1.2
  final val B = 0.75

  final case class CorpusStats(numDocs: Long, totalFieldLen: Long) {
    val avgFieldLen: Double =
      if (numDocs == 0) 0.0 else totalFieldLen.toDouble / numDocs.toDouble
  }

  @inline def idf(df: Long, n: Long): Double =
    math.log(n.toDouble / (df.toDouble + 1.0)) + 1.0

  /** per-term (or per-phrase, with summed idf) contribution at a doc */
  @inline def score(idfV: Double, tf: Int, fl: Int, avgfl: Double): Double = {
    val norm = if (avgfl <= 0.0) 1.0 else 1.0 - B + B * (fl.toDouble / avgfl)
    idfV * (tf * (K1 + 1.0)) / (tf.toDouble + K1 * norm)
  }

  /** upper bound of score() over any fl >= 0 (fl -> 0 maximizes);
    * the block-max bound used by WAND. Inflated by 1+1e-12 so float
    * rounding can never make the bound exclude an achievable score. */
  @inline def upperBound(idfV: Double, maxTf: Int): Double = {
    val ub = idfV * (maxTf * (K1 + 1.0)) / (maxTf.toDouble + K1 * (1.0 - B))
    ub * (1.0 + 1e-12)
  }
}
