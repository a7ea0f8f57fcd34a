package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting. All
  * narrow (per-row) transforms — they scale embarrassingly; every formula
  * is pinned so the DuckDB oracle reproduces it bit-for-bit.
  */
object TextQuality {

  /** half-up 4-decimal rounding for non-negative doubles (== SQL round(x,4)) */
  @inline private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  /** token counts three ways: whitespace runs, word (\w+) tokens, and a
    * BPE-ish segmentation (letter runs | 1-3 digit groups | single symbol) */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      size(expr(s"regexp_extract_all($textCol, '\\\\S+', 0)")).cast("long").as("ws_tokens"),
      size(expr(s"regexp_extract_all($textCol, '\\\\w+', 0)")).cast("long").as("word_tokens"),
      size(expr(s"regexp_extract_all($textCol, '[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\\\s]', 0)"))
        .cast("long").as("bpe_ish_tokens"))

  /** quality metrics + composite score (single-expression double math so
    * Spark and DuckDB agree to the last bit before rounding):
    * score = 0.4*min(tokens/100,1) + 0.3*(1-stop_ratio) + 0.3*alpha_ratio */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val ws = Dedup.words(text)
        val n = ws.length
        val stops = ws.count(Analyzer.StopWords.contains)
        // ASCII word-char class, matching the SQL oracle's [A-Za-z0-9_]
        val alpha = text.count(c => (c >= 'a' && c <= 'z') ||
          (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_')
        val stopRatio = if (n == 0) 0.0 else stops.toDouble / n
        val alphaRatio = if (text.isEmpty) 0.0 else alpha.toDouble / text.length
        val score = 0.4 * math.min(n / 100.0, 1.0) + 0.3 * (1.0 - stopRatio) +
          0.3 * alphaRatio
        (id, n.toLong, r4(stopRatio), r4(alphaRatio), r4(score))
      }
      .toDF("id", "n_tokens", "stop_ratio", "alpha_ratio", "score")
  }

  /** language-ID heuristic: ratio of English stopwords among word tokens
    * (>= 0.05 -> 'en', nonzero tokens below -> 'other', empty -> 'unknown') */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val ws = Dedup.words(text)
        val n = ws.length
        val stops = ws.count(Analyzer.StopWords.contains)
        val ratio = if (n == 0) 0.0 else stops.toDouble / n
        val pred = if (n == 0) "unknown" else if (ratio >= 0.05) "en" else "other"
        (id, r4(ratio), pred)
      }
      .toDF("id", "en_stop_ratio", "lang_pred")
  }

  /** document fingerprint: min sha256 over sliding word w-grams (winnowing
    * with a crypto hash — deterministic and SQL-reproducible); documents
    * shorter than w words fingerprint their full word sequence */
  def fingerprint(df: DataFrame, idCol: String, textCol: String,
                  w: Int = 5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val ws = Dedup.words(text)
        val windows =
          if (ws.isEmpty) Iterator(("" /* empty doc sentinel */))
          else if (ws.length <= w) Iterator(ws.mkString(" "))
          else ws.sliding(w).map(_.mkString(" "))
        val fp = windows.map(graft.build.IndexBuilder.sha256Hex).min
        (id, fp)
      }
      .toDF("id", "fingerprint")
  }

  /** Repetition quality signals (the Gopher/MassiveText repetition filters
    * — Rae et al. 2021 §A1.1 use duplicate-line and duplicate/top-n-gram
    * fractions to drop degenerate docs; the exact fractions here are pinned
    * so the SQL oracle reproduces them):
    *  - top2gram_frac: occurrences of the MOST FREQUENT word 2-gram x 2,
    *    over the token count (0 when fewer than 2 tokens);
    *  - dup5gram_frac: total occurrences of 5-grams that occur >= 2 times
    *    x 5, over the token count, capped at 1.0 (0 when fewer than 5);
    * high values = boilerplate/looping text. Tokens are lowercased \\w+,
    * per-row computation only — embarrassingly parallel. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val ws = Dedup.words(text)
        val n = ws.length
        def grams(k: Int): Map[String, Int] =
          if (n < k) Map.empty
          else ws.sliding(k).map(_.mkString(" ")).toSeq.groupBy(identity)
            .map { case (g, occ) => g -> occ.size }
        val g2 = grams(2)
        val top2 = if (g2.isEmpty) 0.0 else g2.values.max.toDouble * 2.0 / n
        val g5 = grams(5)
        val dupOcc = g5.valuesIterator.filter(_ >= 2).sum
        val dup5 = if (n < 5) 0.0 else math.min(1.0, dupOcc.toDouble * 5.0 / n)
        (id, n.toLong, r4(top2), r4(dup5))
      }
      .toDF("id", "n_tokens", "top2gram_frac", "dup5gram_frac")
  }

  /** Unigram log-probability quality score (the cheap relational stand-in
    * for LM-perplexity filtering in training pipelines): per doc, the mean
    * natural-log probability of its word tokens under the CORPUS'S OWN
    * unigram distribution (cf/total over lowercased \w+ tokens). Common
    * text scores high (close to 0), gibberish/rare-heavy text scores low
    * (strongly negative); empty docs pin to 0.0. Two aggregations (vocab
    * stats, per-doc mean) + one broadcast of the scalar total — no
    * corpus-wide collect; the vocab join shuffles token rows once. */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).cast("long").as("id"),
      explode(expr(s"regexp_extract_all(lower($textCol), '\\\\w+', 0)")).as("w"))
    val cf = toks.groupBy(col("w")).agg(count(lit(1)).as("cf"))
    val totalDf = cf.agg(sum(col("cf")).cast("double").as("total"))
    val perDoc = toks
      .join(cf, Seq("w"))
      .crossJoin(broadcast(totalDf))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        avg(log(col("cf").cast("double") / col("total"))).as("lp"))
    df.select(col(idCol).cast("long").as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("lp"), lit(0.0)), 4).as("logprob"))
  }

  /** Interpolated bigram log-probability score (round-5; one LM order up
    * from `unigramLogProb` — the closest relational stand-in for the KenLM
    * 5-gram scoring CCNet (Wenzek et al. 2020) filters with): per token,
    *   p = lambda * P(w_i | w_{i-1}) + (1-lambda) * P(w_i)
    * under the corpus's OWN MLE distributions (first token of a doc has no
    * context and scores P(w_1) alone); the doc score is the mean ln p.
    * Both component probabilities are never zero for an observed token
    * (every token row contributes to the counts it is scored against), so
    * no discounting scheme is needed — interpolation alone smooths unseen
    * CONTEXTS, which is the part that matters for ranking.
    *
    * Scale shape: the (prev, cur) pairing is a lag window partitioned by
    * doc — ONE shuffle of token rows on doc id, each partition then
    * processed streamingly in token order; bigram/context/unigram counts
    * are three map-side-partial aggregations over the same stream; the
    * final per-doc mean is one more token-row shuffle. Nothing
    * corpus-sized reaches the driver and the raw text never shuffles —
    * only its token stream does. Empty docs pin to 0.0. */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
                    lambda: Double = 0.7): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    val toks = df.select(col(idCol).cast("long").as("id"),
        posexplode(expr(s"regexp_extract_all(lower($textCol), '\\\\w+', 0)"))
          .as(Seq("pos", "w")))
      .withColumn("prev", lag(col("w"), 1).over(w))
    val cf = toks.groupBy(col("w")).agg(count(lit(1)).as("cf"))
    val totalDf = cf.agg(sum(col("cf")).cast("double").as("total"))
    val big = toks.filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("w")).agg(count(lit(1)).as("c2"))
    val ctx = toks.filter(col("prev").isNotNull)
      .groupBy(col("prev")).agg(count(lit(1)).as("ctx"))
    val pUni = col("cf").cast("double") / col("total")
    val pBig = col("c2").cast("double") / col("ctx").cast("double")
    val perDoc = toks
      .join(cf, Seq("w"))
      .join(big, Seq("prev", "w"), "left")
      .join(ctx, Seq("prev"), "left")
      .crossJoin(broadcast(totalDf))
      .select(col("id"),
        when(col("prev").isNull, pUni)
          .otherwise(lit(lambda) * pBig + lit(1.0 - lambda) * pUni).as("p"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), avg(log(col("p"))).as("lp"))
    df.select(col(idCol).cast("long").as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("lp"), lit(0.0)), 4).as("logprob"))
  }

  /** PII-style redaction for corpus scrubbing: emails -> <EMAIL>, dotted
    * IPv4s -> <IP>, 10+-digit runs -> <NUM>, applied IN THAT ORDER (so an
    * address's digits are consumed by the email rule first). Patterns are
    * deliberately RE2-safe (no backrefs/lookaround) so the exact semantics
    * reproduce in the DuckDB oracle; a codegen'd regexp_replace chain, no
    * UDF, no shuffle. */
  def redact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val longNum = "[0-9]{10,}"
    df.select(col(idCol).cast("long").as("id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), email, "<EMAIL>"),
          ipv4, "<IP>"),
        longNum, "<NUM>").as("redacted"))
  }

  /** Sparse TF-IDF featurizer, long form (round-5; the classic bag-of-words
    * vectorizer LLM-pipeline side tasks still need — clustering, nearest
    * neighbors, lightweight classifiers): one row per (doc, term) with raw
    * tf, weight = tf * idf under the smoothed idf ln((N+1)/(df+1)) + 1
    * (never zero or negative — the standard smooth_idf convention), and the
    * L2-normalized weight (norm over the doc's minDf-surviving term set,
    * the form cosine similarity consumes directly). Tokenization =
    * Dedup.words (raw \w+ surface, no stop removal — featurizing compares
    * surface text, like dedup).
    *
    * Scale shape: token explode -> ONE shuffle for per-(doc, term) counts;
    * the df aggregate reuses that relation (vocab-sized, map-side partials)
    * and joins back on term; the corpus size is a broadcast 1-row scalar;
    * the per-doc norm shuffles only (id, weight) pairs. Nothing collected. */
  def tfidfTerms(df: DataFrame, idCol: String, textCol: String,
                 minDf: Int = 1): DataFrame = {
    require(minDf >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, t) => Dedup.words(t).iterator.map(w => (id, w)) }
      .toDF("id", "term")
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val nDocs = df.select(countDistinct(col(idCol)).as("n"))
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val w = tf.join(dfs, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("weight",
        col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0))
    val norms = w.groupBy(col("id"))
      .agg(sqrt(sum(col("weight") * col("weight"))).as("nrm"))
    w.join(norms, Seq("id"))
      .select(col("id"), col("term"), col("tf").cast("long").as("tf"),
        round(col("weight"), 4).as("weight"),
        round(col("weight") / col("nrm"), 4).as("weight_l2"))
  }

  /** C4-style line-level quality filter (Raffel et al. 2020 §2.2, the
    * public heuristics behind the C4 corpus): a line is KEPT when it ends
    * in terminal punctuation (`.` `!` `?` `"`, optionally followed by
    * trailing whitespace) AND carries at least 5 whitespace tokens; a
    * document is KEPT when at least 3 of its lines survive and it contains
    * neither `lorem ipsum` (case-insensitive) nor a `{` (C4's code
    * detector). Lines split on `\n` with trailing empties preserved
    * (`split(-1)` — the DuckDB `string_split` convention), so the two
    * engines see identical line sets. Per-row narrow transform — scales
    * embarrassingly; formulas pinned for the oracle. */
  def lineStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .map { case (id, text) =>
        val lines = text.split("\n", -1)
        val kept = lines.count { ln =>
          ln.matches("(?s).*[.!?\"]\\s*") &&
            "\\S+".r.findAllIn(ln).size >= 5
        }
        val hasLorem = text.toLowerCase.contains("lorem ipsum")
        val hasBrace = text.contains("{")
        (id, lines.length.toLong, kept.toLong,
          r4(kept.toDouble / lines.length),
          hasLorem, hasBrace,
          kept >= 3 && !hasLorem && !hasBrace)
      }
      .toDF("id", "n_lines", "kept_lines", "kept_frac",
        "has_lorem", "has_brace", "keep")
  }
}
