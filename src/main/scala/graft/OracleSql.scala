package graft

/** DuckDB oracle SQL for the driver keys whose semantics need 64-bit
  * mod-2^64 integer arithmetic (SynthCorpus.hash64 / Dedup.hashString /
  * Dedup.simhash64 / Similarity.srpSig). DuckDB's BIGINT traps on overflow,
  * so every step runs in HUGEINT with explicit mod-2^64 reduction; xor goes
  * through a signed-BIGINT bridge. The builders below emit RAW SQL TEXT
  * (no CREATE MACRO — the driver runs one statement per key), arranged
  * stepwise through CTE columns so expression expansion stays linear.
  *
  * Constants (unsigned decimal):
  *   0x9e3779b97f4a7c15 = 11400714819323198485   (hash64 seed mult)
  *   0xc2b2ae3d27d4eb4f = 14029467366897019727   (hash64 a mult)
  *   0x165667b19e3779f9 = 1609587929392839161    (hash64 b mult)
  *   0xff51afd7ed558ccd = 18397679294719823053   (avalanche mult 1)
  *   0xc4ceb9fe1a85ec53 = 14181476777654086739   (avalanche mult 2)
  *   0xcbf29ce484222325 = 14695981039346656037   (FNV-1a offset)
  *   0x100000001b3      = 1099511628211          (FNV-1a prime)
  */
object OracleSql {

  private val Mod = "18446744073709551616::HUGEINT" // 2^64
  private def m64(x: String, y: String): String =
    s"((($x) % 4294967296::HUGEINT) * ($y) + (((($x) // 4294967296::HUGEINT) * ($y))" +
      s" % 4294967296::HUGEINT) * 4294967296::HUGEINT) % $Mod"
  private def i64(a: String): String =
    s"(CASE WHEN ($a) >= 9223372036854775808::HUGEINT THEN ($a) - $Mod ELSE ($a) END)::BIGINT"
  private def h64(a: String): String =
    s"(CASE WHEN ($a) < 0 THEN ($a)::HUGEINT + $Mod ELSE ($a)::HUGEINT END)"
  private def x64(a: String, b: String): String = h64(s"xor(${i64(a)}, ${i64(b)})")
  private def shr33(h: String): String = s"(($h) // 8589934592::HUGEINT)"

  private val K1 = "11400714819323198485::HUGEINT"
  private val K2 = "14029467366897019727::HUGEINT"
  private val K3 = "1609587929392839161::HUGEINT"
  private val Av1 = "18397679294719823053::HUGEINT"
  private val Av2 = "14181476777654086739::HUGEINT"
  private val FnvOffset = "14695981039346656037::HUGEINT"
  private val FnvPrime = "1099511628211::HUGEINT"

  /** CTE chain `sig`: doc_id -> Dedup.simhash64(text, seed) as HUGEINT in
    * [0, 2^64). Word hash = FNV-1a over chars + 1-mult avalanche
    * (Dedup.hashString); bit j = sign of sum(+-tf) over words. */
  private def simhashCtes(seed: Long): String = {
    val fnv0 = x64(s"$seed::HUGEINT", FnvOffset)
    val fold =
      s"""list_reduce(list_prepend($fnv0,
         |   [unicode(word[i])::HUGEINT FOR i IN range(1, length(word)+1)]),
         |   (h, c) -> ${m64(x64("h", "c"), FnvPrime)})""".stripMargin
    s"""w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS word FROM documents),
       |tf AS (SELECT doc_id, word, count(*)::BIGINT AS c FROM w GROUP BY 1, 2),
       |vocab AS (SELECT DISTINCT word FROM tf),
       |wh0 AS (SELECT word, $fold AS f0 FROM vocab),
       |wh1 AS (SELECT word, ${x64("f0", shr33("f0"))} AS f1 FROM wh0),
       |wh2 AS (SELECT word, ${m64("f1", Av1)} AS f2 FROM wh1),
       |wh AS (SELECT word, ${x64("f2", shr33("f2"))} AS h FROM wh2),
       |bits AS (
       |  SELECT t.doc_id, j.j,
       |         sum(CASE WHEN (wh.h // power(2, j.j)::HUGEINT) % 2 = 1 THEN t.c ELSE -t.c END) AS acc
       |  FROM tf t JOIN wh USING (word) CROSS JOIN range(64) j(j)
       |  GROUP BY 1, 2),
       |sig0 AS (
       |  SELECT doc_id, sum(CASE WHEN acc > 0 THEN power(2, j)::HUGEINT ELSE 0::HUGEINT END) AS s
       |  FROM bits GROUP BY 1),
       |sig AS (
       |  SELECT d.doc_id, coalesce(sig0.s, 0::HUGEINT) AS s
       |  FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN sig0 USING (doc_id))""".stripMargin
  }

  /** doc_id -> 16-hex-char simhash signature (Dedup.simhash). */
  def ddSimhash(seed: Long = 7L): String =
    (s"WITH ${simhashCtes(seed)} " +
      "SELECT doc_id AS id, printf('%08x%08x', (s // 4294967296::HUGEINT)::BIGINT, " +
      "(s % 4294967296::HUGEINT)::BIGINT) AS simhash FROM sig")
      .replaceAll("\\s+", " ")

  /** exhaustive hamming-distance pairs <= maxHamming (Dedup.simhashPairs
    * ground truth — the Spark side blocks by pigeonhole, recall 1.0). */
  def ddSimhashPairs(maxHamming: Int, seed: Long = 7L): String =
    (s"WITH ${simhashCtes(seed)} " +
      s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         | bit_count(xor(${i64("a.s")}, ${i64("b.s")}))::BIGINT AS hamming
         | FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         | WHERE bit_count(xor(${i64("a.s")}, ${i64("b.s")})) <= $maxHamming""".stripMargin)
      .replaceAll("\\s+", " ")

  /** CTE chain `vsig`: vec_id -> Similarity.srpSig(embedding, bits, seed).
    * The hyperplane components u(b, i) are data-independent hash64 draws,
    * built once in a 16 x 64 CTE; per-vector dot products fold in ascending
    * i order (list_reduce) to replicate the kernel's FP summation order. */
  private def srpSigCtes(bits: Int, seed: Long): String = {
    val s1 = s"(${m64(s"$seed::HUGEINT", K1)} + ${m64("b.b::HUGEINT", K2)} + " +
      s"${m64("i.i::HUGEINT", K3)}) % $Mod"
    s"""hy0 AS (SELECT b.b, i.i, $s1 AS s1 FROM range($bits) b(b) CROSS JOIN range(64) i(i)),
       |hy1 AS (SELECT b, i, ${x64("s1", shr33("s1"))} AS s2 FROM hy0),
       |hy2 AS (SELECT b, i, ${m64("s2", Av1)} AS s3 FROM hy1),
       |hy3 AS (SELECT b, i, ${x64("s3", shr33("s3"))} AS s4 FROM hy2),
       |hy4 AS (SELECT b, i, ${m64("s4", Av2)} AS s5 FROM hy3),
       |hy5 AS (SELECT b, i, ${x64("s5", shr33("s5"))} AS h FROM hy4),
       |hyper AS (SELECT b, i, ((h // 2048::HUGEINT)::DOUBLE / 9007199254740992.0) * 2.0 - 1.0 AS u FROM hy5),
       |hlist AS (SELECT b, list(u ORDER BY i) AS us FROM hyper GROUP BY b),
       |dots AS (
       |  SELECT e.vec_id, h.b,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      [h.us[i] * e.embedding[i]::DOUBLE FOR i IN range(1, len(e.embedding)+1)]),
       |      (a, x) -> a + x) AS acc
       |  FROM embeddings e CROSS JOIN hlist h),
       |vsig AS (SELECT vec_id, sum(CASE WHEN acc > 0 THEN (1<<b) ELSE 0 END)::INT AS sig
       |         FROM dots GROUP BY 1)""".stripMargin
  }

  /** Similarity.srpTopK: candidates = vectors whose signature lies within
    * `radius` hamming bits of the query's, exact cosine top-k among them,
    * (round-6, id) rank order. */
  def annSrpTopK(k: Int, bits: Int = 16, radius: Int = 5, seed: Long = 11L): String = {
    (s"""WITH ${srpSigCtes(bits, seed)},
        |qs AS (SELECT sig AS q FROM vsig WHERE vec_id = 0),
        |cand AS (SELECT vec_id FROM vsig CROSS JOIN qs
        |         WHERE bit_count(xor(vsig.sig, qs.q)) <= $radius),
        |qv AS (SELECT unnest(embedding)::DOUBLE AS qv, unnest(range(len(embedding))) AS i
        |       FROM embeddings WHERE vec_id = 0),
        |u AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v, unnest(range(len(embedding))) AS i
        |      FROM embeddings WHERE vec_id IN (SELECT vec_id FROM cand)),
        |s AS (SELECT u.vec_id AS id, sum(u.v*qv.qv) AS dot, sum(u.v*u.v) AS n2
        |      FROM u JOIN qv USING (i) GROUP BY u.vec_id),
        |r AS (SELECT id, dot / sqrt(n2 * (SELECT sum(qv*qv) FROM qv)) AS sim FROM s)
        |SELECT id, round(rawsim, 4) AS sim
        |FROM (SELECT id, sim AS rawsim, round(sim, 6) AS r6 FROM r) rr
        |ORDER BY r6 DESC, id ASC LIMIT $k""".stripMargin)
      .replaceAll("\\s+", " ")
  }

  /** Selection.dsirLogWeights ground truth over `documents` with
    * target = rows where doc_id < tgtMaxId: hashed unigram+bigram features
    * (FNV-1a + avalanche mod `buckets` — the same fold as the simhash
    * word-hash, seeded differently), Laplace-smoothed target/raw bucket
    * distributions, per-doc summed log ratio rounded to 4 decimals. */
  def slDsir(tgtMaxId: Long, buckets: Int = 64, seed: Long = 21L,
             alpha: Double = 0.5): String = {
    val fnv0 = x64(s"$seed::HUGEINT", FnvOffset)
    val fold =
      s"""list_reduce(list_prepend($fnv0,
         |   [unicode(g[i])::HUGEINT FOR i IN range(1, length(g)+1)]),
         |   (h, c) -> ${m64(x64("h", "c"), FnvPrime)})""".stripMargin
    val aB = alpha * buckets
    (s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS w FROM documents),
        |gr AS (
        |  SELECT doc_id, unnest(w) AS g FROM t
        |  UNION ALL
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS g
        |  FROM t WHERE len(w) >= 2),
        |vocab AS (SELECT DISTINCT g FROM gr),
        |vh0 AS (SELECT g, $fold AS f0 FROM vocab),
        |vh1 AS (SELECT g, ${x64("f0", shr33("f0"))} AS f1 FROM vh0),
        |vh2 AS (SELECT g, ${m64("f1", Av1)} AS f2 FROM vh1),
        |vh AS (SELECT g, ((${x64("f2", shr33("f2"))}) % $buckets::HUGEINT)::BIGINT AS bucket FROM vh2),
        |gb AS (SELECT gr.doc_id, vh.bucket FROM gr JOIN vh USING (g)),
        |rawc AS (SELECT bucket, count(*)::DOUBLE AS c FROM gb GROUP BY 1),
        |tgtc AS (SELECT bucket, count(*)::DOUBLE AS c FROM gb WHERE doc_id < $tgtMaxId GROUP BY 1),
        |tots AS (SELECT (SELECT count(*) FROM gb)::DOUBLE AS tr,
        |                (SELECT count(*) FROM gb WHERE doc_id < $tgtMaxId)::DOUBLE AS tt),
        |dist AS (SELECT b.b AS bucket,
        |  ln(((coalesce(tc.c, 0) + $alpha) / (tots.tt + $aB)) /
        |     ((coalesce(rc.c, 0) + $alpha) / (tots.tr + $aB))) AS lr
        |  FROM range($buckets) b(b) CROSS JOIN tots
        |  LEFT JOIN rawc rc ON rc.bucket = b.b
        |  LEFT JOIN tgtc tc ON tc.bucket = b.b),
        |pd AS (SELECT doc_id, count(*)::BIGINT AS n, sum(lr) AS s
        |       FROM gb JOIN dist USING (bucket) GROUP BY 1)
        |SELECT d.doc_id AS id, coalesce(pd.n, 0)::BIGINT AS n_grams,
        |  round(coalesce(pd.s, 0.0), 4) AS logw
        |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id""".stripMargin)
      .replaceAll("\\s+", " ")
  }

  /** Multimodal.mm_features ground truth: payload = utf8(text) (ASCII
    * corpus), kind from id mod 3, 16-bin high-nibble byte histogram counts
    * recovered exactly from the float features (count = round(f * len)). */
  def mmFeatures(): String =
    ("""WITH c AS (
       |  SELECT doc_id, octet_length(encode(text))::BIGINT AS blen,
       |    [unicode(text[i]) // 16 FOR i IN range(1, length(text)+1)] AS nibs
       |  FROM documents)
       |SELECT doc_id AS id,
       |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       |  blen AS byte_len, 16::BIGINT AS feature_dim,
       |  len(list_filter(nibs, x -> x = 0))::BIGINT AS h0,
       |  len(list_filter(nibs, x -> x = 2))::BIGINT AS h2,
       |  len(list_filter(nibs, x -> x = 6))::BIGINT AS h6,
       |  len(list_filter(nibs, x -> x = 7))::BIGINT AS h7
       |FROM c""".stripMargin).replaceAll("\\s+", " ")
}
