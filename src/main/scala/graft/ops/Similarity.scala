package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an Array[Float] column.
  *
  * Baseline: brute-force cosine top-k as a single codegen'd scan (dot
  * product via zip_with/aggregate — no UDF). Scale path: signed-random-
  * projection (SRP) LSH bucketing — candidates come from buckets within a
  * small hamming radius of the query's signature, then exact cosine
  * re-ranks; the scan prunes on a pushed bucket-IN filter when the table is
  * bucketed/sorted by signature.
  */
object Similarity {

  /** cosine(query, vecCol) as a Column (double math element-wise) */
  def cosineCol(vecCol: Column, query: Array[Float]): Column = {
    val q = typedlit(query.map(_.toDouble))
    val dot = aggregate(zip_with(vecCol, q, (a, b) => a.cast("double") * b),
      lit(0.0), (acc, x) => acc + x)
    val n2 = aggregate(transform(vecCol, a => a.cast("double") * a.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val qn = lit(query.map(x => x.toDouble * x.toDouble).sum)
    dot / sqrt(n2 * qn)
  }

  /** exact brute-force cosine top-k: one scan, partial top-k per partition
    * via TakeOrderedAndProject */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
                 query: Array[Float], k: Int): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        cosineCol(col(vecCol), query).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)

  /** exact cosine near-dup pairs above a threshold (embedding dedup);
    * at scale replace the crossJoin with srp-bucketed candidates */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val a = df.select(col(idCol).cast("long").as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).cast("long").as("id_b"), col(vecCol).as("vb"))
    val dot = aggregate(zip_with(col("va"), col("vb"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)
    def n2(c: Column) = aggregate(transform(c, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot / sqrt(n2(col("va")) * n2(col("vb")))).as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
  }

  /** 16-bit signed-random-projection signature of a vector; hyperplanes are
    * derived from a counter-based PRNG (deterministic, no stored model) */
  def srpSig(vec: Array[Float], bits: Int = 16, seed: Long = 11L): Int = {
    var sig = 0
    var b = 0
    while (b < bits) {
      var acc = 0.0
      var i = 0
      while (i < vec.length) {
        // hash -> uniform in [-1, 1): a random hyperplane component
        val h = graft.corpus.SynthCorpus.hash64(seed, b.toLong, i.toLong)
        val u = (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
        acc += u * vec(i)
        i += 1
      }
      if (acc > 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  /** LSH-bucketed ANN: probe buckets within `radius` hamming bits of the
    * query signature, exact cosine over the candidates only. Approximate —
    * recall property-tested against cosineTopK. */
  def srpTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int, bits: Int = 16, radius: Int = 2,
              seed: Long = 11L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qsig = srpSig(query, bits, seed)
    val probes: Seq[Int] = {
      val r0 = Seq(qsig)
      val r1 = (0 until bits).map(i => qsig ^ (1 << i))
      val r2 = for (i <- 0 until bits; j <- (i + 1) until bits)
        yield qsig ^ (1 << i) ^ (1 << j)
      (radius match {
        case 0 => r0
        case 1 => r0 ++ r1
        case _ => r0 ++ r1 ++ r2
      }).distinct
    }
    val sigd = df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, srpSig(v, bits, seed)) }
      .toDF("id", "vec", "sig")
    sigd.filter(col("sig").isin(probes: _*))
      .select(col("id"), cosineCol(col("vec"), query).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }
}
