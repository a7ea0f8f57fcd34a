package graft.build

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.build.IndexBuilder.{BuildReport, IndexConfig}
import graft.model.CorpusRow

/** Multi-field schema (reference surface: [R] cockatrice/schema.py — a
  * per-index, multi-field declared schema; SURVEY.md §1.1).
  *
  * Spark-native representation: ONE INDEX DIRECTORY PER FIELD under
  * `root/fields/<name>` — the columnar analog of a per-field terms
  * dictionary. Each field index is a complete, independently usable
  * instance of the single-field pipeline (segments, manifests, lexicon,
  * stats, deletes), so merge/compaction/resume/streaming all apply per
  * field unchanged. docIds align across fields automatically: the D1 stamp
  * is a pure function of the corpus keys (repo, path, commit), which are
  * identical for every field of the same corpus.
  *
  * Per-field BM25 statistics come for free (each index has its own df,
  * lengths, and avg field length; N is the same everywhere), matching
  * Whoosh's BM25F-style per-field scoring. Field boosts are schema-time
  * multipliers folded into query-node boosts at search (MultiFieldSearcher).
  */
object MultiFieldIndex {

  /** a schema field: name, how to derive its text from a corpus row, a
    * schema-time boost, and the field's analysis chain
    * ([R] cockatrice/schema.py field args: analyzer + boost) */
  final case class FieldSpec(name: String, extract: CorpusRow => String,
                             boost: Double = 1.0,
                             analyzer: graft.analysis.AnalyzerSpec =
                               graft.analysis.AnalyzerSpec.Standard) {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad field name: $name")
  }

  /** the default two-field source-code schema: the file body plus its
    * tokenized path (what a cockatrice user typically declares) */
  def contentAndPath: Seq[FieldSpec] = Seq(
    FieldSpec("content", _.content),
    FieldSpec("path", _.path))

  def fieldDir(root: String, name: String): String = s"$root/fields/$name"

  /** build every field's index (one full single-field build per field over
    * the field's derived corpus; at 10^12-doc scale the analyze passes
    * could share one corpus scan — a per-field generator split — but each
    * pass here stays a one-scan pipeline already) */
  def build(spark: SparkSession, corpus: Dataset[CorpusRow], root: String,
            fields: Seq[FieldSpec], cfg: IndexConfig = IndexConfig()): Map[String, BuildReport] = {
    import spark.implicits._
    require(fields.nonEmpty && fields.map(_.name).distinct.size == fields.size)
    fields.map { f =>
      val ex = f.extract
      val derived = corpus.map(r => CorpusRow(r.repo, r.path, r.commit, r.lang, ex(r)))
      f.name -> IndexBuilder.build(spark, derived, fieldDir(root, f.name),
        cfg.copy(analyzer = f.analyzer))
    }.toMap
  }

  /** tombstone docIds across every field index (a document deletes whole) */
  def delete(spark: SparkSession, root: String, fields: Seq[FieldSpec],
             ids: Seq[Long]): Unit =
    fields.foreach(f => Deletes.add(spark, fieldDir(root, f.name), ids))
}
