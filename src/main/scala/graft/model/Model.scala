package graft.model

/** Row shapes of the build pipeline (SURVEY.md §1.3): corpus -> stamped docs
  * -> analyzed docs -> postings -> encoded posting-list rows -> segments. */

/** the authoritative input shape (BASELINE.json:15 input_hint) */
final case class CorpusRow(repo: String, path: String, commit: String,
                           lang: String, content: String)

/** corpus row stamped with the deterministic dense docId (decision D1) and
  * the per-row sha256(content) invariant (BASELINE.json:15) */
final case class Doc(docId: Long, repo: String, path: String, commit: String,
                     lang: String, content: String, sha: String)

final case class TermPositions(term: String, positions: Array[Int])

/** one tokenized document: everything both downstream consumers (docstats +
  * postings) need, so the analysis chain runs exactly once per doc */
final case class AnalyzedDoc(segId: Int, docId: Long, repo: String, path: String,
                             commit: String, lang: String, sha: String,
                             rawLen: Int, lenByte: Int,
                             terms: Array[TermPositions])

/** per-doc sidecar row: stored-field keys + stats + sha invariant */
final case class DocStat(segId: Int, docId: Long, repo: String, path: String,
                         commit: String, lang: String, sha: String,
                         rawLen: Int, lenByte: Int)

/** exploded posting (pre-aggregation) */
final case class Posting(segId: Int, term: String, docId: Long, tf: Int,
                         lenByte: Int, positions: Array[Int])

/** phase-1 (salted) partial posting list — an encoded docId-sorted run */
final case class Run(segId: Int, term: String, salt: Int, df: Int, maxTf: Int,
                     blocks: Array[Byte])

/** final per-(segment, term) posting-list row, written term-sorted */
final case class SegRow(segId: Int, term: String, df: Int, maxTf: Int,
                        blocks: Array[Byte])

/** read-back shape (segId comes last as the partition column) */
final case class SegRead(term: String, df: Int, maxTf: Int,
                         blocks: Array[Byte], segId: Int)

/** global lexicon row: term -> corpus-wide document frequency */
final case class LexRow(term: String, df: Long)

/** per-segment manifest (SURVEY.md S5): lineage + row-count/digest metrics,
  * the checkpoint unit for resumable builds */
final case class SegmentManifest(segId: Int, docLo: Long, docHi: Long,
                                 docCount: Long, rawLenSum: Long,
                                 postingRows: Long, postingBytes: Long,
                                 digest: String, source: String)

final case class IndexStats(numDocs: Long, totalFieldLen: Long,
                            numSegments: Int, segSize: Int)
