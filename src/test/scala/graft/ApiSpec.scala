package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Engine
import graft.build.IndexBuilder.IndexConfig
import graft.model.CorpusRow
import graft.ref.RefModel

/** The reference client-verb facade: create -> put -> get -> search ->
  * delete -> optimize -> drop, end to end, incl. the created-empty index
  * states every verb must tolerate. */
class ApiSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def mkRows(from: Int, until: Int, suffix: String = ""): Seq[CorpusRow] =
    (from until until).map { i =>
      CorpusRow(f"r${i % 3}", f"f$i%04d.txt", f"$i%040x", "text",
        graft.corpus.SynthCorpus.doc(31L, i.toLong) + suffix)
    }

  test("Engine lifecycle: cockatrice client verbs verb-for-verb") {
    import spark.implicits._
    val dir = SparkTestBase.tmpDir("engine")

    // create_index: empty but fully usable
    val st0 = Engine.createIndex(spark, dir, IndexConfig(segSize = 16))
    assert(st0.numDocs == 0 && Engine.indexExists(spark, dir))
    assert(Engine.getIndex(spark, dir).exists(_.segSize == 16))
    intercept[IllegalArgumentException](Engine.createIndex(spark, dir))
    // every read verb is total on the empty index
    assert(Engine.searchDocuments(spark, dir, "w0000").isEmpty)
    assert(Engine.getDocument(spark, dir, 0L).isEmpty)

    // put_documents into the created index: the INDEX's segSize (16) must
    // win over the default cfg the facade passes
    val batch = mkRows(0, 40)
    val st1 = Engine.putDocuments(spark, dir, spark.createDataset(batch))
    assert(st1.numDocs == 40 && st1.segSize == 16)

    // search == oracle over the put docs (D1 rank within the batch)
    val docs = batch.sortBy(r => (r.repo, r.path, r.commit)).zipWithIndex
      .map { case (r, i) => (i.toLong, r.content) }
    val ref = new RefModel(docs)
    val hits = Engine.searchDocuments(spark, dir, "w0000", pageLen = 10)
    val oracle = ref.search("w0000", 10)
    assert(hits.map(_.docId) == oracle.map(_._1))
    // page 2 continues the ranking
    val page2 = Engine.searchDocuments(spark, dir, "w0000", pageNum = 2, pageLen = 5)
    assert(page2 == Engine.searchDocuments(spark, dir, "w0000", pageLen = 10).slice(5, 10))

    // get_document: present and absent ids
    val someId = hits.head.docId
    assert(Engine.getDocument(spark, dir, someId).isDefined)
    assert(Engine.getDocument(spark, dir, 999999L).isEmpty)

    // put_document of an EXISTING key: delete-then-add semantics
    val changed = batch(5).copy(content = batch(5).content + " zzzupd")
    Engine.putDocument(spark, dir, changed)
    val afterUp = Engine.searchDocuments(spark, dir, "zzzupd", pageLen = 5)
    assert(afterUp.size == 1)

    // delete_documents by id: hidden immediately
    Engine.deleteDocuments(spark, dir, Seq(afterUp.head.docId))
    assert(Engine.searchDocuments(spark, dir, "zzzupd", pageLen = 5).isEmpty)

    // optimize_index: physical purge + stats refresh
    Engine.optimizeIndex(spark, dir)
    val stOpt = Engine.getIndex(spark, dir).get
    assert(stOpt.numDocs == 39 && stOpt.numSegments == 1)
    assert(Engine.searchDocuments(spark, dir, "zzzupd", pageLen = 5).isEmpty)
    assert(Engine.searchDocuments(spark, dir, "w0000", pageLen = 5).nonEmpty)

    // delete_index
    assert(Engine.deleteIndex(spark, dir))
    assert(!Engine.indexExists(spark, dir))
    assert(Engine.getIndex(spark, dir).isEmpty)
  }
}
