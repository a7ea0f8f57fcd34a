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

  test("BufferedWriter: N single puts cost <= ceil(N/K) appends, results identical") {
    import spark.implicits._
    val dirBuf = SparkTestBase.tmpDir("engwbuf")
    val dirBulk = SparkTestBase.tmpDir("engwblk")
    Engine.createIndex(spark, dirBuf, IndexConfig(segSize = 16))
    Engine.createIndex(spark, dirBulk, IndexConfig(segSize = 16))
    val n = 30
    val k = 8
    val rows = mkRows(0, n)

    val w = Engine.writer(spark, dirBuf, flushEvery = k)
    rows.foreach(w.put)
    assert(w.pending == n % k)
    w.close()
    assert(w.flushes <= (n + k - 1) / k,
      s"${w.flushes} appends for $n puts at K=$k")
    intercept[IllegalArgumentException](w.put(rows.head))

    // identical search results to ONE bulk put of the same docs. docIds
    // differ (each flush appends at the next segment boundary), and D4
    // breaks score ties by docId, so the layout-independent comparison is
    // the top-10 SCORE list plus the matched keys where scores are unique.
    Engine.putDocuments(spark, dirBulk, spark.createDataset(rows))
    def top(dir: String, q: String): Seq[(Double, String)] =
      Engine.searchWithFields(spark, dir, q, 10)
        .select("score", "path").collect().toSeq
        .map(r => (math.round(r.getDouble(0) * 1e9) / 1e9, r.getString(1)))
    Seq("w0000", "w0001 OR w0002", "\"needle alpha beta\"").foreach { q =>
      val (a, b) = (top(dirBuf, q), top(dirBulk, q))
      assert(a.map(_._1) == b.map(_._1), s"query '$q' score lists diverged")
      val uniqA = a.groupBy(_._1).filter(_._2.size == 1).values.flatten.toSet
      val uniqB = b.groupBy(_._1).filter(_._2.size == 1).values.flatten.toSet
      assert(uniqA == uniqB, s"query '$q' unique-score hits diverged")
    }

    // last-wins within a buffer: two puts of the same key, one flush, one doc
    val w2 = Engine.writer(spark, dirBuf, flushEvery = 100)
    w2.put(rows(3).copy(content = "transient zzfirst"))
    w2.put(rows(3).copy(content = "final zzsecond"))
    assert(w2.pending == 1)
    w2.close()
    assert(Engine.searchDocuments(spark, dirBuf, "zzfirst").isEmpty)
    assert(Engine.searchDocuments(spark, dirBuf, "zzsecond").size == 1)
  }
}
