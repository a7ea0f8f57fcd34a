package graft.codec

/** Posting-list block codec (SURVEY.md §2.4 C1–C3).
  *
  * Logical content per posting: (docId, tf, lenByte, positions[]).
  * docIds strictly ascending within a list. Physical layout — postings are
  * chunked into blocks of <=128 (the reference's block limit,
  * [W] whoosh/codec/whoosh3.py `blocklimit=128`), delta-encoded and
  * varint-compressed, each block carrying a skippable header with the block
  * max term frequency (the block-max hook for WAND, SURVEY.md §2.7):
  *
  * {{{
  * list   := block*                          // count implied by byte length
  * block  := header body
  * header := varint count                    // postings in this block (1..128)
  *           varint firstGap                 // firstDocId - prevBlockLast (init -1)
  *           varint span                    // lastDocId - firstDocId
  *           varint maxTf                   // max tf in block
  *           varint bodyLen                 // bytes in body (for skipping)
  * body   := varint docGap[count-1]         // consecutive docId gaps
  *           varint tf[count]
  *           rawbyte lenByte[count]         // LengthByte code of the doc's field length
  *           positions[count]               // per posting: varint pos0, varint posGap[tf-1]
  * }}}
  *
  * The per-posting `lenByte` denormalizes the reference's per-segment length
  * file into the posting itself (1 byte/posting): at 10^12-doc scale this is
  * what lets the query kernel score without a random-access norms sidecar or
  * a per-query norms shuffle.
  */
object PostingsCodec {
  final val BlockSize = 128

  /** One decoded posting. */
  final case class Pst(docId: Long, tf: Int, lenByte: Int, positions: Array[Int]) {
    override def equals(o: Any): Boolean = o match {
      case p: Pst => p.docId == docId && p.tf == tf && p.lenByte == lenByte &&
        java.util.Arrays.equals(p.positions, positions)
      case _ => false
    }
    override def hashCode: Int =
      (docId.## * 31 + tf) * 31 + java.util.Arrays.hashCode(positions)
  }

  /** Result of encoding a full list. `cf` = collection frequency (sum of
    * tf over the list's postings) — carried through build/merge so the
    * lexicon can expose corpus-wide term weight (the Bo1 key-term input,
    * [W] whoosh/reading.py `frequency`) without ever re-decoding blocks. */
  final case class Encoded(df: Int, maxTf: Int, cf: Long, bytes: Array[Byte])

  /** Incremental block encoder: postings are appended docId-ascending
    * (one at a time — the streaming primitive behind map-side partial runs),
    * positions supplied either decoded or as pre-encoded varint bytes
    * (pos0 + gaps, the exact block wire format -> verbatim copy). */
  final class Encoder {
    private val docs = new Array[Long](BlockSize)
    private val tfs = new Array[Int](BlockSize)
    private val lens = new Array[Int](BlockSize)
    private val posW = new Varint.Writer(512) // positions section of the block
    private val out = new Varint.Writer(256)
    private var n = 0
    private var prevLast = -1L
    private var lastSeen = -1L
    private var df = 0
    private var listMaxTf = 0
    private var listCf = 0L

    def add(docId: Long, tf: Int, lenByte: Int, positions: Array[Int]): Unit = {
      val start = addHeaderFields(docId, tf, lenByte)
      posW.writeVarInt(positions(0))
      var j = 1
      while (j < positions.length) {
        posW.writeVarInt(positions(j) - positions(j - 1)); j += 1
      }
      if (start) flushIfFull()
    }

    /** positions already wire-encoded (varint pos0 + gaps) */
    def addEncoded(docId: Long, tf: Int, lenByte: Int,
                   posBytes: Array[Byte], off: Int, len: Int): Unit = {
      val start = addHeaderFields(docId, tf, lenByte)
      posW.writeRawBytes(posBytes, off, len)
      if (start) flushIfFull()
    }

    private def addHeaderFields(docId: Long, tf: Int, lenByte: Int): Boolean = {
      require(docId > lastSeen, s"postings must be docId-ascending: $docId after $lastSeen")
      lastSeen = docId
      docs(n) = docId; tfs(n) = tf; lens(n) = lenByte
      n += 1; df += 1; listCf += tf
      true
    }
    @inline private def flushIfFull(): Unit = if (n == BlockSize) flushBlock()

    private def flushBlock(): Unit = {
      if (n == 0) return
      val first = docs(0)
      val last = docs(n - 1)
      val bw = new Varint.Writer(64 + posW.size)
      var i = 1
      while (i < n) { bw.writeVarLong(docs(i) - docs(i - 1)); i += 1 }
      var maxTf = 0
      i = 0
      while (i < n) {
        if (tfs(i) > maxTf) maxTf = tfs(i)
        bw.writeVarInt(tfs(i)); i += 1
      }
      i = 0
      while (i < n) { bw.writeRawByte(lens(i)); i += 1 }
      bw.writeRawBytes(posW.toBytes)
      out.writeVarInt(n)
      out.writeVarLong(first - prevLast)
      out.writeVarLong(last - first)
      out.writeVarInt(maxTf)
      out.writeVarInt(bw.size)
      out.writeRawBytes(bw.toBytes)
      prevLast = last
      if (maxTf > listMaxTf) listMaxTf = maxTf
      n = 0
      posW.reset()
    }

    def isEmpty: Boolean = df == 0
    def finish(): Encoded = { flushBlock(); Encoded(df, listMaxTf, listCf, out.toBytes) }
  }

  /** Encode a docId-ascending stream of postings. */
  def encode(postings: Iterator[Pst]): Encoded = {
    val enc = new Encoder
    postings.foreach { p =>
      require(p.positions.length == p.tf, s"tf=${p.tf} != positions ${p.positions.length}")
      enc.add(p.docId, p.tf, p.lenByte, p.positions)
    }
    enc.finish()
  }

  /** Fully decode a list (merge path, tests). Streaming, block at a time. */
  def decodeIterator(bytes: Array[Byte]): Iterator[Pst] = new Iterator[Pst] {
    private val cur = new TermCursor(bytes)
    def hasNext: Boolean = cur.docId != Long.MaxValue
    def next(): Pst = {
      val p = Pst(cur.docId, cur.tf, cur.lenByte, cur.positions)
      cur.next()
      p
    }
  }

  /** Block-at-a-time cursor with header-only block skipping.
    *
    * `docId` is Long.MaxValue when exhausted. `skipTo(t)` advances to the
    * first posting with docId >= t, skipping undecoded blocks whose header
    * says last < t (the skip mechanism behind block-max WAND).
    */
  final class TermCursor(bytes: Array[Byte]) {
    private val r = new Varint.Reader(bytes)
    private var prevLast = -1L

    // decoded current block
    private var cCount = 0
    private var cDocs: Array[Long] = null
    private var cTfs: Array[Int] = null
    private var cLens: Array[Int] = null
    private var cPos: Array[Array[Int]] = null
    private var idx = 0

    /** header fields of the current block (valid when not exhausted) */
    var blockLastDocId: Long = -1L
    var blockMaxTf: Int = 0

    private var exhausted = false
    loadNextBlock()

    @inline def docId: Long = if (exhausted) Long.MaxValue else cDocs(idx)
    @inline def tf: Int = cTfs(idx)
    @inline def lenByte: Int = cLens(idx)
    @inline def positions: Array[Int] = cPos(idx)

    def next(): Unit = {
      if (exhausted) return
      idx += 1
      if (idx >= cCount) loadNextBlock()
    }

    def skipTo(target: Long): Unit = {
      if (exhausted) return
      // fast path within current block
      if (blockLastDocId >= target) {
        while (cDocs(idx) < target) idx += 1
        return
      }
      // skip whole blocks by header
      var decoded = false
      while (!decoded && r.pos < bytes.length) {
        val count = r.readVarInt()
        val first = prevLast + r.readVarLong()
        val last = first + r.readVarLong()
        val maxTf = r.readVarInt()
        val bodyLen = r.readVarInt()
        if (last < target) {
          r.skip(bodyLen)
          prevLast = last
        } else {
          decodeBlock(count, first, last, maxTf)
          decoded = true
        }
      }
      if (!decoded) { exhausted = true; return }
      while (cDocs(idx) < target) idx += 1
    }

    private def loadNextBlock(): Unit = {
      if (r.pos >= bytes.length) { exhausted = true; return }
      val count = r.readVarInt()
      val first = prevLast + r.readVarLong()
      val last = first + r.readVarLong()
      val maxTf = r.readVarInt()
      r.readVarInt() // bodyLen (decoding inline)
      decodeBlock(count, first, last, maxTf)
    }

    private def decodeBlock(count: Int, first: Long, last: Long, maxTf: Int): Unit = {
      cCount = count
      cDocs = new Array[Long](count)
      cTfs = new Array[Int](count)
      cLens = new Array[Int](count)
      cPos = new Array[Array[Int]](count)
      cDocs(0) = first
      var i = 1
      while (i < count) { cDocs(i) = cDocs(i - 1) + r.readVarLong(); i += 1 }
      i = 0
      while (i < count) { cTfs(i) = r.readVarInt(); i += 1 }
      i = 0
      while (i < count) { cLens(i) = r.readRawByte(); i += 1 }
      i = 0
      while (i < count) {
        val tf = cTfs(i)
        val ps = new Array[Int](tf)
        ps(0) = r.readVarInt()
        var j = 1
        while (j < tf) { ps(j) = ps(j - 1) + r.readVarInt(); j += 1 }
        cPos(i) = ps
        i += 1
      }
      idx = 0
      prevLast = last
      blockLastDocId = last
      blockMaxTf = maxTf
      exhausted = false
    }
  }

  /** k-way merge of docId-ascending encoded lists into one encoded list.
    * Inputs must cover disjoint, ascending docId ranges OR simply be
    * globally mergeable (strictly ascending overall after merge). */
  def merge(lists: Seq[Array[Byte]]): Encoded = {
    val its = lists.map(decodeIterator).filter(_.hasNext)
    // typical case in segment merge: disjoint ascending ranges -> concat order;
    // use a general k-way merge for safety.
    implicit val ord: Ordering[(Pst, Int)] = Ordering.by { case (p, i) => (-p.docId, -i) }
    val pq = scala.collection.mutable.PriorityQueue.empty[(Pst, Int)]
    val arr = its.toArray
    for (i <- arr.indices) if (arr(i).hasNext) pq.enqueue((arr(i).next(), i))
    val out = new Iterator[Pst] {
      def hasNext: Boolean = pq.nonEmpty
      def next(): Pst = {
        val (p, i) = pq.dequeue()
        if (arr(i).hasNext) pq.enqueue((arr(i).next(), i))
        p
      }
    }
    encode(out)
  }
}
