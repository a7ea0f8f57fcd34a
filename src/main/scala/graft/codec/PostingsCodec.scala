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

  /** Result of encoding a full list. */
  final case class Encoded(df: Int, maxTf: Int, bytes: Array[Byte])

  /** Encode a docId-ascending stream of postings. */
  def encode(postings: Iterator[Pst]): Encoded = {
    val out = new Varint.Writer(256)
    val body = new Array[Pst](BlockSize)
    var prevLast = -1L
    var df = 0
    var listMaxTf = 0

    def flush(n: Int): Unit = {
      if (n == 0) return
      val first = body(0).docId
      val last = body(n - 1).docId
      var maxTf = 0
      val bw = new Varint.Writer(256)
      var i = 1
      while (i < n) { bw.writeVarLong(body(i).docId - body(i - 1).docId); i += 1 }
      i = 0
      while (i < n) {
        val tf = body(i).tf
        if (tf > maxTf) maxTf = tf
        bw.writeVarInt(tf); i += 1
      }
      i = 0
      while (i < n) { bw.writeRawByte(body(i).lenByte); i += 1 }
      i = 0
      while (i < n) {
        val ps = body(i).positions
        bw.writeVarInt(ps(0))
        var j = 1
        while (j < ps.length) { bw.writeVarInt(ps(j) - ps(j - 1)); j += 1 }
        i += 1
      }
      out.writeVarInt(n)
      out.writeVarLong(first - prevLast)
      out.writeVarLong(last - first)
      out.writeVarInt(maxTf)
      out.writeVarInt(bw.size)
      out.writeRawBytes(bw.toBytes)
      prevLast = last
      if (maxTf > listMaxTf) listMaxTf = maxTf
    }

    var n = 0
    var lastSeen = -1L
    while (postings.hasNext) {
      val p = postings.next()
      require(p.docId > lastSeen, s"postings must be docId-ascending: ${p.docId} after $lastSeen")
      require(p.positions.length == p.tf, s"tf=${p.tf} != positions ${p.positions.length}")
      lastSeen = p.docId
      body(n) = p; n += 1; df += 1
      if (n == BlockSize) { flush(n); n = 0 }
    }
    flush(n)
    Encoded(df, listMaxTf, out.toBytes)
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
