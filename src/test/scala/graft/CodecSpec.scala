package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.codec.{Varint, LengthByte, PostingsCodec}
import PostingsCodec.Pst

class CodecSpec extends AnyFunSuite with PropSupport {

  test("varint roundtrip for arbitrary non-negative longs") {
    forSamples(Gen.listOf(Gen.chooseNum(0L, Long.MaxValue))) { xs =>
      assert(Varint.decode(Varint.encode(xs)).toList == xs)
    }
  }

  test("varint encodes small values in one byte") {
    assert(Varint.encode(Seq(0L)).length == 1)
    assert(Varint.encode(Seq(127L)).length == 1)
    assert(Varint.encode(Seq(128L)).length == 2)
  }

  test("length byte: exact below 128, floor + monotone above") {
    for (l <- 0 until 128) assert(LengthByte.roundtrip(l) == l)
    var prev = -1
    for (b <- 0 to 255) {
      val d = LengthByte.decode(b)
      assert(d > prev, s"decode must be strictly increasing at $b")
      prev = d
      assert(LengthByte.encode(d) == b, s"encode(decode($b)) must be $b")
    }
    forSamples(Gen.chooseNum(0, 2000000)) { l =>
      val rt = LengthByte.roundtrip(l)
      assert(rt <= math.min(l, LengthByte.MaxDecoded))
      assert(LengthByte.roundtrip(rt) == rt) // idempotent
    }
    assert(LengthByte.decode(255) == LengthByte.MaxDecoded)
  }

  private val genPostings: Gen[List[Pst]] = for {
    n <- Gen.chooseNum(0, 500)
    gaps <- Gen.listOfN(n, Gen.chooseNum(1L, 50L))
    rows <- Gen.sequence[List[Pst], Pst](gaps.scanLeft(-1L)(_ + _).tail.map { docId =>
      for {
        tf <- Gen.chooseNum(1, 12)
        posGaps <- Gen.listOfN(tf, Gen.chooseNum(0, 9))
        lb <- Gen.chooseNum(0, 255)
      } yield Pst(docId, tf, lb,
        posGaps.scanLeft(0)(_ + _ + 1).tail.toArray)
    })
  } yield rows

  test("postings codec roundtrip") {
    forSamples(genPostings) { ps =>
      val enc = PostingsCodec.encode(ps.iterator)
      assert(enc.df == ps.length)
      if (ps.nonEmpty) assert(enc.maxTf == ps.map(_.tf).max)
      val dec = PostingsCodec.decodeIterator(enc.bytes).toList
      assert(dec == ps)
    }
  }

  test("cursor skipTo lands on first docId >= target, skipping blocks") {
    forSamples(genPostings, Gen.chooseNum(0L, 30000L)) { (ps, target) =>
      if (ps.nonEmpty) {
        val enc = PostingsCodec.encode(ps.iterator)
        val cur = new PostingsCodec.TermCursor(enc.bytes)
        cur.skipTo(target)
        val expect = ps.find(_.docId >= target)
        expect match {
          case Some(p) =>
            assert(cur.docId == p.docId && cur.tf == p.tf)
            assert(cur.positions.toList == p.positions.toList)
          case None => assert(cur.docId == Long.MaxValue)
        }
      }
    }
  }

  test("merge of disjoint splits == encode of the union") {
    forSamples(genPostings, Gen.chooseNum(1, 4)) { (ps, parts) =>
      val chunks = ps.grouped(math.max(1, ps.length / parts + 1)).toSeq
      val encs = chunks.map(c => PostingsCodec.encode(c.iterator).bytes)
      val merged = PostingsCodec.merge(encs)
      val direct = PostingsCodec.encode(ps.iterator)
      assert(java.util.Arrays.equals(merged.bytes, direct.bytes))
      assert(merged.df == direct.df && merged.maxTf == direct.maxTf)
    }
  }

  test("sortable numeric encoding round-trips and preserves signed order") {
    import graft.build.FieldTypes
    val genLong = org.scalacheck.Gen.chooseNum(Long.MinValue, Long.MaxValue)
    forSamples(genLong, genLong) { (a, b) =>
      assert(FieldTypes.decodeLong(FieldTypes.encodeLong(a)) == a)
      assert((FieldTypes.encodeLong(a) < FieldTypes.encodeLong(b)) == (a < b))
      assert(FieldTypes.encodeLong(a).length == 16)
    }
    // datetime encoding follows time order (date vs datetime forms)
    assert(FieldTypes.encodeValue(graft.build.DatetimeType, "2020-01-01").get <
      FieldTypes.encodeValue(graft.build.DatetimeType, "2020-01-01t00:00:01").get)
    assert(FieldTypes.encodeValue(graft.build.DatetimeType, "1969-12-31").get <
      FieldTypes.encodeValue(graft.build.DatetimeType, "1970-01-02").get)
    assert(FieldTypes.encodeValue(graft.build.NumericType, "nope").isEmpty)
    assert(FieldTypes.encodeValue(graft.build.DatetimeType, "2020-13-40").isEmpty)
  }

  test("sigsWithin enumerates exactly the hamming ball, each sig once") {
    def choose(n: Int, k: Int): Long =
      (0 until k).map(i => (n - i).toLong).product / (1L to math.max(1, k)).product
    forSamples(org.scalacheck.Gen.chooseNum(0, 65535),
               org.scalacheck.Gen.chooseNum(0, 5)) { (sig, r) =>
      val ball = graft.ops.Similarity.sigsWithin(sig, 16, r)
      assert(ball.distinct.length == ball.length)
      assert(ball.forall(s => Integer.bitCount(s ^ sig) <= r && s >= 0 && s < 65536))
      assert(ball.length.toLong == (0 to r).map(choose(16, _)).sum)
    }
  }

  test("intra-word split: parts partition the alphanumeric characters in order") {
    val genWord = org.scalacheck.Gen.chooseNum(0, 20).flatMap(n =>
      org.scalacheck.Gen.listOfN(n, org.scalacheck.Gen.frequency(
        5 -> org.scalacheck.Gen.alphaLowerChar,
        3 -> org.scalacheck.Gen.alphaUpperChar,
        2 -> org.scalacheck.Gen.numChar,
        1 -> org.scalacheck.Gen.oneOf('-', '_', '.'))).map(_.mkString))
    val chain = new graft.analysis.Chain(
      graft.analysis.AnalyzerSpec(graft.analysis.WhitespaceTok,
        List(graft.analysis.IntraWordF)))
    forSamples(genWord, 300) { w =>
      val parts = chain.tokenize(w).map(_.term)
      assert(parts.mkString == w.filter(_.isLetterOrDigit), s"'$w' -> $parts")
      assert(parts.forall(_.nonEmpty))
    }
  }
}
