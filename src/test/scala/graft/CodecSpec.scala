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
}
