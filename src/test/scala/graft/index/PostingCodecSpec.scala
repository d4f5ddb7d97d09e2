package graft.index

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.Props.forAllSeeded

class PostingCodecSpec extends AnyFunSuite {

  private val sortedDocIds: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 1L << 50)).map(_.distinct.sorted.toArray)

  test("property: decode(encode(docIds)) == docIds for sorted distinct lists") {
    forAllSeeded(sortedDocIds) { ids =>
      val enc = PostingCodec.encodeDocIds(ids)
      assert(PostingCodec.decodeDocIds(enc, ids.length).toSeq == ids.toSeq)
    }
  }

  test("property: tf round-trip") {
    forAllSeeded(Gen.listOf(Gen.chooseNum(0, Int.MaxValue))) { tfs =>
      val a = tfs.toArray
      val enc = PostingCodec.encodeTfs(a)
      assert(PostingCodec.decodeTfs(enc, a.length).toSeq == a.toSeq)
    }
  }

  test("delta+varint is compact: dense ascending ids ≈ 1 byte/id") {
    val ids = Array.tabulate(100000)(i => i.toLong * 3)
    val enc = PostingCodec.encodeDocIds(ids)
    assert(enc.length < 110000, s"got ${enc.length} bytes for 100k ids")
  }

  test("encode rejects non-ascending docIds") {
    intercept[IllegalArgumentException] {
      PostingCodec.encodeDocIds(Array(5L, 5L))
    }
    intercept[IllegalArgumentException] {
      PostingCodec.encodeDocIds(Array(5L, 3L))
    }
  }

  test("blockMaxTf: per-128 block maxima") {
    val tfs = Array.tabulate(300)(i => i % 97)
    val bm = PostingCodec.blockMaxTf(tfs)
    assert(bm.length == 3)
    assert(bm(0) == tfs.slice(0, 128).max)
    assert(bm(1) == tfs.slice(128, 256).max)
    assert(bm(2) == tfs.slice(256, 300).max)
  }

  test("cursor streams postings and advanceTo gallops") {
    val ids = Array.tabulate(1000)(i => i.toLong * 7 + 3)
    val tfs = Array.tabulate(1000)(i => (i % 13) + 1)
    val c = new PostingCodec.Cursor(
      PostingCodec.encodeDocIds(ids), PostingCodec.encodeTfs(tfs), 1000)
    assert(c.docId == 3L && c.tf == 1)
    c.advanceTo(3 + 7 * 500)
    assert(c.docId == 3 + 7 * 500 && c.tf == (500 % 13) + 1)
    c.advanceTo(Long.MaxValue)
    assert(c.exhausted)
  }
}
