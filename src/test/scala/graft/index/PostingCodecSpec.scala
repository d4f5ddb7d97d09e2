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

  // ---- positional streams (r6 format rev) ---------------------------

  /** Deterministic multi-block positional fixture: posting i carries
    * tf(i) strictly-ascending ordinals derived from i. */
  private def posFixture(n: Int): (Array[Long], Array[Int], Array[Int],
                                   Array[Array[Int]]) = {
    val ids = Array.tabulate(n)(i => i.toLong * 5 + 2)
    val tfs = Array.tabulate(n)(i => (i % 7) + 1)
    val dls = Array.tabulate(n)(i => (i % 40) + 8)
    val pos = Array.tabulate(n) { i =>
      var p = i % 11
      Array.tabulate(tfs(i)) { j => p += (i + j) % 13 + 1; p }
    }
    (ids, tfs, dls, pos)
  }

  test("positions round-trip: every posting's ordinals survive encode + sequential walk") {
    val (ids, tfs, dls, pos) = posFixture(1000) // ~8 blocks at size 128
    val l = PostingCodec.encodeBlocked(ids, tfs, dls, positions = pos)
    assert(l.hasPositions)
    val c = new PostingCodec.BlockedCursor(l)
    var i = 0
    while (!c.exhausted) {
      assert(c.docId == ids(i) && c.tf == tfs(i))
      assert(c.positions.toSeq == pos(i).toSeq, s"posting $i")
      i += 1
      c.advance()
    }
    assert(i == ids.length)
  }

  test("positions after a block jump: advanceTo lands with the RIGHT ordinals (posOff restart)") {
    val (ids, tfs, dls, pos) = posFixture(2000)
    val l = PostingCodec.encodeBlocked(ids, tfs, dls, positions = pos)
    // jump straight into late blocks from a fresh cursor, then spot-check
    Seq(1999, 1500, 777, 130, 129, 128, 127, 0).foreach { i =>
      val c = new PostingCodec.BlockedCursor(l)
      c.advanceTo(ids(i))
      assert(c.docId == ids(i))
      assert(c.positions.toSeq == pos(i).toSeq, s"jump to posting $i")
    }
    // and a forward galloping walk on one cursor
    val c = new PostingCodec.BlockedCursor(l)
    Seq(3, 128, 500, 501, 1999).foreach { i =>
      c.advanceTo(ids(i))
      assert(c.positions.toSeq == pos(i).toSeq, s"gallop to posting $i")
    }
  }

  test("positions-free list: hasPositions false, cursor.positions throws, decode unaffected") {
    val (ids, tfs, dls, _) = posFixture(300)
    val l = PostingCodec.encodeBlocked(ids, tfs, dls)
    assert(!l.hasPositions)
    val c = new PostingCodec.BlockedCursor(l)
    c.advanceTo(ids(250))
    assert(c.docId == ids(250) && c.tf == tfs(250))
    intercept[IllegalArgumentException](c.positions)
  }

  test("encode rejects a positions row whose length disagrees with tf") {
    val ids = Array(1L, 2L)
    val tfs = Array(2, 1)
    val dls = Array(5, 5)
    intercept[IllegalArgumentException] {
      PostingCodec.encodeBlocked(ids, tfs, dls,
        positions = Array(Array(0, 3), Array(1, 2))) // second row: tf=1, 2 ordinals
    }
  }

  test("property: positional round-trip at a tiny block size (many blocks)") {
    val g = Gen.chooseNum(1, 400)
    forAllSeeded(g) { n =>
      val (ids, tfs, dls, pos) = posFixture(n)
      val l = PostingCodec.encodeBlocked(ids, tfs, dls, blockSize = 16,
        positions = pos)
      val c = new PostingCodec.BlockedCursor(l, blockSize = 16)
      var i = 0
      while (!c.exhausted) {
        assert(c.positions.toSeq == pos(i).toSeq)
        i += 1; c.advance()
      }
      assert(i == n)
    }
  }
}
