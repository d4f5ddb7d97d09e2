package graft.index

import java.io.ByteArrayOutputStream

/** Delta + varint codec for posting lists, plus per-block max-tf metadata
  * for block-max WAND (SURVEY.md §7.5).
  *
  * The reference stores one MySQL row per (lemma, page) with a float tf
  * (model/IndexEntity.java:13-30); at 10^12 turns that relational layout is
  * ~10^13 rows, so we compress each (term, salt) posting list into two
  * binary blobs: docIds (strictly ascending, delta+varint) and tfs (varint).
  *
  * Pure JVM code — executed inside executor tasks via mapPartitions /
  * Aggregator; no Spark imports.
  */
object PostingCodec extends Serializable {

  /** Docs per block-max entry. 128 is the standard block size in the
    * block-max WAND literature (Ding & Suel, SIGIR'11). */
  val BlockSize = 128

  // ---- varint primitives (unsigned LEB128) ----

  def writeVarLong(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    require(v >= 0, s"varint requires non-negative, got $v")
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Reads a varint starting at pos; returns (value, nextPos). */
  def readVarLong(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var p = pos
    var shift = 0
    var result = 0L
    var b = 0
    do {
      b = bytes(p) & 0xff
      result |= (b & 0x7fL) << shift
      shift += 7
      p += 1
    } while ((b & 0x80) != 0)
    (result, p)
  }

  // ---- posting list encode/decode ----

  /** Encode strictly-ascending docIds as first-value + deltas, varint. */
  def encodeDocIds(docIds: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(docIds.length * 2 + 8)
    var prev = 0L
    var i = 0
    while (i < docIds.length) {
      val d = docIds(i)
      require(i == 0 || d > prev, s"docIds must be strictly ascending: $prev -> $d")
      writeVarLong(out, if (i == 0) d else d - prev)
      prev = d
      i += 1
    }
    out.toByteArray
  }

  def decodeDocIds(bytes: Array[Byte], count: Int): Array[Long] = {
    val out = new Array[Long](count)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < count) {
      val (v, p) = readVarLong(bytes, pos)
      prev = if (i == 0) v else prev + v
      out(i) = prev
      pos = p
      i += 1
    }
    out
  }

  def encodeTfs(tfs: Array[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream(tfs.length + 8)
    var i = 0
    while (i < tfs.length) { writeVarLong(out, tfs(i).toLong); i += 1 }
    out.toByteArray
  }

  def decodeTfs(bytes: Array[Byte], count: Int): Array[Int] = {
    val out = new Array[Int](count)
    var pos = 0
    var i = 0
    while (i < count) {
      val (v, p) = readVarLong(bytes, pos)
      out(i) = v.toInt
      pos = p
      i += 1
    }
    out
  }

  /** First (absolute) docId of an encoded list — chunks of one
    * (shard, term) concatenate in firstDocId order, which is robust even
    * if a shard's rows were processed by more than one task. */
  def firstDocId(docBytes: Array[Byte]): Long =
    if (docBytes.isEmpty) Long.MaxValue else readVarLong(docBytes, 0)._1

  /** Per-block max tf, one entry per BlockSize docs (block-max WAND upper
    * bounds; SURVEY.md §7.5). */
  def blockMaxTf(tfs: Array[Int]): Array[Int] = {
    if (tfs.isEmpty) return Array.empty
    val nBlocks = (tfs.length + BlockSize - 1) / BlockSize
    val out = new Array[Int](nBlocks)
    var b = 0
    while (b < nBlocks) {
      var m = 0
      var i = b * BlockSize
      val end = math.min(i + BlockSize, tfs.length)
      while (i < end) { if (tfs(i) > m) m = tfs(i); i += 1 }
      out(b) = m
      b += 1
    }
    out
  }

  /** Streaming cursor over an encoded posting list — never materializes
    * the full arrays (hot terms at scale). Supports the galloping-style
    * `advanceTo` the WAND driver needs; block skipping uses blockMax.
    */
  final class Cursor(docBytes: Array[Byte], tfBytes: Array[Byte], val count: Int) {
    private var idx = 0
    private var docPos = 0
    private var tfPos = 0
    private var curDoc = -1L
    private var curTf = 0
    advance() // position on first posting

    /** 0-based index of the current posting (for block lookup). */
    def index: Int = idx - 1
    def docId: Long = curDoc
    def tf: Int = curTf
    def exhausted: Boolean = curDoc == Long.MaxValue

    def advance(): Unit = {
      if (idx >= count) { curDoc = Long.MaxValue; curTf = 0 }
      else {
        val (d, p1) = PostingCodec.readVarLong(docBytes, docPos)
        curDoc = if (idx == 0) d else curDoc + d
        docPos = p1
        val (t, p2) = PostingCodec.readVarLong(tfBytes, tfPos)
        curTf = t.toInt
        tfPos = p2
        idx += 1
      }
    }

    /** Advance until docId >= target. */
    def advanceTo(target: Long): Unit = {
      while (curDoc < target) advance()
    }
  }
}
