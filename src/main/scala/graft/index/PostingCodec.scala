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

  // ==== block-aligned format with skip pointers (Lucene-style) =========

  /** Block-aligned encoded posting list. Each block of `blockSize` docs is
    * SELF-CONTAINED: `blockFirst(b)` holds its first docId absolutely and
    * the byte streams restart delta/varint encoding at `docOff(b)` /
    * `tfOff(b)` / `dlOff(b)` — so a cursor can jump straight to block b
    * without decoding anything before it (the skip-list analog; Ding &
    * Suel's block-max WAND format). blockMaxTf/blockMinDl carry the exact
    * per-block BM25 upper-bound inputs.
    *
    * OPTIONAL POSITIONS (r6 format rev — the Lucene .pos-file analog, one
    * stream per chunk): `posBytes`/`posOff` are null on a positions-free
    * index. When present, posting i carries its tf(i) token ordinals in
    * the ANALYZED stream (Analyzer.tokensFor indices — identical to what
    * a re-tokenize would yield), delta+varint with the first position
    * absolute, restarting at `posOff(b)` per block so block jumps stay
    * O(1). Phrase adjacency and NEAR windows then verify against posting
    * offsets with NO docs join and NO re-analysis. Positions cost decode
    * work only when a cursor is constructed WITH them — the WAND/AND scan
    * never selects the columns, so plain queries pay nothing. */
  final case class BlockedList(
      count: Int,
      docBytes: Array[Byte], tfBytes: Array[Byte], dlBytes: Array[Byte],
      blockFirst: Array[Long],
      docOff: Array[Int], tfOff: Array[Int], dlOff: Array[Int],
      blockMaxTf: Array[Int], blockMinDl: Array[Int],
      posBytes: Array[Byte] = null, posOff: Array[Int] = null) {
    def hasPositions: Boolean = posBytes != null && posOff != null
  }

  /** `positions(i)` = the strictly-ascending token ordinals of posting i
    * (length MUST equal tfs(i)); null ⇒ no position streams (legacy /
    * positions-free build). */
  def encodeBlocked(docIds: Array[Long], tfs: Array[Int], dls: Array[Int],
                    blockSize: Int = BlockSize,
                    positions: Array[Array[Int]] = null): BlockedList = {
    val n = docIds.length
    val nb = (n + blockSize - 1) / blockSize
    val docB = new ByteArrayOutputStream(n * 2 + 8)
    val tfB = new ByteArrayOutputStream(n + 8)
    val dlB = new ByteArrayOutputStream(n + 8)
    val posB = if (positions == null) null else new ByteArrayOutputStream(n * 2 + 8)
    val first = new Array[Long](nb)
    val dOff = new Array[Int](nb)
    val tOff = new Array[Int](nb)
    val lOff = new Array[Int](nb)
    val pOff = if (positions == null) null else new Array[Int](nb)
    val bMax = new Array[Int](nb)
    val bMin = new Array[Int](nb)
    var b = 0
    while (b < nb) {
      val start = b * blockSize
      val end = math.min(start + blockSize, n)
      first(b) = docIds(start)
      dOff(b) = docB.size(); tOff(b) = tfB.size(); lOff(b) = dlB.size()
      if (posB != null) pOff(b) = posB.size()
      var prev = docIds(start)
      var maxTf = 0
      var minDl = Int.MaxValue
      var i = start
      while (i < end) {
        val d = docIds(i)
        require(i == start || d > prev, s"docIds must be strictly ascending")
        writeVarLong(docB, if (i == start) 0L else d - prev) // first = base
        prev = d
        writeVarLong(tfB, tfs(i).toLong)
        writeVarLong(dlB, dls(i).toLong)
        if (posB != null) {
          val ps = positions(i)
          require(ps.length == tfs(i),
            s"positions(i).length ${ps.length} != tf ${tfs(i)}")
          var j = 0
          var pPrev = 0
          while (j < ps.length) {
            // first position absolute, then strictly-ascending deltas
            writeVarLong(posB, (if (j == 0) ps(0) else ps(j) - pPrev).toLong)
            pPrev = ps(j)
            j += 1
          }
        }
        if (tfs(i) > maxTf) maxTf = tfs(i)
        if (dls(i) < minDl) minDl = dls(i)
        i += 1
      }
      bMax(b) = maxTf
      bMin(b) = minDl
      b += 1
    }
    BlockedList(n, docB.toByteArray, tfB.toByteArray, dlB.toByteArray,
      first, dOff, tOff, lOff, bMax, bMin,
      if (posB == null) null else posB.toByteArray, pOff)
  }

  /** Streaming cursor over a [[BlockedList]] with block jumps: `advanceTo`
    * binary-searches the blockFirst skip array and lands directly on the
    * right block, decoding only inside it.
    *
    * When the list carries position streams ([[BlockedList.hasPositions]])
    * the cursor tracks them lazily: each advance records where the current
    * posting's positions start and skips past them (tf varint reads — the
    * standard Lucene-style interleaved skip); [[positions]] materializes
    * the current posting's ordinals only when asked. Lists without
    * positions pay nothing. */
  final class BlockedCursor(l: BlockedList, blockSize: Int = BlockSize) {
    private val nb = l.blockFirst.length
    private val withPos = l.hasPositions
    private var block = 0
    private var idxInBlock = -1 // index of current posting within block
    private var docPos = 0
    private var tfPos = 0
    private var dlPos = 0
    private var posPos = 0      // next unread byte of the position stream
    private var posStart = 0    // current posting's positions start here
    private var curDoc = -1L
    private var curTf = 0
    private var curDl = 0
    private var done = l.count == 0
    if (!done) { openBlock(0); advance() }

    private def blockLen(b: Int): Int =
      math.min(blockSize, l.count - b * blockSize)

    def exhausted: Boolean = done
    def docId: Long = if (done) Long.MaxValue else curDoc
    def tf: Int = curTf
    def dl: Int = curDl
    /** Current block's exact BM25 bound inputs. */
    def blockMaxTf: Int = l.blockMaxTf(math.min(block, nb - 1))
    def blockMinDl: Int = l.blockMinDl(math.min(block, nb - 1))
    /** First docId of the next block, or MaxValue in the last block —
      * the BMW skip candidate. */
    def nextBlockStart: Long =
      if (block + 1 < nb) l.blockFirst(block + 1) else Long.MaxValue

    /** The current posting's token ordinals (ascending), decoded on
      * demand; throws on a positions-free list. */
    def positions: Array[Int] = {
      require(withPos, "posting list carries no position streams")
      val out = new Array[Int](curTf)
      var p = posStart
      var prev = 0
      var j = 0
      while (j < curTf) {
        val (v, p2) = PostingCodec.readVarLong(l.posBytes, p)
        prev = if (j == 0) v.toInt else prev + v.toInt
        out(j) = prev
        p = p2
        j += 1
      }
      out
    }

    private def openBlock(b: Int): Unit = {
      block = b
      idxInBlock = -1
      docPos = l.docOff(b); tfPos = l.tfOff(b); dlPos = l.dlOff(b)
      if (withPos) posPos = l.posOff(b)
      curDoc = l.blockFirst(b) // delta base; first advance adds 0
    }

    def advance(): Unit = {
      if (done) return
      if (idxInBlock + 1 >= blockLen(block)) {
        if (block + 1 >= nb) { done = true; return }
        openBlock(block + 1)
      }
      idxInBlock += 1
      val (d, p1) = PostingCodec.readVarLong(l.docBytes, docPos)
      curDoc += d // first-in-block delta is 0 against blockFirst base
      docPos = p1
      val (t, p2) = PostingCodec.readVarLong(l.tfBytes, tfPos)
      curTf = t.toInt; tfPos = p2
      val (dl0, p3) = PostingCodec.readVarLong(l.dlBytes, dlPos)
      curDl = dl0.toInt; dlPos = p3
      if (withPos) {
        // skip the posting's tf position varints (byte-scan, no decode)
        posStart = posPos
        var j = 0
        var p = posPos
        while (j < curTf) {
          while ((l.posBytes(p) & 0x80) != 0) p += 1
          p += 1
          j += 1
        }
        posPos = p
      }
    }

    def advanceTo(target: Long): Unit = {
      if (done || curDoc >= target) return
      // jump blocks: last block whose first <= target. Direct bounds
      // check, NOT the MaxValue sentinel — target may itself be MaxValue
      // (the "advance to end" call), which must not enter the jump.
      if (block + 1 < nb && l.blockFirst(block + 1) <= target) {
        var lo = block + 1
        var hi = nb - 1
        while (lo < hi) { // find last b with blockFirst(b) <= target
          val mid = (lo + hi + 1) >>> 1
          if (l.blockFirst(mid) <= target) lo = mid else hi = mid - 1
        }
        openBlock(lo)
        advance() // position on the block's first posting
      }
      while (!done && curDoc < target) advance()
    }
  }
}
