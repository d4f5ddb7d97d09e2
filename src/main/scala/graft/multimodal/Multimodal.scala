package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * batched per-partition transforms (the Scala analog of
  * `mapInPandas` batch UDFs — one partition = one batch stream, no
  * per-row JVM↔native round trips).
  *
  * Codec status (r5): IMAGE, AUDIO and VIDEO decode are all REAL —
  * [[JdkCodec]] uses the JDK's own `javax.imageio` (PNG/JPEG/BMP/GIF),
  * a hand-rolled RIFF/WAVE PCM parser, and a hand-rolled RIFF/AVI
  * container walk whose MJPEG frame payloads decode through the same
  * `javax.imageio` JPEG decoder (MJPEG = one whole JPEG per frame, the
  * one video coding the bare JDK can decode). Everything is
  * headless-safe and deterministic (pixel/sample math in integer
  * accumulators, resize by direct-raster nearest neighbor — no AWT
  * rendering pipeline). [[StubCodec]] remains only as the
  * codec-agnostic byte-level fake behind the generic batch-contract
  * demos ([[extractFeatures]]/[[sampleFrames]]/[[resized]]).
  */
object Multimodal {

  /** media(media_id, kind, bytes, meta{width,height,duration_ms,mime}) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType),
      StructField("mime", StringType))), nullable = false)))

  final case class MediaMeta(width: Int, height: Int, duration_ms: Long, mime: String)
  final case class Media(media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** ======================== STUB ========================
    * Deterministic fake codec: expands a seed into bytes and reduces
    * bytes to a fixed-size "feature" vector with a rolling hash. A real
    * deployment replaces these with image/audio decoders (`???` boundary —
    * intentionally the ONLY fake layer). */
  object StubCodec extends Serializable {
    def synthBytes(seed: Long, n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var h = seed * 0x9E3779B97F4A7C15L + 1
      var i = 0
      while (i < n) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(i) = (h & 0xff).toByte
        i += 1
      }
      out
    }

    /** STUB feature extractor: 16 deterministic moments of the payload.
      * Real impl: decode → model forward pass. */
    def extractFeatures(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < bytes.length) {
        acc(i % dim) += (bytes(i) & 0xff).toLong * ((i / dim) % 251 + 1)
        i += 1
      }
      acc.map(a => (a % 100003L).toFloat / 100003f)
    }

    /** STUB resize: proportional byte subsample (real impl: pixel resample). */
    def resize(bytes: Array[Byte], factor: Int): Array[Byte] =
      bytes.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }

    /** STUB frame sampling: fixed-stride byte blocks as "frames". */
    def sampleFrames(bytes: Array[Byte], nFrames: Int): Seq[Array[Byte]] = {
      if (bytes.isEmpty) return Nil
      val stride = math.max(1, bytes.length / math.max(1, nFrames))
      (0 until math.min(nFrames, bytes.length / stride + 1)).map { f =>
        bytes.slice(f * stride, math.min(bytes.length, f * stride + stride))
      }.filter(_.nonEmpty)
    }
  }

  /** ==================== REAL JDK CODEC (r5) ====================
    * Image + audio decode with ONLY the JDK: `javax.imageio` for
    * images (PNG/JPEG/BMP/GIF), a RIFF/WAVE parser for 16-bit PCM
    * audio. Everything is deterministic (integer accumulators, exact
    * nearest-neighbor resample) and headless-safe (in-memory rasters,
    * no Graphics2D/AWT rendering). Decode returns Option — corrupt
    * payloads surface as `decoded = false` rows, never dropped rows or
    * task failures (a 100 TB media sweep always has corrupt members). */
  object JdkCodec extends Serializable {

    def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException | _: RuntimeException => None }

    /** (width, height, features[dim]): [0]=aspect, [1..3]=mean R/G/B,
      * [4]=luma stddev, [5..]=normalized luma histogram. All moments
      * accumulate in Longs — bit-deterministic at any parallelism. */
    def imageSignals(bytes: Array[Byte], dim: Int = 16): Option[(Int, Int, Array[Float])] =
      decodeImage(bytes).map { img =>
        val w = img.getWidth; val h = img.getHeight
        val bins = math.max(1, dim - 5)
        val hist = new Array[Long](bins)
        var sr = 0L; var sg = 0L; var sb = 0L; var sy = 0L; var syy = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            // integer Rec.601 luma (exact): (299r + 587g + 114b) / 1000
            val luma = (299 * r + 587 * g + 114 * b) / 1000
            sr += r; sg += g; sb += b; sy += luma; syy += luma.toLong * luma
            hist(math.min(bins - 1, luma * bins / 256)) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val mean = sy.toDouble / n
        val variance = syy.toDouble / n - mean * mean
        val f = new Array[Float](dim)
        f(0) = w.toFloat / h
        if (dim > 1) f(1) = (sr.toDouble / n / 255.0).toFloat
        if (dim > 2) f(2) = (sg.toDouble / n / 255.0).toFloat
        if (dim > 3) f(3) = (sb.toDouble / n / 255.0).toFloat
        if (dim > 4) f(4) = (math.sqrt(math.max(0.0, variance)) / 255.0).toFloat
        var i = 0
        while (i < bins && 5 + i < dim) {
          f(5 + i) = (hist(i).toDouble / n).toFloat; i += 1
        }
        (w, h, f)
      }

    /** Exact nearest-neighbor resample by direct raster indexing
      * (srcX = x * srcW / dstW — pure integer math), re-encoded as PNG
      * (lossless; ImageIO's PNG writer emits no timestamps, so equal
      * pixels ⇒ equal bytes). */
    def resizeImage(bytes: Array[Byte], dstW: Int, dstH: Int): Option[Array[Byte]] =
      decodeImage(bytes).map { src =>
        val out = new java.awt.image.BufferedImage(dstW, dstH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < dstH) {
          val sy = y * src.getHeight / dstH
          var x = 0
          while (x < dstW) {
            out.setRGB(x, y, src.getRGB(x * src.getWidth / dstW, sy))
            x += 1
          }
          y += 1
        }
        encodePng(out)
      }

    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Deterministic synthetic PNG: a seeded xorshift pixel field with a
      * gradient — real bytes for the real decoder, stable across runs. */
    def synthPng(seed: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var s = seed * 0x9E3779B97F4A7C15L + 1
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          s ^= s << 13; s ^= s >>> 7; s ^= s << 17
          val r = ((s & 0xff) + 256 * x / w) / 2
          val g = (((s >>> 8) & 0xff) + 256 * y / h) / 2
          val b = ((s >>> 16) & 0xff).toInt
          img.setRGB(x, y, (r.toInt << 16) | (g.toInt << 8) | b)
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    /** Parsed 16-bit PCM payload. */
    final case class WavPcm(sampleRate: Int, channels: Int,
                            samples: Array[Short]) {
      def durationMs: Long =
        samples.length.toLong * 1000 / (sampleRate.toLong * channels)
    }

    /** Minimal RIFF/WAVE reader: fmt must be PCM 16-bit; walks chunks
      * (fmt can precede or follow LIST etc.), bounds-checked — truncated
      * or alien payloads yield None, never an exception. */
    def parseWav(bytes: Array[Byte]): Option[WavPcm] = {
      def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      def tag(o: Int) = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      try {
        if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
        var off = 12
        var rate = -1; var ch = -1; var bits = -1
        var data: Option[(Int, Int)] = None
        while (off + 8 <= bytes.length) {
          val id = tag(off); val len = u32(off + 4).toInt
          // a corrupt 32-bit length can read back negative — without
          // this guard the chunk walk would step zero/backwards and the
          // executor task would spin forever on attacker-shaped bytes
          if (len < 0) return None
          if (id == "fmt " && off + 8 + 16 <= bytes.length) {
            val fmt = u16(off + 8)
            ch = u16(off + 10); rate = u32(off + 12).toInt; bits = u16(off + 22)
            if (fmt != 1) return None // PCM only
          } else if (id == "data") {
            data = Some((off + 8, math.min(len, bytes.length - off - 8)))
          }
          off += 8 + len + (len & 1) // chunks are word-aligned
        }
        data match {
          case Some((o, len)) if rate > 0 && ch > 0 && bits == 16 =>
            val n = len / 2
            val out = new Array[Short](n)
            var i = 0
            while (i < n) {
              out(i) = ((bytes(o + 2 * i) & 0xff) |
                ((bytes(o + 2 * i + 1) & 0xff) << 8)).toShort
              i += 1
            }
            Some(WavPcm(rate, ch, out))
          case _ => None
        }
      } catch { case _: IndexOutOfBoundsException => None }
    }

    /** (duration_ms, features[dim]): [0]=RMS/32768, [1]=zero-crossing
      * rate, [2..]=normalized energy over dim-2 equal time bins. Integer
      * accumulators throughout. */
    def wavSignals(bytes: Array[Byte], dim: Int = 16): Option[(Long, Array[Float])] =
      parseWav(bytes).filter(_.samples.nonEmpty).map { w =>
        val s = w.samples
        val bins = math.max(1, dim - 2)
        val energy = new Array[Long](bins)
        var ss = 0L; var zc = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i).toLong
          ss += v * v
          if (i > 0 && ((s(i - 1) < 0) != (s(i) < 0))) zc += 1
          energy(math.min(bins - 1, i * bins / s.length)) += v * v
          i += 1
        }
        val f = new Array[Float](dim)
        f(0) = (math.sqrt(ss.toDouble / s.length) / 32768.0).toFloat
        if (dim > 1) f(1) = (zc.toDouble / s.length).toFloat
        var b = 0
        while (b < bins && 2 + b < dim) {
          f(2 + b) = if (ss == 0L) 0f else (energy(b).toDouble / ss).toFloat
          b += 1
        }
        (w.durationMs, f)
      }

    /** Deterministic synthetic WAV: 16-bit PCM mono sine (+ seeded
      * dither) — real bytes for the real parser. */
    def synthWav(seed: Long, ms: Int, sampleRate: Int = 8000,
                 freqHz: Int = 440): Array[Byte] = {
      val n = sampleRate * ms / 1000
      val bos = new java.io.ByteArrayOutputStream(44 + 2 * n)
      def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }
      def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
      ascii("RIFF"); w32(36 + 2 * n); ascii("WAVE")
      ascii("fmt "); w32(16); w16(1); w16(1); w32(sampleRate)
      w32(sampleRate * 2); w16(2); w16(16)
      ascii("data"); w32(2 * n)
      var s = seed * 0x9E3779B97F4A7C15L + 1
      var i = 0
      while (i < n) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        val sine = math.sin(2.0 * math.Pi * freqHz * i / sampleRate)
        val dither = ((s & 0xff) - 128).toInt // ±128 seeded noise floor
        val v = math.max(-32768, math.min(32767, (sine * 12000).toInt + dither))
        w16(v & 0xffff)
        i += 1
      }
      bos.toByteArray
    }

    // ================== VIDEO: RIFF/AVI + MJPEG ==================

    /** Parsed AVI payload: container metadata + the raw per-frame JPEG
      * byte chunks ('00dc'/'00db' entries of the movi list), in stream
      * order. Frames decode individually via ImageIO (MJPEG: every
      * frame is a complete JPEG — no inter-frame state). */
    final case class AviVideo(width: Int, height: Int,
                              microSecPerFrame: Long,
                              frames: Vector[Array[Byte]]) {
      def durationMs: Long = microSecPerFrame * frames.length / 1000
    }

    /** Minimal RIFF/AVI reader: walks the chunk tree for the 'avih'
      * header (dims + frame timing) and the 'movi' LIST's video chunks.
      * Bounds-checked exactly like [[parseWav]] — truncated payloads,
      * negative 32-bit chunk lengths (which would otherwise step the
      * walk backwards and spin forever) and alien containers all yield
      * None, never an exception or a hang. */
    def parseAviMjpeg(bytes: Array[Byte]): Option[AviVideo] = {
      def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      def tag(o: Int) = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      try {
        if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
        var w = -1; var h = -1; var uspf = -1L
        val frames = Vector.newBuilder[Array[Byte]]
        var nFrames = 0
        // walk one LIST body [lo, hi): top level, hdrl, movi share shape
        def walk(lo: Int, hi: Int, depth: Int): Boolean = {
          if (depth > 4) return false // AVI nests 2 deep; deeper = hostile
          var off = lo
          while (off + 8 <= hi) {
            val id = tag(off)
            val len = u32(off + 4).toInt
            // compare in Long: off + 8 + len can wrap Int for a hostile
            // ~2^31 chunk length, sneaking past the guard into copyOfRange
            if (len < 0 || off.toLong + 8L + len > hi) return false // truncated/corrupt
            if (id == "LIST") {
              if (len < 4) return false
              val lt = tag(off + 8)
              if (lt == "hdrl" || lt == "movi" || lt == "strl")
                if (!walk(off + 12, off + 8 + len, depth + 1)) return false
            } else if (id == "avih" && len >= 40) {
              uspf = u32(off + 8)
              w = u32(off + 8 + 32).toInt
              h = u32(off + 8 + 36).toInt
            } else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db"))) {
              frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
              nFrames += 1
              if (nFrames > (1 << 20)) return false // runaway chunk storm
            }
            off += 8 + len + (len & 1) // chunks are word-aligned
          }
          true
        }
        if (!walk(12, bytes.length, 0)) return None
        val fs = frames.result()
        if (w > 0 && h > 0 && uspf > 0 && fs.nonEmpty) Some(AviVideo(w, h, uspf, fs))
        else None
      } catch { case _: IndexOutOfBoundsException => None }
    }

    /** How many frames [[videoSignals]] decodes at most — evenly-spaced
      * sample so cost per payload is bounded regardless of length. */
    val VideoSampleFrames = 8

    /** (width, height, duration_ms, features[dim]) for an MJPEG AVI:
      * f0 = aspect, f1 = mean frame luma, f2 = motion (mean |Δluma|
      * between successive sampled frames), f3 = luma stddev across
      * frames, f4.. = the sampled per-frame luma means in time order.
      * Per-frame luma accumulates in Longs (bit-deterministic); frames
      * that fail JPEG decode are skipped, and a payload with zero
      * decodable frames is None. */
    def videoSignals(bytes: Array[Byte], dim: Int = 16): Option[(Int, Int, Long, Array[Float])] =
      parseAviMjpeg(bytes).flatMap { v =>
        val n = v.frames.length
        val s = math.min(VideoSampleFrames, n)
        val lumas = (0 until s).iterator
          .map(j => v.frames(j * n / s))
          .flatMap(decodeImage(_))
          .map { img =>
            val fw = img.getWidth; val fh = img.getHeight
            var sy = 0L
            var y = 0
            while (y < fh) {
              var x = 0
              while (x < fw) {
                val rgb = img.getRGB(x, y)
                sy += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                  114 * (rgb & 0xff)) / 1000
                x += 1
              }
              y += 1
            }
            sy.toDouble / (fw.toLong * fh) / 255.0
          }
          .toVector
        if (lumas.isEmpty) None
        else {
          val mean = lumas.sum / lumas.length
          val motion =
            if (lumas.length < 2) 0.0
            else lumas.sliding(2).map(p => math.abs(p(1) - p(0))).sum / (lumas.length - 1)
          val sd = math.sqrt(lumas.map(l => (l - mean) * (l - mean)).sum / lumas.length)
          val f = new Array[Float](dim)
          f(0) = v.width.toFloat / v.height
          if (dim > 1) f(1) = mean.toFloat
          if (dim > 2) f(2) = motion.toFloat
          if (dim > 3) f(3) = sd.toFloat
          var i = 0
          while (i < lumas.length && 4 + i < dim) {
            f(4 + i) = lumas(i).toFloat; i += 1
          }
          Some((v.width, v.height, v.durationMs, f))
        }
      }

    def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    /** Deterministic synthetic MJPEG AVI: each frame is a seeded
      * xorshift pixel field under a gradient that PANS with the frame
      * index (so motion is real and the motion signal is exercised);
      * frames JPEG-encode through ImageIO (pure-Java writer — no
      * timestamps, equal pixels ⇒ equal bytes) and wrap in a minimal
      * spec-shaped RIFF: hdrl(avih + strl(strh'vids'/MJPG + strf
      * BITMAPINFOHEADER)) + movi('00dc'…) + idx1. */
    def synthAviMjpeg(seed: Long, w: Int, h: Int, nFrames: Int,
                      fps: Int = 8): Array[Byte] = {
      def u16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      def u32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def ascii(s: String) = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
        val pad = payload.length & 1
        ascii(id) ++ u32(payload.length.toLong) ++ payload ++ Array.fill[Byte](pad)(0)
      }
      def list(lt: String, payload: Array[Byte]): Array[Byte] =
        chunk("LIST", ascii(lt) ++ payload)

      val jpegs = (0 until nFrames).map { fIdx =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var s = (seed * 31 + fIdx) * 0x9E3779B97F4A7C15L + 1
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            s ^= s << 13; s ^= s >>> 7; s ^= s << 17
            // gradient origin pans right by 1/8 width per frame → motion
            val gx = (x + fIdx * w / 8) % w
            val r = ((s & 0xff) + 256 * gx / w) / 2
            val g = (((s >>> 8) & 0xff) + 256 * y / h) / 2
            val b = ((s >>> 16) & 0xff).toInt
            img.setRGB(x, y, (r.toInt << 16) | (g.toInt << 8) | b)
            x += 1
          }
          y += 1
        }
        encodeJpeg(img)
      }

      val uspf = 1000000L / fps
      val maxFrame = jpegs.map(_.length).max
      val avih = u32(uspf) ++ u32(0) ++ u32(0) ++ u32(0x10) ++
        u32(nFrames.toLong) ++ u32(0) ++ u32(1) ++ u32(maxFrame.toLong) ++
        u32(w.toLong) ++ u32(h.toLong) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0)
      val strh = ascii("vids") ++ ascii("MJPG") ++ u32(0) ++ u16(0) ++ u16(0) ++
        u32(0) ++ u32(1) ++ u32(fps.toLong) ++ u32(0) ++ u32(nFrames.toLong) ++
        u32(maxFrame.toLong) ++ u32(0xFFFFFFFFL) ++ u32(0) ++
        u16(0) ++ u16(0) ++ u16(w) ++ u16(h)
      val strf = u32(40) ++ u32(w.toLong) ++ u32(h.toLong) ++ u16(1) ++ u16(24) ++
        ascii("MJPG") ++ u32(w.toLong * h * 3) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0)
      val hdrl = list("hdrl",
        chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val moviChunks = jpegs.map(j => chunk("00dc", j))
      val movi = list("movi", moviChunks.flatten.toArray)
      // idx1: offsets are relative to the movi list's 'movi' tag position
      val idxEntries = {
        var off = 4L
        moviChunks.zip(jpegs).map { case (c, j) =>
          val e = ascii("00dc") ++ u32(0x10) ++ u32(off) ++ u32(j.length.toLong)
          off += c.length
          e
        }
      }
      val idx1 = chunk("idx1", idxEntries.flatten.toArray)
      val body = ascii("AVI ") ++ hdrl ++ movi ++ idx1
      ascii("RIFF") ++ u32(body.length.toLong) ++ body
    }
  }

  /** One decoded row per media item — REAL signals for every kind,
    * `decoded = false` (empty features) for corrupt or unsupported
    * payloads. */
  final case class MediaSignals(media_id: Long, kind: String, decoded: Boolean,
                                width: Int, height: Int, duration_ms: Long,
                                features: Array[Float])

  /** Batched REAL decode + feature extraction (mapPartitions batch
    * shape — decoder state would init once per partition). Dispatch by
    * kind: image → ImageIO, audio → WAV PCM parser, video → AVI walk +
    * per-frame MJPEG decode. */
  def mediaSignals(media: Dataset[Media], dim: Int = 16): Dataset[MediaSignals] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        m.kind match {
          case "image" => JdkCodec.imageSignals(m.bytes, dim) match {
            case Some((w, h, f)) => MediaSignals(m.media_id, m.kind, decoded = true, w, h, 0L, f)
            case None => MediaSignals(m.media_id, m.kind, decoded = false, 0, 0, 0L, Array.empty)
          }
          case "audio" => JdkCodec.wavSignals(m.bytes, dim) match {
            case Some((ms, f)) => MediaSignals(m.media_id, m.kind, decoded = true, 0, 0, ms, f)
            case None => MediaSignals(m.media_id, m.kind, decoded = false, 0, 0, 0L, Array.empty)
          }
          case _ => JdkCodec.videoSignals(m.bytes, dim) match {
            case Some((w, h, ms, f)) => MediaSignals(m.media_id, m.kind, decoded = true, w, h, ms, f)
            case None => MediaSignals(m.media_id, m.kind, decoded = false, 0, 0, 0L, Array.empty)
          }
        }
      }
    }
  }

  /** REAL frame sampling for video payloads: parse the AVI container and
    * emit up to `nFrames` evenly-spaced frames as standalone JPEG bytes
    * (each decodable by ImageIO on its own — MJPEG property). Corrupt or
    * non-video rows contribute no frames, never a task failure. */
  def sampleVideoFrames(media: Dataset[Media], nFrames: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      JdkCodec.parseAviMjpeg(m.bytes).toSeq.flatMap { v =>
        val n = v.frames.length
        val s = math.min(nFrames, n)
        (0 until s).map(j => Frame(m.media_id, j, v.frames(j * n / s)))
      }
    }
  }

  /** REAL pixel resize for image rows (nearest-neighbor, PNG out);
    * non-images and corrupt payloads pass through with resized = null.
    * Co-partitioned by media_id like [[resized]]. */
  def resizedImages(media: Dataset[Media], dstW: Int, dstH: Int,
                    partitions: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media.repartition(partitions, col("media_id"))
      .mapPartitions(_.map { m =>
        val out = if (m.kind == "image") JdkCodec.resizeImage(m.bytes, dstW, dstH)
                  else None
        (m.media_id, m.kind, out.orNull, m.bytes.length)
      })
      .toDF("media_id", "kind", "resized", "original_bytes")
  }

  /** Deterministic synthetic media with REAL payloads for all three
    * kinds (PNG via ImageIO, RIFF/WAVE PCM, RIFF/AVI MJPEG). */
  def syntheticMediaReal(spark: SparkSession, n: Long,
                         partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { id =>
      (id % 3) match {
        case 0 =>
          val w = 32 + (id % 4).toInt * 16
          val h = 32
          Media(id, "image", JdkCodec.synthPng(id, w, h),
            MediaMeta(w, h, 0L, "image/png"))
        case 1 =>
          val ms = 250 + (id % 8).toInt * 125
          Media(id, "audio", JdkCodec.synthWav(id, ms),
            MediaMeta(0, 0, ms.toLong, "audio/wav"))
        case _ =>
          val nf = 4 + (id % 4).toInt
          val fps = 8
          Media(id, "video", JdkCodec.synthAviMjpeg(id, 64, 36, nf, fps),
            MediaMeta(64, 36, nf * 1000L / fps, "video/x-msvideo"))
      }
    }
  }

  /** Deterministic synthetic media table (no codecs in the sandbox). */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[Media] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val size = 256 + (id % 7).toInt * 128
      val meta = kind match {
        case "image" => MediaMeta(64 + (id % 4).toInt * 32, 64, 0L, "image/png")
        case "audio" => MediaMeta(0, 0, 1000L + id % 9000, "audio/wav")
        case _       => MediaMeta(128, 72, 2000L + id % 30000, "video/mp4")
      }
      Media(id, kind, StubCodec.synthBytes(id, size), meta)
    }
  }

  /** Batched feature extraction: one partition = one batch stream
    * (mapPartitions — the mapInPandas shape; per-batch setup cost paid
    * once per partition, the contract a real model-codec needs). */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition (per-batch) init goes here in a real codec:
      // model load / decoder handle — paid once, not per row
      batch.map(m => MediaFeatures(m.media_id, m.kind,
        StubCodec.extractFeatures(m.bytes, dim)))
    }
  }

  /** Frame sampling for video payloads: one row per sampled frame. */
  def sampleFrames(media: Dataset[Media], nFrames: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      StubCodec.sampleFrames(m.bytes, nFrames).zipWithIndex.map {
        case (f, i) => Frame(m.media_id, i, f)
      }
    }
  }

  /** Resize pass co-partitioned by media_id (stable layout for a
    * downstream co-located join with features). */
  def resized(media: Dataset[Media], factor: Int = 4,
              partitions: Int = 8): DataFrame = {
    import media.sparkSession.implicits._
    media.repartition(partitions, col("media_id"))
      .mapPartitions(_.map(m =>
        (m.media_id, StubCodec.resize(m.bytes, factor).length,
          m.bytes.length)))
      .toDF("media_id", "resized_bytes", "original_bytes")
  }
}
