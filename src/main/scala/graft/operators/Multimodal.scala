package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize run batch-wise over partitions.
  *
  * Decode is REAL for image payloads the JDK can read: a payload whose
  * magic bytes say PNG/JPEG/GIF/BMP goes through `javax.imageio.ImageIO`
  * (zero extra dependencies) and yields true pixel dimensions / channel
  * count. Payloads without a recognized magic prefix — e.g. text cast to
  * binary in the oracle gate, or audio/video formats the JDK lacks —
  * fall back to [[DecodeStub.decode]], a deterministic fake, so the
  * plumbing stays testable without codec libraries.
  *
  * Scale notes: decode is the canonical CPU-heavy narrow transform. It
  * runs as `mapPartitions` (one iterator pass, no shuffle); upstream,
  * callers should `repartition` so one partition ≈ one task ≈ a few
  * hundred MB of payload — set via `spark.sql.files.maxPartitionBytes`
  * when reading real blob parquet.
  */
object Multimodal {

  /** Typed media metadata carried next to the binary payload. */
  final case class MediaMeta(
      width: Long, height: Long, channels: Long, nBytes: Long, format: String)

  final case class MediaRow(id: Long, content: Array[Byte])
  final case class DecodedRow(id: Long, width: Long, height: Long,
      channels: Long, nBytes: Long, format: String)

  /** Deterministic fake decode: "parses" dimensions from payload length.
    * Stands in for an image decoder; pure function of the bytes. */
  object DecodeStub {
    def decode(content: Array[Byte]): MediaMeta = {
      val n = content.length.toLong
      MediaMeta(
        width = n % 640L,
        height = (n * 7L) % 480L,
        channels = 3L,
        nBytes = n,
        format = if (n % 2L == 0L) "png" else "jpeg")
    }

    /** Fake resize: new meta, payload untouched (a real impl would
      * re-encode). */
    def resize(meta: MediaMeta, w: Long, h: Long): MediaMeta =
      meta.copy(width = w, height = h)

    /** Fake frame sampling for video payloads: frame offsets every
      * `stride` bytes — deterministic stand-in for keyframe extraction. */
    def sampleFrames(content: Array[Byte], stride: Int): Seq[Long] =
      content.indices.by(math.max(1, stride)).map(_.toLong)
  }

  /** Real image decode via the JDK's ImageIO. Recognizes a format from
    * the payload's magic bytes first (cheap, no codec probe for the text
    * payloads used in oracle gates), then decodes pixel dimensions and
    * channel count from the `BufferedImage`. Returns None when the magic
    * is unknown or the bytes are a corrupt/truncated image.
    */
  object ImageDecode {
    // the payloads are already byte arrays — without this, ImageIO wraps
    // every stream in a FileCacheImageInputStream that spills each image
    // to a java.io.tmpdir temp file (per-row disk write+delete in the
    // CPU-heavy decode hot path, and tmpdir churn across executors)
    javax.imageio.ImageIO.setUseCache(false)

    /** Max pixels accepted from a self-declared image header (guards
      * against decode bombs: a header declaring a huge canvas makes
      * ImageIO allocate the full pixel raster BEFORE any decode error
      * surfaces — and OutOfMemoryError is not a catchable decode
      * failure). Enforced for every container format: GIF/BMP during
      * sniff, PNG (IHDR) and JPEG (SOF) via [[declaredDims]] before
      * ImageIO is ever called — a genuine malicious PNG/JPEG payload
      * must not reach the allocator either. */
    val MaxHeaderPixels: Long = 64L * 1024 * 1024

    private def u16le(c: Array[Byte], i: Int): Int =
      (c(i) & 0xff) | ((c(i + 1) & 0xff) << 8)
    private def u32le(c: Array[Byte], i: Int): Long =
      (u16le(c, i).toLong) | (u16le(c, i + 2).toLong << 16)

    /** Container format sniffed from magic bytes, or None.
      *
      * "BM" and "GIF8" are printable ASCII, so ordinary TEXT cast to
      * binary (the oracle-gate path) can start with them ("BMW…", a doc
      * about "GIF89a…"). Those two formats therefore validate their
      * fixed-layout headers beyond the magic — declared file size must
      * equal the payload size for BMP; GIF needs the full 87a/89a
      * signature AND plausible logical-screen dimensions — so text
      * essentially never reaches ImageIO and headers that do parse
      * cannot declare unbounded canvases. */
    def sniffFormat(content: Array[Byte]): Option[String] = {
      def b(i: Int): Int = content(i) & 0xff
      if (content.length >= 8 && b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
          b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a)
        Some("png")
      else if (content.length >= 3 && b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff)
        Some("jpeg")
      else if (content.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a' && {
            val w = u16le(content, 6); val h = u16le(content, 8)
            w > 0 && h > 0 && w.toLong * h <= MaxHeaderPixels
          })
        Some("gif")
      else if (content.length >= 26 && b(0) == 'B' && b(1) == 'M' &&
          u32le(content, 2) == content.length.toLong &&
          u32le(content, 10) < content.length.toLong)
        Some("bmp")
      else None
    }

    private def u16be(c: Array[Byte], i: Int): Int =
      ((c(i) & 0xff) << 8) | (c(i + 1) & 0xff)
    private def u32be(c: Array[Byte], i: Int): Long =
      (u16be(c, i).toLong << 16) | u16be(c, i + 2).toLong

    /** Width×height the container header DECLARES, parsed without any
      * decoding library — what ImageIO would allocate a raster for.
      * None = the header does not parse far enough to know; treat as
      * unsafe (fall through to the stub) rather than hand unparseable
      * bytes to an allocator we cannot bound. */
    private[operators] def declaredDims(content: Array[Byte], fmt: String): Option[(Long, Long)] =
      fmt match {
        case "png" =>
          // magic(8) ++ IHDR chunk: len(4)=13, "IHDR"(4), width u32be @16,
          // height u32be @20 (PNG spec §11.2.2 — IHDR MUST be first)
          if (content.length >= 24 && content(12) == 'I' && content(13) == 'H' &&
              content(14) == 'D' && content(15) == 'R')
            Some((u32be(content, 16), u32be(content, 20)))
          else None
        case "jpeg" => jpegSofDims(content)
        case "gif" => // sniff already validated bounds; re-derive for uniformity
          Some((u16le(content, 6).toLong, u16le(content, 8).toLong))
        case "bmp" =>
          // The DIB header SIZE field @14 selects the layout: 12 = OS/2
          // BITMAPCOREHEADER (u16 width @18, u16 height @20, which Java's
          // BMP reader supports — reading i32 there would misparse valid
          // images into garbage dims); >= 40 = BITMAPINFOHEADER family
          // (i32 width @18, i32 height @22; height < 0 = top-down). The
          // sniff's size==payload check bounds the FILE, not the raster:
          // an RLE-compressed BMP can be tiny on disk yet declare a huge
          // canvas.
          if (content.length < 26) None
          else u32le(content, 14) match {
            case 12L =>
              Some((u16le(content, 18).toLong, u16le(content, 20).toLong))
            case sz if sz >= 40L =>
              val w = (u32le(content, 18) << 32) >> 32 // sign-extend i32
              val h = (u32le(content, 22) << 32) >> 32
              Some((w, math.abs(h)))
            case _ => None
          }
        case _ => None
      }

    /** Walk JPEG segments to the first SOFn (C0–CF minus C4/C8/CC) and
      * read its declared height/width (big-endian, after the 1-byte
      * precision field). Stops at SOS — scan data follows, a SOF can no
      * longer appear before the decoder would need one. */
    private def jpegSofDims(c: Array[Byte]): Option[(Long, Long)] = {
      var i = 2 // past FFD8
      while (i + 4 <= c.length) {
        if ((c(i) & 0xff) != 0xff) return None // desynced: not a marker
        var j = i
        while (j + 1 < c.length && (c(j + 1) & 0xff) == 0xff) j += 1 // fill bytes
        val marker = if (j + 1 < c.length) c(j + 1) & 0xff else return None
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) { i = j + 2 }
        else {
          if (j + 4 > c.length) return None
          val len = u16be(c, j + 2)
          if (len < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (j + 9 > c.length) return None
            return Some((u16be(c, j + 7).toLong, u16be(c, j + 5).toLong)) // (w, h)
          }
          if (marker == 0xda) return None // SOS before any SOF
          i = j + 2 + len
        }
      }
      None
    }

    /** True iff the header-declared raster is positive and within
      * [[MaxHeaderPixels]] — the precondition for calling ImageIO. */
    private def rasterBounded(content: Array[Byte], fmt: String): Boolean =
      declaredDims(content, fmt).exists { case (w, h) =>
        w > 0 && h > 0 && w * h <= MaxHeaderPixels
      }

    def decode(content: Array[Byte]): Option[MediaMeta] =
      safeDecode(content).map { case (fmt, img) =>
        MediaMeta(
          width = img.getWidth.toLong,
          height = img.getHeight.toLong,
          channels = img.getColorModel.getNumComponents.toLong,
          nBytes = content.length.toLong,
          format = fmt)
      }

    /** The guarded decode shared by [[decode]], [[resize]] and [[aHash]]:
      * sniff the magic, refuse unbounded declared rasters, hand to
      * ImageIO, reject null results, swallow decode errors. The
      * decode-bomb guard chain lives HERE ONCE — a hardening fix applies
      * to every image operator or to none. */
    private def safeDecode(content: Array[Byte]): Option[(String, java.awt.image.BufferedImage)] =
      sniffFormat(content).filter(rasterBounded(content, _)).flatMap { fmt =>
        try Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(content))).map(fmt -> _)
        catch { case scala.util.control.NonFatal(_) => None }
      }

    /** Bilinear rescale into a fresh image of the given type. */
    private def scaleInto(src: java.awt.image.BufferedImage,
        w: Int, h: Int, imageType: Int): java.awt.image.BufferedImage = {
      val dst = new java.awt.image.BufferedImage(w, h, imageType)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      dst
    }

    /** 64-bit average-hash (aHash) perceptual fingerprint: decode (same
      * sniff + raster-bound guards as [[decode]]), downscale to 8×8
      * grayscale with bilinear interpolation, threshold each cell at the
      * mean luminance — bit i set iff cell i is brighter than average.
      * Re-encodes, resizes, and small edits of the same picture land
      * within a few Hamming bits; unrelated pictures differ in ~32.
      * None when the payload isn't a decodable image. */
    def aHash(content: Array[Byte]): Option[Long] =
      safeDecode(content).flatMap { case (_, src) =>
        // post-decode work stays guarded too: an exotic decoded image can
        // still throw from the AWT scale path, and the operator contract
        // is "undecodable/unprocessable → None", never a task abort
        try {
          val small = scaleInto(src, 8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val px = new Array[Int](64)
          var i = 0
          while (i < 64) { px(i) = small.getRaster.getSample(i % 8, i / 8, 0); i += 1 }
          val mean = px.sum / 64.0
          var h = 0L
          i = 0
          while (i < 64) { if (px(i) > mean) h |= (1L << i); i += 1 }
          Some(h)
        } catch { case scala.util.control.NonFatal(_) => None }
      }

    /** Real resize: decode, scale with bilinear interpolation, re-encode
      * as PNG (lossless + deterministic — JPEG re-encoding bytes vary by
      * encoder build). None when the payload isn't a decodable image OR
      * the requested dims are unusable (w/h <= 0 — BufferedImage would
      * throw, and the contract is fall-through, not task abort). */
    def resize(content: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      safeDecode(content).flatMap { case (_, src) =>
        try {
          val dst = scaleInto(src, w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val bos = new java.io.ByteArrayOutputStream()
          if (javax.imageio.ImageIO.write(dst, "png", bos)) Some(bos.toByteArray)
          else None
        } catch { case scala.util.control.NonFatal(_) => None }
      }
  }

  /** Deterministic REAL PNG payloads synthesized per row, distributed
    * (one encode per row inside mapPartitions — the same narrow shape as
    * decode). Dimensions are a pure function of the id (width =
    * 1 + id % 16, height = 1 + id % 12) and pixels a pure function of
    * (id, x, y), so an external oracle can predict the decoded metadata
    * without decoding anything — the basis of the mm_decode_real /
    * mm_resize_real gates, which exercise the real ImageIO path on
    * corpora whose test data carries no binary column. */
  def synthesizePngs(df: DataFrame, idCol: String, groupEvery: Int = 1): DataFrame = {
    require(groupEvery >= 1, s"groupEvery must be >= 1 (got $groupEvery)")
    val ids = df.select(col(idCol).cast("long").as("id")).as(Encoders.scalaLong)
    ids.mapPartitions { it =>
      it.map { rowId =>
        // groupEvery > 1: content keys off the GROUP (id / groupEvery),
        // so consecutive ids carry byte-identical pictures — the basis of
        // the image-dedup gate, whose oracle predicts exactly which ids
        // collapse from arithmetic alone. Dims floor at 8×8 in that mode
        // (tiny uniform images all aHash to the same degenerate value,
        // which would create cross-group pairs no oracle can model).
        val id = rowId / groupEvery
        val w = if (groupEvery > 1) 8 + (id % 8).toInt else 1 + (id % 16).toInt
        val h = if (groupEvery > 1) 8 + (id % 4).toInt else 1 + (id % 12).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((id * 2654435761L + x * 31L + y * 7L) & 0xffffffL).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (rowId, bos.toByteArray)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)).toDF("id", "content")
  }

  final case class AHashRow(id: Long, ahash: Option[Long])

  /** Shared plumbing of every binary-column fingerprint: one narrow map
    * applying `fp` per payload (the decode cost IS the operator);
    * un-fingerprintable payloads → null. `fp` must be a serializable
    * pure function ([[ImageDecode.aHash]], [[WavDecode.energyFingerprint]]). */
  private def fingerprintFrame(df: DataFrame, idCol: String, binCol: String,
      outCol: String, fp: Array[Byte] => Option[Long]): DataFrame = {
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as(Encoders.product[MediaRow])
    ds.map { r =>
      val bytes = if (r.content == null) Array.emptyByteArray else r.content
      AHashRow(r.id, fp(bytes))
    }(Encoders.product[AHashRow]).toDF("id", outCol)
  }

  /** 64-bit fingerprints through the SAME banded Hamming machinery as
    * text SimHash dedup ([[Dedup.simhashPairsFromSigs]] — pigeonhole
    * chunk buckets, never all-pairs): a perceptual hash and a text
    * simhash have identical pairing geometry, so image, audio, and text
    * near-dup detection share one candidate engine. */
  private def fingerprintNearDupPairs(fps: DataFrame, fpCol: String,
      maxHamming: Int, chunks: Int, agreeChunks: Int): DataFrame =
    Dedup.simhashPairsFromSigs(
      fps.filter(col(fpCol).isNotNull).select(col("id"), col(fpCol).as("sh")),
      maxHamming, chunks, agreeChunks)

  /** Perceptual fingerprints for an image binary column: (id, ahash) via
    * [[ImageDecode.aHash]]; non-decodable payloads → null hash. */
  def withImageAHash(df: DataFrame, idCol: String, binCol: String): DataFrame =
    fingerprintFrame(df, idCol, binCol, "ahash", ImageDecode.aHash)

  /** Image near-duplicate pairs — the image member of the multimodal
    * dedup family: re-encoded/resized/lightly-edited copies of one
    * picture collapse; undecodable payloads never pair. `maxHamming` ≤
    * chunks−agreeChunks (defaults ride the corpus-sized Auto banding;
    * pass chunks/agreeChunks for a wider radius). */
  def imageNearDupPairs(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 3, chunks: Int = Dedup.Auto,
      agreeChunks: Int = Dedup.Auto): DataFrame =
    fingerprintNearDupPairs(withImageAHash(df, idCol, binCol), "ahash",
      maxHamming, chunks, agreeChunks)

  /** Corpus with near-duplicate images removed (deterministic min-id
    * representative per duplicate group, like the text dedup family). */
  def imageDedup(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 3): DataFrame =
    Dedup.dropNearDuplicates(df, idCol,
      imageNearDupPairs(df, idCol, binCol, maxHamming))

  /** Decode a (id, content: binary) frame into typed metadata, batch-wise
    * per partition. Input columns: `idCol` (long), `binCol` (binary).
    * Real ImageIO decode when the payload is a recognizable image;
    * deterministic stub otherwise (see object Scaladoc). */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): Dataset[DecodedRow] = {
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as(Encoders.product[MediaRow])
    ds.mapPartitions { it =>
      it.map { r =>
        // NULL payload → empty payload: the stub path, not an NPE that
        // aborts the task (the contract is "undecodable passes through")
        val bytes = if (r.content == null) Array.emptyByteArray else r.content
        val m = ImageDecode.decode(bytes).getOrElse(DecodeStub.decode(bytes))
        DecodedRow(r.id, m.width, m.height, m.channels, m.nBytes, m.format)
      }
    }(Encoders.product[DecodedRow])
  }

  final case class ResizedRow(id: Long, content: Array[Byte], width: Long,
      height: Long, format: String)

  /** Resize an image binary column to w×h, batch-wise per partition —
    * the canonical decode→transform→re-encode narrow stage. Real images
    * are bilinear-scaled and re-encoded as PNG; payloads that aren't
    * decodable images pass through UNCHANGED with stub-resized metadata
    * (same fallback contract as [[decodeImages]]). */
  def resizeImages(df: DataFrame, idCol: String, binCol: String,
      w: Int, h: Int): Dataset[ResizedRow] = {
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as(Encoders.product[MediaRow])
    ds.mapPartitions { it =>
      it.map { r =>
        val payload = if (r.content == null) Array.emptyByteArray else r.content
        ImageDecode.resize(payload, w, h) match {
          case Some(bytes) => ResizedRow(r.id, bytes, w.toLong, h.toLong, "png")
          case None =>
            val m = DecodeStub.resize(DecodeStub.decode(payload), w.toLong, h.toLong)
            ResizedRow(r.id, payload, m.width, m.height, m.format)
        }
      }
    }(Encoders.product[ResizedRow])
  }

  /** Frame-sample a video-ish binary column: one output row per sampled
    * frame offset. */
  def sampleFrameOffsets(df: DataFrame, idCol: String, binCol: String,
      stride: Int): DataFrame = {
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as(Encoders.product[MediaRow])
    ds.flatMap { r =>
      DecodeStub.sampleFrames(r.content, stride).map(off => (r.id, off))
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .toDF("id", "frame_offset")
  }

  // ---- audio (RIFF/WAVE — real header parse, JVM-only) -----------------

  /** Parsed PCM WAV parameters: (sampleRate, channels, bitsPerSample,
    * dataBytes). */
  object WavDecode {
    private def u16le(c: Array[Byte], i: Int): Int =
      (c(i) & 0xff) | ((c(i + 1) & 0xff) << 8)
    private def u32le(c: Array[Byte], i: Int): Long =
      u16le(c, i).toLong | (u16le(c, i + 2).toLong << 16)
    private def tag(c: Array[Byte], i: Int): String =
      new String(c, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Walk RIFF chunks for `fmt ` (PCM layout) + `data`. None unless
      * the container is well-formed AND parameters are sane — text or
      * junk bytes must fall through to the stub path, and a hostile
      * header cannot declare absurd rates/widths (nothing here
      * allocates, but derived durations feed downstream windowing). */
    def parse(c: Array[Byte]): Option[(Long, Long, Long, Long)] =
      parseFull(c).map { case (rate, ch, bits, dataLen, _) => (rate, ch, bits, dataLen) }

    /** [[parse]] plus the byte OFFSET of the (first) data chunk's
      * payload — the single source of truth for where samples live, so
      * consumers never re-walk the chunks (a second walk could disagree
      * with this one on multi-data-chunk files). */
    private[operators] def parseFull(c: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
      if (c == null || c.length < 44) return None
      if (tag(c, 0) != "RIFF" || tag(c, 8) != "WAVE") return None
      // LONG cursor + unsigned-Long sizes end-to-end: a hostile size
      // near 2^32 must neither spin the loop (Int truncation making the
      // advance zero/negative) nor index out of bounds (Int overflow of
      // the cursor). With Long arithmetic an oversized advance simply
      // fails the loop bound and parsing returns what was found — the
      // stub-fallback contract for hostile headers. A legitimately
      // TRUNCATED file (declared data > payload) still parses: the data
      // length clamps to the bytes actually present.
      var i = 12L
      var fmt: Option[(Long, Long, Long)] = None
      var dataLen: Option[Long] = None
      var dataOff = 0L
      while (i + 8 <= c.length && (fmt.isEmpty || dataLen.isEmpty)) {
        val at = i.toInt // safe: i + 8 <= length <= Int.MaxValue here
        val id = tag(c, at)
        val size = u32le(c, at + 4) // unsigned 32-bit
        // size == 0 is LEGAL (empty LIST/data chunks occur in real
        // files); the cursor still advances 8 header bytes, so progress
        // is guaranteed without a special case. u32le is unsigned — a
        // negative size cannot occur.
        if (id == "fmt " && size >= 16 && i + 8 + 16 <= c.length) {
          val audioFormat = u16le(c, at + 8)
          val channels = u16le(c, at + 10).toLong
          val rate = u32le(c, at + 12)
          val bits = u16le(c, at + 22).toLong
          val sane = audioFormat == 1 && channels >= 1 && channels <= 64 &&
            rate >= 1000 && rate <= 1000000 && (bits == 8 || bits == 16 || bits == 24 || bits == 32)
          if (!sane) return None
          fmt = Some((rate, channels, bits))
        } else if (id == "data" && dataLen.isEmpty) {
          // FIRST data chunk wins (RIFF allows several; readers play the
          // first) — and declared size may exceed the actual payload on a
          // truncated file, so clamp to what is really present
          dataLen = Some(math.min(size, c.length - i - 8))
          dataOff = i + 8
        }
        i += 8L + size + (size & 1L) // chunks are even-padded
      }
      for ((rate, ch, bits) <- fmt; d <- dataLen)
        yield (rate, ch, bits, d, dataOff)
    }

    /** 64-bit energy-profile fingerprint of a PCM WAV (the audio analog
      * of [[ImageDecode.aHash]]): the data chunk splits into 64 equal
      * sample windows; bit w is set iff window w's mean absolute
      * amplitude exceeds the overall mean. Re-containered and
      * identically-resampled copies land within a few Hamming bits;
      * unrelated recordings differ in ~32. 8-bit PCM is unsigned
      * (centered at 128), wider widths signed little-endian — only the
      * first byte group per frame is read (channel 0 for multichannel).
      * None for non-WAV payloads or empty data. */
    def energyFingerprint(c: Array[Byte]): Option[Long] =
      parseFull(c).flatMap { case (_, ch, bits, dataLen, dataOff) =>
        val bytesPer = (bits / 8).toInt
        val frame = ch.toInt * bytesPer
        val n = if (frame > 0) (dataLen / frame).toInt else 0
        if (n < 64) None
        else {
          val energies = new Array[Double](64)
          var w = 0
          while (w < 64) {
            val from = (n.toLong * w / 64).toInt
            val until = (n.toLong * (w + 1) / 64).toInt
            var s = 0.0
            var j = from
            while (j < until) {
              val base = dataOff.toInt + j * frame // channel 0 of the frame
              // amplitude lives in the HIGH bytes of a little-endian PCM
              // sample: for 16/24/32-bit read the top two bytes as s16
              // (the low bytes are fine detail — fingerprinting them
              // would hash noise, not loudness); 8-bit is unsigned
              val amp =
                if (bytesPer == 1) math.abs((c(base) & 0xff) - 128)
                else {
                  val hi = base + bytesPer - 2
                  math.abs(((c(hi) & 0xff) | (c(hi + 1) << 8)).toShort.toInt)
                }
              s += amp
              j += 1
            }
            energies(w) = if (until > from) s / (until - from) else 0.0
            w += 1
          }
          val mean = energies.sum / 64.0
          var h = 0L
          w = 0
          while (w < 64) { if (energies(w) > mean) h |= (1L << w); w += 1 }
          Some(h)
        }
      }
  }

  /** Audio fingerprints for a binary column: (id, afp) via
    * [[WavDecode.energyFingerprint]]; non-WAV payloads → null. */
  def withAudioFingerprint(df: DataFrame, idCol: String, binCol: String): DataFrame =
    fingerprintFrame(df, idCol, binCol, "afp", WavDecode.energyFingerprint)

  /** Audio near-duplicate pairs — the audio member of the multimodal
    * dedup family, sharing the banded-Hamming machinery with text
    * SimHash and image aHash dedup. */
  def audioNearDupPairs(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 3, chunks: Int = Dedup.Auto,
      agreeChunks: Int = Dedup.Auto): DataFrame =
    fingerprintNearDupPairs(withAudioFingerprint(df, idCol, binCol), "afp",
      maxHamming, chunks, agreeChunks)

  /** Corpus with near-duplicate audio removed (min-id representative). */
  def audioDedup(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 3): DataFrame =
    Dedup.dropNearDuplicates(df, idCol,
      audioNearDupPairs(df, idCol, binCol, maxHamming))

  final case class AudioMetaRow(id: Long, sample_rate: Long, channels: Long,
      bits_per_sample: Long, n_samples: Long, duration_ms: Long, format: String)

  /** Typed audio metadata from a binary column: REAL RIFF/WAVE parse
    * (pure JVM byte walking, no external codec) when the payload is a
    * well-formed PCM WAV; the deterministic stub otherwise — same
    * fallback contract as [[decodeImages]]. Narrow map stage. */
  def audioMeta(df: DataFrame, idCol: String, binCol: String): Dataset[AudioMetaRow] = {
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as(Encoders.product[MediaRow])
    ds.map { r =>
      WavDecode.parse(r.content) match {
        case Some((rate, ch, bits, dataLen)) =>
          val frame = ch * bits / 8
          val n = if (frame > 0) dataLen / frame else 0L
          AudioMetaRow(r.id, rate, ch, bits, n,
            if (rate > 0) n * 1000L / rate else 0L, "wav")
        case None =>
          val m = DecodeStub.decode(
            if (r.content == null) Array.emptyByteArray else r.content)
          AudioMetaRow(r.id, 0L, 0L, 0L, m.nBytes, 0L, m.format)
      }
    }(Encoders.product[AudioMetaRow])
  }

  /** Time-window chunking over an audio binary column (the audio analog
    * of document chunking): one row per `windowMs` window with `strideMs`
    * hop, covering the parsed duration; the final window may be short.
    * Non-WAV payloads produce no rows. */
  def chunkAudioWindows(df: DataFrame, idCol: String, binCol: String,
      windowMs: Long, strideMs: Long): DataFrame = {
    require(windowMs > 0 && strideMs > 0 && strideMs <= windowMs,
      s"need 0 < strideMs <= windowMs, got windowMs=$windowMs strideMs=$strideMs")
    val ds = df.select(col(idCol).cast("long").as("id"), col(binCol).as("content"))
      .as(Encoders.product[MediaRow])
    ds.flatMap { r =>
      WavDecode.parse(r.content).iterator.flatMap { case (rate, ch, bits, dataLen) =>
        val frame = ch * bits / 8
        val n = if (frame > 0) dataLen / frame else 0L
        val durMs = if (rate > 0) n * 1000L / rate else 0L
        if (durMs == 0) Iterator.empty
        else {
          // iterator, not a materialized Seq: a multi-GB low-rate WAV
          // yields tens of millions of windows — they must stream into
          // Spark's consumer, not sit in one giant in-memory collection.
          // nChunks stays Long: at the extreme corner (~2 GiB 8-bit
          // 1 kHz payload, strideMs=1) durMs approaches Int.MaxValue and
          // an Int count could overflow negative, silently yielding ZERO
          // windows. chunk_id itself is Int in the output schema, so a
          // count past Int.MaxValue fails loudly instead of wrapping.
          val nChunks: Long = (durMs - 1) / strideMs + 1
          require(nChunks <= Int.MaxValue,
            s"audio id=${r.id}: $nChunks windows exceed chunk_id's Int range — use a larger strideMs")
          (0L until nChunks).iterator.map { ci =>
            val start = ci * strideMs
            (r.id, ci.toInt, start, math.min(start + windowMs, durMs))
          }
        }
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
        Encoders.scalaLong, Encoders.scalaLong))
      .toDF("id", "chunk_id", "start_ms", "end_ms")
  }

  /** RIFF/PCM WAV assembly — the ONE place that knows the byte layout
    * (used by [[synthesizeWavs]] and, with deliberately insane
    * parameters, by the hostile-header tests). */
  private[graft] def wavBytes(channels: Int, rate: Int, bits: Int,
      data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val blockAlign = channels * bits / 8
    bos.write("RIFF".getBytes); bos.write(le32(36 + data.length))
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); bos.write(le32(16))
    bos.write(le16(1)); bos.write(le16(channels))
    bos.write(le32(rate)); bos.write(le32(rate * math.max(blockAlign, 1)))
    bos.write(le16(blockAlign)); bos.write(le16(bits))
    bos.write("data".getBytes); bos.write(le32(data.length))
    bos.write(data)
    bos.toByteArray
  }

  /** Deterministic tiny PCM WAVs from an id column (test/gate input —
    * the audio analog of [[synthesizePngs]]): 8-bit mono, sample rate
    * 8000, (id % 5 + 1) × 100 ms of a simple id-seeded waveform. */
  def synthesizeWavs(df: DataFrame, idCol: String, groupEvery: Int = 1): DataFrame = {
    require(groupEvery >= 1, s"groupEvery must be >= 1 (got $groupEvery)")
    val ds = df.select(col(idCol).cast("long").as("id")).as(Encoders.scalaLong)
    ds.map { rowId =>
      val id = rowId / groupEvery
      val data =
        if (groupEvery == 1) {
          val nSamples = ((id % 5) + 1).toInt * 800 // 100ms steps at 8kHz
          Array.tabulate(nSamples)(i => ((id * 31 + i * 7) % 256 - 128).toByte)
        } else {
          // group-keyed ENERGY-PROFILE content for the audio-dedup gate:
          // 64 windows of 100 samples whose loudness encodes the bits of
          // splitmix(group) — consecutive ids carry byte-identical audio
          // with a fingerprint distinct across groups (the raw
          // (id*31+i*7) ramp has near-uniform energy in EVERY window, so
          // all groups would fingerprint to the same degenerate value)
          var z = id + 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          val pattern = z ^ (z >>> 31)
          Array.tabulate(6400) { i =>
            val w = i / 100
            val loud = ((pattern >>> w) & 1L) == 1L
            val span = if (loud) 193 else 17 // ±96 vs ±8 around center 128
            val amp = ((id * 31 + i * 7) % span).toInt - span / 2
            (128 + amp).toByte // 8-bit PCM is unsigned, centered at 128
          }
        }
      (rowId, wavBytes(channels = 1, rate = 8000, bits = 8, data))
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)).toDF("id", "content")
  }
}
