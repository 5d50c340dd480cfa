package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary`
  * columns with typed metadata, per the training-data-pipeline brief.
  *
  * The reference's nearest analog is the attachment path: binary files
  * are read whole (`src/signal/upload_attachments.rs:6-43`), mime-
  * sniffed, and written to an attachments dir
  * (`src/signal/process_incoming_message.rs:46-83`). Here the Spark
  * plumbing — `binaryFile` source, schema, partition-parallel decode —
  * is real, and so are the IMAGE codec path (PNG/JPEG/GIF via the
  * JDK's `javax.imageio`) and the AUDIO path — PCM and G.711
  * μ-law/A-law WAVs via the JDK's `javax.sound.sampled`, plus a
  * from-spec IMA ADPCM decoder ([[imaAdpcmPcm]]) for the 4-bit
  * compressed WAVs the JDK lacks — all offline, no external library.
  * For mp3/mp4 the CONTAINER METADATA parse is also real (frame/box
  * headers are pure integer arithmetic — [[containerInfo]]); mp3/mp4
  * SAMPLE decode is an EXPLICIT out-of-scope decision (r12, SURVEY
  * §8): a from-spec Layer III decoder is a conformance-tested DSP
  * chain whose planted-tone oracle would require writing a full
  * encoder — the check would test this repo's code against its own
  * inverse, not the spec, and the only closed-form frame (silence)
  * cannot discriminate a real chain from the labeled fake below.
  * Production callers plug a codec library into the same
  * `fakeDecode` fallback slot; every other line stays unchanged.
  */
object Multimodal {

  /** Typed metadata for a decoded media asset. */
  case class MediaMeta(path: String, mime: String, bytes: Long,
      width: Int, height: Int, nFrames: Int)

  /** Decoded feature row: metadata + a fixed-dim feature vector. */
  case class MediaFeatures(path: String, mime: String, bytes: Long,
      features: Array[Float])

  /** `binaryFile` source — columns (path, modificationTime, length,
    * content). The Spark-native replacement for the reference's
    * std::fs::read loop (S7). */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** Mime guess from extension — the reference's mime_guess with the
    * `application/octet-stream` fallback
    * (`src/signal/process_incoming_message.rs:53-59`). */
  def mimeFromPath(pathCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val ext = lower(regexp_extract(pathCol, "\\.([A-Za-z0-9]+)$", 1))
    val m = typedlit(Map(
      "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg", "png" -> "image/png",
      "gif" -> "image/gif", "mp3" -> "audio/mpeg", "wav" -> "audio/wav",
      "flac" -> "audio/flac", "mp4" -> "video/mp4", "txt" -> "text/plain"))
    coalesce(element_at(m, ext), lit("application/octet-stream"))
  }

  /** Content-based mime sniff from magic bytes — the reference sniffs
    * the content type rather than trusting the filename
    * (`src/signal/process_incoming_message.rs:53-59`). Covers the
    * common image/audio/video/container signatures; `None` → caller
    * falls back to the extension guess / octet-stream. */
  private[graft] def sniffMime(content: Array[Byte]): Option[String] = {
    def at(i: Int): Int = if (i < content.length) content(i) & 0xff else -1
    def ascii(off: Int, s: String): Boolean =
      s.indices.forall(i => at(off + i) == s.charAt(i).toInt)
    if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) Some("image/jpeg")
    else if (at(0) == 0x89 && ascii(1, "PNG")) Some("image/png")
    else if (ascii(0, "GIF8")) Some("image/gif")
    else if (ascii(0, "ID3") || (at(0) == 0xff && (at(1) & 0xe0) == 0xe0)) Some("audio/mpeg")
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) Some("audio/wav")
    else if (ascii(0, "fLaC")) Some("audio/flac")
    else if (ascii(4, "ftyp")) Some("video/mp4")
    else if (ascii(0, "%PDF")) Some("application/pdf")
    else if (ascii(0, "PK")) Some("application/zip")
    else if (ascii(0, "PAR1")) Some("application/vnd.apache.parquet")
    else None
  }

  // ------------------------------------------------------------------
  // STUB (compressed audio/video mimes only — mp3/mp4): deterministic
  // fake decode. Those codecs need a library this container lacks
  // (e.g. javacpp ffmpeg) — the signature, batching shape, and
  // partition parallelism stay the same. The fake derives "features"
  // from content bytes so tests exercise real data flow end-to-end
  // deterministically. Images, WAV audio, and animated-GIF frames
  // decode for REAL below.
  // ------------------------------------------------------------------
  private[graft] def fakeDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      out(i % dim) += (content(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** `side`×`side` box-filtered grayscale thumbnail of a decoded raster
    * in [0,1] — each cell averages the Rec.601 luminance of its source
    * block; deterministic for a given raster. Shared by single images
    * ([[imageFeatures]]) and per-frame GIF sampling ([[sampleFrames]]). */
  private[graft] def imageThumb(im: java.awt.image.BufferedImage, side: Int): Array[Float] =
    imageThumbGrid(im, side, side)

  /** Rectangular generalization of the box-filtered grayscale
    * thumbnail (dHash wants a (side+1)×side grid); `imageThumb`
    * delegates here so the q51 pinned features are arithmetic-
    * identical to the pre-refactor path. */
  private[graft] def imageThumbGrid(im: java.awt.image.BufferedImage,
      gw: Int, gh: Int): Array[Float] = {
    val w = im.getWidth
    val h = im.getHeight
    val out = new Array[Float](gw * gh)
    var cy = 0
    while (cy < gh) {
      var cx = 0
      while (cx < gw) {
        val x0 = cx * w / gw
        val x1 = math.max(x0 + 1, (cx + 1) * w / gw)
        val y0 = cy * h / gh
        val y1 = math.max(y0 + 1, (cy + 1) * h / gh)
        var sum = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = im.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        out(cy * gw + cx) = (sum / ((x1 - x0) * (y1 - y0) * 255.0)).toFloat
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** 64-bit difference hash over a 9×8 grid: bit r·8+c set iff
    * grid(r,c) > grid(r,c+1) (strict — float ties land on the same
    * side in any IEEE-identical replica). */
  private[graft] def dHashBits(g: Array[Float], gw: Int, gh: Int): Long = {
    var bits = 0L
    var r = 0
    while (r < gh) {
      var c = 0
      while (c < gw - 1) {
        if (g(r * gw + c) > g(r * gw + c + 1)) bits |= 1L << (r * (gw - 1) + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Perceptual difference hash of an image (dHash: decode → 9×8
    * box-filtered grayscale grid → 64 horizontal-gradient sign bits) —
    * THE cheap image-dedup signature (near-identical images differ in
    * a few bits; crops/recompressions survive the box filter). Real
    * decode via `javax.imageio` (PNG/JPEG/GIF/BMP, offline in the
    * JDK); `None` on undecodable bytes. */
  def imageDHash(content: Array[Byte]): Option[Long] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
      catch { case _: Exception => None }
    img.filter(im => im.getWidth > 0 && im.getHeight > 0)
      .map(im => dHashBits(imageThumbGrid(im, 9, 8), 9, 8))
  }

  /** 6-dp-lifted 32-point DCT-II basis weights for frequencies 0..7,
    * read from the CHECKED-IN resource (`graft/phash_weights.json`)
    * that the Python replica reads too — one source of truth, so no
    * libm `cos` (not correctly-rounded on either runtime) ever enters
    * the cross-runtime comparison. */
  private lazy val phashW: Array[Array[Long]] = {
    val in = getClass.getResourceAsStream("/graft/phash_weights.json")
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val flat = txt.substring(txt.indexOf('[') + 1, txt.indexOf(']'))
      .split(",").map(_.trim.toLong)
    require(flat.length == 256, s"phash_weights: ${flat.length}")
    Array.tabulate(8, 32)((u, x) => flat(u * 32 + x))
  }

  /** DCT-based perceptual hash bits over a 32×32 grayscale grid —
    * pHash, the dHash sibling that survives global brightness/contrast
    * shifts (gradient signs do not): the 8×8 low-frequency corner of a
    * 2-D DCT-II, each bit = coefficient > the lower median of all 64.
    * EXACT integer arithmetic end to end: float32 cells lift to 1e6
    * longs (Java `Math.round` — the replica replays `floor(x+0.5)`),
    * the separable DCT uses the checked-in 6-dp weight table with a
    * deterministic `floorDiv 1000` rescale between the two passes
    * (keeps every sum under 2^60; floorDiv == Python `//` on
    * negatives), and the median is an exact selection — so the hash is
    * bit-identical across runtimes by construction, no float DCT to
    * replicate. */
  private[graft] def phashBits(g: Array[Float]): Long = {
    require(g.length == 1024, s"phash grid: ${g.length}")
    val L = new Array[Long](1024)
    var i = 0
    while (i < 1024) {
      L(i) = Math.round(g(i).toDouble * 1e6); i += 1
    }
    val mid = Array.ofDim[Long](8, 32) // (u, y)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 32) {
        var s = 0L
        var x = 0
        while (x < 32) { s += phashW(u)(x) * L(y * 32 + x); x += 1 }
        mid(u)(y) = Math.floorDiv(s, 1000L)
        y += 1
      }
      u += 1
    }
    val f = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var y = 0
        while (y < 32) { s += phashW(v)(y) * mid(u)(y); y += 1 }
        f(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val med = f.sorted.apply(31) // lower median of the 64
    var bits = 0L
    i = 0
    while (i < 64) {
      if (f(i) > med) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Perceptual DCT hash of an image (pHash: decode → 32×32
    * box-filtered grayscale grid → exact-integer 2-D DCT → 64
    * low-frequency median-sign bits). Real decode via `javax.imageio`;
    * `None` on undecodable bytes. See [[phashBits]] for the
    * determinism contract. */
  def imagePHash(content: Array[Byte]): Option[Long] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
      catch { case _: Exception => None }
    img.filter(im => im.getWidth > 0 && im.getHeight > 0)
      .map(im => phashBits(imageThumbGrid(im, 32, 32)))
  }

  /** (path, phash) for every DECODABLE image in a binary frame — the
    * pHash twin of [[imageHashes]]. */
  def imagePHashes(spark: SparkSession, binaries: DataFrame): DataFrame = {
    import spark.implicits._
    binaries.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, c) =>
        imagePHash(c).map(h => (p, h))
      })
      .toDF("path", "phash")
  }

  /** (path, dhash) for every DECODABLE image in a binary frame —
    * undecodable rows drop (count them upstream via the mime sniff if
    * the drop rate matters). Per-partition typed map, no UDFs. */
  def imageHashes(spark: SparkSession, binaries: DataFrame): DataFrame = {
    import spark.implicits._
    binaries.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, c) =>
        imageDHash(c).map(h => (p, h))
      })
      .toDF("path", "dhash")
  }

  /** Near-duplicate image pairs by dHash hamming distance — the
    * multimodal member of the dedup family: the 64-bit perceptual
    * signature rides the SAME banded self-join machinery as SimHash
    * text dedup (4×16-bit bands, verify-before-dedup, the optional
    * hot-bucket block decomposition), so every scale lesson measured
    * there applies unchanged. Candidate recall is pigeonhole-complete
    * for `maxHamming` ≤ 3 (3 differing bits cannot touch all four
    * bands) — the same contract as `Dedup.simhashNearDups`.
    * Returns (id_a, id_b, hamming) with id_a < id_b (path order). */
  def imageNearDups(spark: SparkSession, binaries: DataFrame,
      maxHamming: Int = 3, selfJoinBlocks: Int = 1): DataFrame = {
    val sigs = imageHashes(spark, binaries)
      .select(col("path").as("doc"), col("dhash").as("sig"))
    graft.operators.Dedup.simhashBandPairs(sigs, maxHamming, selfJoinBlocks)
  }

  /** Perceptual audio fingerprint — the dHash analogue for sound: a
    * 65-bucket RMS loudness envelope (REAL decode via
    * `javax.sound.sampled`, the q76 path: PCM, G.711 μ-law/A-law, IMA
    * ADPCM) reduced to 64 envelope-delta sign bits (bit c set iff
    * bucket c is strictly louder than bucket c+1). Robust to gain-
    * preserving re-encodes the way dHash is robust to resizes; `None`
    * on undecodable bytes. */
  def audioFingerprint(content: Array[Byte]): Option[Long] =
    audioFeatures(content, 65).map(env => dHashBits(env, 65, 1))

  /** (path, afp) for every decodable audio binary — the audio twin of
    * [[imageHashes]]. */
  def audioHashes(spark: SparkSession, binaries: DataFrame): DataFrame = {
    import spark.implicits._
    binaries.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, c) =>
        audioFingerprint(c).map(h => (p, h))
      })
      .toDF("path", "afp")
  }

  /** Near-duplicate audio pairs by fingerprint hamming — the audio
    * member of the dedup family, completing the modality set (text
    * SimHash/MinHash, image dHash, audio envelope bits) on the SAME
    * banded self-join machinery and the same pigeonhole contract
    * (complete at `maxHamming` ≤ 3). */
  def audioNearDups(spark: SparkSession, binaries: DataFrame,
      maxHamming: Int = 3, selfJoinBlocks: Int = 1): DataFrame = {
    val sigs = audioHashes(spark, binaries)
      .select(col("path").as("doc"), col("afp").as("sig"))
    graft.operators.Dedup.simhashBandPairs(sigs, maxHamming, selfJoinBlocks)
  }

  /** REAL image decode (PNG/JPEG/GIF via `javax.imageio` — offline, in
    * the JDK): an `side`×`side` box-filtered grayscale thumbnail in
    * [0,1], the classic cheap perceptual feature (and the first stage
    * of a pHash). `None` on undecodable/corrupt bytes → caller falls
    * back to the stub. */
  private[graft] def imageFeatures(content: Array[Byte], side: Int = 8): Option[Array[Float]] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
      catch { case _: Exception => None }
    img.filter(im => im.getWidth > 0 && im.getHeight > 0).map(imageThumb(_, side))
  }

  /** REAL multi-frame decode for animated GIF (the one genuinely
    * multi-frame format `javax.imageio` reads offline): every frame as
    * its own raster, in stream order. Frames are returned as stored —
    * a GIF frame may legally be a sub-rectangle patch; features over
    * raw frames stay deterministic either way. `None` on undecodable
    * bytes or a reader-less JVM → caller falls back to the stub. */
  private[graft] def gifFrames(content: Array[Byte]): Option[IndexedSeq[java.awt.image.BufferedImage]] =
    try {
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          reader.setInput(iis, false)
          val n = reader.getNumImages(true)
          if (n <= 0) None else Some((0 until n).map(reader.read))
        } finally { reader.dispose(); iis.close() }
      }
    } catch { case _: Exception => None }

  /** REAL audio decode (WAV/PCM via `javax.sound.sampled` — offline, in
    * the JDK, same playbook as the r7 `javax.imageio` image path): a
    * `buckets`-point RMS loudness envelope in [0,1]. The stream is
    * converted to signed 16-bit PCM, channels are mixed to mono per
    * frame, frames are assigned to `buckets` equal time slices, and
    * each output is the slice's RMS normalized by full scale — the
    * standard cheap audio fingerprint (silence→0, full-scale→~1).
    * `None` on undecodable bytes (mp3/mp4 need codecs this container
    * lacks) → caller falls back to the stub. */
  private[graft] def audioFeatures(content: Array[Byte], buckets: Int = 16): Option[Array[Float]] =
    jdkPcm(content).orElse(imaAdpcmPcm(content)).orElse(Flac.pcm16(content))
      .flatMap { case (bytes, ch) => rmsEnvelope(bytes, ch, buckets) }

  /** PCM via the JDK (`javax.sound.sampled`): covers PCM WAVs and —
    * through the JDK's bundled G.711 `FormatConversionProvider`s —
    * μ-law/A-law compressed WAVs (format tags 6/7). Returns 16-bit LE
    * interleaved bytes + channel count; `None` on anything the JDK
    * can't open or convert (mp3/mp4, IMA ADPCM). */
  private def jdkPcm(content: Array[Byte]): Option[(Array[Byte], Int)] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
      try {
        val src = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
          src.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, in)
        Some((pcm.readAllBytes(), target.getChannels))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  private def rmsEnvelope(bytes: Array[Byte], ch: Int, buckets: Int): Option[Array[Float]] = {
    val nFrames = bytes.length / (2 * ch)
    if (nFrames <= 0) None
    else {
      val sumSq = new Array[Double](buckets)
      val counts = new Array[Long](buckets)
      var f = 0
      while (f < nFrames) {
        var mono = 0.0
        var c = 0
        while (c < ch) {
          val off = (f * ch + c) * 2
          val s = ((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort
          mono += s.toDouble
          c += 1
        }
        mono /= ch
        val b = (f.toLong * buckets / nFrames).toInt
        sumSq(b) += mono * mono
        counts(b) += 1
        f += 1
      }
      val out = new Array[Float](buckets)
      var b = 0
      while (b < buckets) {
        out(b) =
          if (counts(b) == 0) 0.0f
          else (math.sqrt(sumSq(b) / counts(b)) / 32768.0).toFloat
        b += 1
      }
      Some(out)
    }
  }

  // IMA ADPCM tables from the published IMA Digital Audio spec
  // (IMA Recommended Practices for Enhancing Digital Audio
  // Compatibility, rev 3.00, 1992) — the same constants every
  // interoperable decoder ships.
  private val AdpcmSteps: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)
  private val AdpcmIndexDelta: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode one 4-bit IMA ADPCM nibble against (predictor, stepIndex);
    * returns the new (predictor, stepIndex). The exact integer
    * recurrence from the IMA spec — also used by the test suite's
    * closed-form fixtures. */
  private[graft] def adpcmStep(nibble: Int, pred: Int, index: Int): (Int, Int) = {
    val step = AdpcmSteps(index)
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    val p0 = if ((nibble & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, index + AdpcmIndexDelta(nibble)))
    (p, i)
  }

  /** REAL compressed-audio decode for IMA ADPCM WAVs (format tag 0x11
    * — the common 4-bit compressed WAV the JDK does NOT support): RIFF
    * chunk walk → per-block per-channel (predictor, stepIndex) headers
    * → nibble stream through [[adpcmStep]], channels interleaved in
    * 4-byte groups, low nibble first. Returns 16-bit LE interleaved
    * PCM + channel count, `None` for anything that isn't a well-formed
    * IMA ADPCM WAV. With this, only mp3/mp4 compressed-sample decode
    * remains stubbed (`Multimodal.scala:19`). */
  private[graft] def imaAdpcmPcm(content: Array[Byte]): Option[(Array[Byte], Int)] = {
    def le16(o: Int) = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8)
    def le32(o: Int) = (content(o) & 0xff) | ((content(o + 1) & 0xff) << 8) |
      ((content(o + 2) & 0xff) << 16) | ((content(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(content.slice(o, o + 4), "US-ASCII")
    try {
      if (content.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var fmtOff = -1; var fmtLen = 0; var dataOff = -1; var dataLen = 0
      while (off + 8 <= content.length) {
        val id = tag(off); val len = le32(off + 4)
        if (id == "fmt ") { fmtOff = off + 8; fmtLen = len }
        if (id == "data") { dataOff = off + 8; dataLen = len }
        off += 8 + len + (len & 1)
      }
      if (fmtOff < 0 || dataOff < 0 || fmtLen < 16) return None
      val formatTag = le16(fmtOff)
      val ch = le16(fmtOff + 2)
      val blockAlign = le16(fmtOff + 12)
      if (formatTag != 0x11 || ch < 1 || ch > 2 ||
        blockAlign < 4 * ch || (blockAlign % (4 * ch)) != 0) return None
      val end = math.min(dataOff + dataLen, content.length)
      val out = new java.io.ByteArrayOutputStream()
      def emit(s: Int): Unit = { out.write(s & 0xff); out.write((s >> 8) & 0xff) }
      var blk = dataOff
      while (blk + 4 * ch <= end) {
        val blkEnd = math.min(blk + blockAlign, end)
        val pred = new Array[Int](ch); val idx = new Array[Int](ch)
        var c = 0
        while (c < ch) {
          pred(c) = le16(blk + 4 * c).toShort.toInt
          idx(c) = math.max(0, math.min(88, content(blk + 4 * c + 2) & 0xff))
          emit(pred(c)) // the block header predictor IS the first sample
          c += 1
        }
        // body: one 4-byte group per channel in rotation, 8 nibbles
        // per group, low nibble of each byte first
        var g = blk + 4 * ch
        while (g + 4 * ch <= blkEnd) {
          val frames = Array.ofDim[Int](8, ch)
          c = 0
          while (c < ch) {
            var k = 0
            while (k < 4) {
              val b = content(g + 4 * c + k) & 0xff
              val (p1, i1) = adpcmStep(b & 0xf, pred(c), idx(c))
              pred(c) = p1; idx(c) = i1; frames(2 * k)(c) = p1
              val (p2, i2) = adpcmStep(b >> 4, pred(c), idx(c))
              pred(c) = p2; idx(c) = i2; frames(2 * k + 1)(c) = p2
              k += 1
            }
            c += 1
          }
          var f = 0
          while (f < 8) { c = 0; while (c < ch) { emit(frames(f)(c)); c += 1 }; f += 1 }
          g += 4 * ch
        }
        blk += blockAlign
      }
      val bytes = out.toByteArray
      if (bytes.length < 2 * ch) None else Some((bytes, ch))
    } catch { case _: Exception => None }
  }

  /** Partition-parallel feature extraction over binary content. Runs as
    * `mapPartitions` so per-partition decoder state (a real codec
    * context) is initialized once per partition, not once per row —
    * the Spark-side analog of a Pandas-UDF batch decode. Image mimes
    * decode for real (64-dim 8×8 grayscale thumbnail via
    * [[imageFeatures]]); other mimes — and images whose bytes fail to
    * decode — fall back to the deterministic `dim`-width stub. */
  def extractFeatures(spark: SparkSession, binaries: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    binaries
      .select(col("path"), col("length"), col("content"))
      .as[(String, Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl for audio/video: init codec context here, once per partition
        rows.map { case (path, len, content) =>
          val mime = sniffMime(content).getOrElse("application/octet-stream")
          val features =
            if (mime.startsWith("image/"))
              imageFeatures(content).getOrElse(fakeDecode(content, dim))
            else if (mime == "audio/wav")
              audioFeatures(content, dim).getOrElse(fakeDecode(content, dim))
            else fakeDecode(content, dim)
          MediaFeatures(path, mime, len, features)
        }
      }
  }

  /** P10 — filename defaulting: keep the supplied filename, else build
    * the reference's timestamped default from the received time and the
    * mime-derived extension (`src/signal/process_incoming_message
    * .rs:60-77`: `signal-%Y-%m-%d-%H%M%S.{ext}`, extension falling back
    * to `bin` for unknown mimes). */
  def defaultFilename(nameCol: org.apache.spark.sql.Column,
      tsCol: org.apache.spark.sql.Column,
      mimeCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val extMap = typedlit(Map(
      "image/jpeg" -> "jpg", "image/png" -> "png", "image/gif" -> "gif",
      "audio/mpeg" -> "mp3", "audio/wav" -> "wav", "video/mp4" -> "mp4",
      "text/plain" -> "txt"))
    coalesce(nameCol, concat(
      lit("signal-"), date_format(tsCol, "yyyy-MM-dd-HHmmss"),
      lit("."), coalesce(element_at(extMap, mimeCol), lit("bin"))))
  }

  /** S6 — attachment binary sink: write each row's `content` bytes to
    * `<outDir>/<filename>`, the distributed form of the reference's
    * per-attachment `fs::write`
    * (`src/signal/process_incoming_message.rs:46-83`). Runs as
    * `foreachPartition` so each executor writes its own partition's
    * files directly (no driver collect, no shuffle); filenames must be
    * pre-deduplicated by the caller (`defaultFilename` + id suffix). */
  def writeBinaries(df: DataFrame, outDir: String,
      fileCol: String = "filename", contentCol: String = "content"): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    df.select(col(fileCol), col(contentCol))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val target = java.nio.file.Paths.get(outDir, r.getString(0))
          java.nio.file.Files.write(target, r.getAs[Array[Byte]](1))
        }
      }
  }

  /** Frame sampling: every `stride`-th frame of a multi-frame asset as
    * its own row with a per-frame thumbnail. REAL for animated GIF
    * ([[gifFrames]] via `javax.imageio` — same offline playbook as the
    * image and WAV paths); mp3/mp4 video remains the deterministic
    * fake (frame count = length/1024+1, stub thumb keyed by content
    * and frame index) until a codec exists in the container. Runs as
    * `mapPartitions` — the 1→N generator shape of real video frame
    * extraction, decoder state per partition. */
  def sampleFrames(binaries: DataFrame, stride: Int = 10, side: Int = 8): DataFrame = {
    val spark = binaries.sparkSession
    import spark.implicits._
    binaries.select(col("path"), col("length"), col("content"))
      .as[(String, Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (path, len, content) =>
          val mime = sniffMime(content).getOrElse("application/octet-stream")
          val real = if (mime == "image/gif") gifFrames(content) else None
          real match {
            case Some(frames) =>
              (0 until frames.length by stride).map(i =>
                (path, mime, frames.length, i, imageThumb(frames(i), side)))
            case None =>
              val n = (len / 1024 + 1).toInt
              (0 until n by stride).map(i =>
                (path, mime, n, i, fakeDecode(content :+ i.toByte, side * side)))
          }
        }
      }
      .toDF("path", "mime", "n_frames", "frame_idx", "thumb")
  }

  // --- mp3/mp4 container metadata (REAL parse; r10) -------------------
  // Frame/box-header parsing is pure-JVM integer arithmetic — no codec
  // library needed — so duration/bitrate/sample-rate come from the real
  // bytes. With this, the only remaining stub in the multimodal surface
  // is FULL mp3/mp4 sample decode (fakeDecode above).

  /** Container-level metadata of one asset:
    * (duration_ms, bit_rate bps, sample_rate Hz); zeros where the
    * container does not carry the field. */
  case class ContainerInfo(path: String, mime: String, bytes: Long,
      duration_ms: Long, bit_rate: Int, sample_rate: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** MPEG-1 Layer III frame-header parse (the ubiquitous mp3 case):
    * skip a leading ID3v2 tag (synchsafe size), find the 0xFFE sync,
    * decode the bitrate/sample-rate index tables, and estimate the CBR
    * duration from the audio byte count — a trailing 128-byte ID3v1
    * `TAG` block is excluded from that count, and a second frame header
    * whose bitrate index differs from the first marks the stream VBR
    * (a single-header CBR estimate would be silently wrong) → None.
    * Returns (duration_ms, bit_rate bps, sample_rate Hz); None for
    * missing sync, VBR, other MPEG versions/layers, or truncated
    * input. The estimate is exact for CBR; for a CBR stream with
    * embedded non-audio tags other than ID3v1/v2 it overestimates by
    * the tag bytes' play time. */
  private[graft] def mp3Metadata(content: Array[Byte]): Option[(Long, Int, Int)] = {
    val bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val srates = Array(44100, 48000, 32000)
    var off = 0
    if (content.length >= 10 && content(0) == 'I' && content(1) == 'D' && content(2) == '3')
      off = 10 + (((u8(content, 6) & 0x7f) << 21) | ((u8(content, 7) & 0x7f) << 14) |
        ((u8(content, 8) & 0x7f) << 7) | (u8(content, 9) & 0x7f))
    if (off + 4 > content.length) return None
    val b1 = u8(content, off); val b2 = u8(content, off + 1); val b3 = u8(content, off + 2)
    val isSync = b1 == 0xff && (b2 & 0xe0) == 0xe0
    val version = (b2 >> 3) & 3 // 3 = MPEG-1
    val layer = (b2 >> 1) & 3   // 1 = Layer III
    val brIdx = (b3 >> 4) & 0xf
    val srIdx = (b3 >> 2) & 3
    if (!isSync || version != 3 || layer != 1 || brIdx == 0 || brIdx == 15 || srIdx == 3)
      return None
    val bps = bitrates(brIdx) * 1000
    val sr = srates(srIdx)
    // VBR sniff: MPEG-1 Layer III frame length = 144*bps/sr + padding;
    // a VALID sync at the next frame with a different bitrate index
    // means VBR — bail rather than return a wrong CBR estimate. (Zeroed
    // or absent bytes there are not a header; plain CBR streams pass.)
    val pad = (b3 >> 1) & 1
    val next = off + 144 * bps / sr + pad
    if (next + 4 <= content.length) {
      val n1 = u8(content, next); val n2 = u8(content, next + 1)
      val n3 = u8(content, next + 2)
      val nBr = (n3 >> 4) & 0xf
      if (n1 == 0xff && (n2 & 0xe0) == 0xe0 && ((n2 >> 3) & 3) == 3 &&
          ((n2 >> 1) & 3) == 1 && nBr != 0 && nBr != 15 && nBr != brIdx)
        return None
    }
    // a trailing ID3v1 tag is a fixed 128-byte 'TAG' block — metadata,
    // not audio; excluding it keeps the CBR byte count honest
    val id3v1 = content.length >= off + 4 + 128 &&
      content(content.length - 128) == 'T' &&
      content(content.length - 127) == 'A' &&
      content(content.length - 126) == 'G'
    val audioBytes = (content.length - off - (if (id3v1) 128 else 0)).toLong
    Some((audioBytes * 8L * 1000L / bps, bps, sr))
  }

  /** ISO-BMFF (mp4) `moov/mvhd` parse: walk top-level boxes to `moov`,
    * then its children to `mvhd`, and read (timescale, duration) —
    * version 0 (32-bit) and version 1 (64-bit) layouts. Returns
    * duration in ms; None when no well-formed mvhd exists. */
  private[graft] def mp4DurationMs(content: Array[Byte]): Option[Long] = {
    def boxes(from: Long, until: Long): Iterator[(String, Long, Long)] =
      new Iterator[(String, Long, Long)] {
        private var pos = from
        def hasNext: Boolean = pos + 8 <= until
        def next(): (String, Long, Long) = {
          val size0 = be32(content, pos.toInt)
          val tpe = new String(content, pos.toInt + 4, 4, "ISO-8859-1")
          val (size, hdr) =
            if (size0 == 1 && pos + 16 <= until)
              ((be32(content, pos.toInt + 8) << 32) | be32(content, pos.toInt + 12), 16L)
            else (size0, 8L)
          val body = pos + hdr
          val end = if (size == 0) until else math.min(until, pos + math.max(size, hdr))
          pos = end
          (tpe, body, end)
        }
      }
    boxes(0L, content.length.toLong)
      .collectFirst { case ("moov", b, e) =>
        boxes(b, e).collectFirst { case ("mvhd", mb, me) =>
          val i = mb.toInt
          if (me < mb + 4) None
          else u8(content, i) match {
            case 0 if me >= mb + 20 =>
              val timescale = be32(content, i + 12)
              val duration = be32(content, i + 16)
              if (timescale > 0) Some(duration * 1000L / timescale) else None
            case 1 if me >= mb + 32 =>
              val timescale = be32(content, i + 20)
              val duration = (be32(content, i + 24) << 32) | be32(content, i + 28)
              if (timescale > 0) Some(duration * 1000L / timescale) else None
            case _ => None
          }
        }.flatten
      }.flatten
  }

  /** Container metadata over a `binaryFile` frame — the metadata half
    * of the mp3/mp4 surface, parsed from the REAL bytes (duration,
    * bitrate, sample rate); WAV durations come through the existing
    * decode path, images report zeros. Same mapPartitions batch shape
    * as [[extractFeatures]]. */
  def containerInfo(spark: SparkSession, binaries: DataFrame): Dataset[ContainerInfo] = {
    import spark.implicits._
    binaries.select(col("path"), col("length"), col("content"))
      .as[(String, Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (path, len, content) =>
          val mime = sniffMime(content).getOrElse("application/octet-stream")
          val (dur, br, sr) = mime match {
            case "audio/mpeg" =>
              mp3Metadata(content).getOrElse((0L, 0, 0))
            case "video/mp4" =>
              val d = mp4DurationMs(content).getOrElse(0L)
              val bitRate = if (d > 0) (len * 8L * 1000L / d).toInt else 0
              (d, bitRate, 0)
            case _ => (0L, 0, 0)
          }
          ContainerInfo(path, mime, len, dur, br, sr)
        }
      }
  }
}
