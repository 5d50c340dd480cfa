package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_bin")
    Files.write(d.resolve("a.jpg"), Array[Byte](1, 2, 3, 4, 5))
    Files.write(d.resolve("b.png"), Array[Byte](9, 8, 7))
    Files.write(d.resolve("c.bin"), Array.fill[Byte](2048)(42))
    d.toString
  }

  test("binaryFile source exposes path/length/content") {
    val df = Multimodal.readBinaryDir(spark, dir)
    assert(df.count() === 3)
    assert(df.columns.toSet === Set("path", "modificationTime", "length", "content"))
    val lens = df.select(element_at(split($"path", "/"), -1).as("f"), $"length")
      .as[(String, Long)].collect().toMap
    assert(lens("a.jpg") === 5 && lens("c.bin") === 2048)
  }

  test("mime guess from extension with octet-stream fallback") {
    val m = Multimodal.readBinaryDir(spark, dir)
      .select(element_at(split($"path", "/"), -1).as("f"),
        Multimodal.mimeFromPath($"path").as("mime"))
      .as[(String, String)].collect().toMap
    assert(m("a.jpg") === "image/jpeg")
    assert(m("b.png") === "image/png")
    assert(m("c.bin") === "application/octet-stream")
  }

  test("magic-byte mime sniff detects content type regardless of extension") {
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 1, 2)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val mp3Id3 = "ID3xxxx".getBytes("UTF-8")
    val mp3Sync = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0)
    val wav = "RIFF".getBytes("UTF-8") ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes("UTF-8")
    val mp4 = Array[Byte](0, 0, 0, 0x18) ++ "ftypmp42".getBytes("UTF-8")
    val par = "PAR1....".getBytes("UTF-8")
    val junk = Array[Byte](1, 2, 3, 4)
    assert(Multimodal.sniffMime(jpeg) === Some("image/jpeg"))
    assert(Multimodal.sniffMime(png) === Some("image/png"))
    assert(Multimodal.sniffMime(mp3Id3) === Some("audio/mpeg"))
    assert(Multimodal.sniffMime(mp3Sync) === Some("audio/mpeg"))
    assert(Multimodal.sniffMime(wav) === Some("audio/wav"))
    assert(Multimodal.sniffMime(mp4) === Some("video/mp4"))
    assert(Multimodal.sniffMime(par) === Some("application/vnd.apache.parquet"))
    assert(Multimodal.sniffMime(junk) === None)
    assert(Multimodal.sniffMime(Array.empty[Byte]) === None)
    // extractFeatures surfaces the sniffed mime (fixture files are parquet)
    val mimes = Multimodal.extractFeatures(spark,
      Multimodal.readBinaryDir(spark, sf, "*.parquet"), dim = 4)
      .toDF().select($"mime").as[String].collect().toSet
    assert(mimes === Set("application/vnd.apache.parquet"))
  }

  test("S6 binary sink round-trips through the binaryFile source") {
    val out = Files.createTempDirectory("graft_bin_out").toString
    val src = Multimodal.readBinaryDir(spark, dir)
      .select(element_at(split($"path", "/"), -1).as("filename"), $"content")
    Multimodal.writeBinaries(src, out)
    val back = Multimodal.readBinaryDir(spark, out)
      .select(element_at(split($"path", "/"), -1).as("f"), $"content")
      .as[(String, Array[Byte])].collect().toMap
    val orig = src.as[(String, Array[Byte])].collect().toMap
    assert(back.keySet === orig.keySet)
    assert(orig.forall { case (f, bytes) => back(f).sameElements(bytes) })
  }

  test("P10 filename defaulting: supplied name wins, else timestamped mime default") {
    val df = Seq(
      (Some("given.jpg"), "2024-03-01 10:20:30", "image/jpeg"),
      (None, "2024-03-01 10:20:30", "image/jpeg"),
      (None, "2024-12-31 23:59:59", "application/x-unknown"))
      .toDF("name", "ts_s", "mime")
      .withColumn("ts", $"ts_s".cast("timestamp"))
    val got = df.select(
      Multimodal.defaultFilename($"name", $"ts", $"mime").as("f"))
      .as[String].collect().toSeq
    assert(got === Seq(
      "given.jpg",
      "signal-2024-03-01-102030.jpg",
      "signal-2024-12-31-235959.bin"))
  }

  test("feature extraction: deterministic, fixed dim, partition-parallel") {
    val bins = Multimodal.readBinaryDir(spark, dir)
    val f1 = Multimodal.extractFeatures(spark, bins, dim = 16).collect()
      .map(f => f.path -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(spark, bins, dim = 16).collect()
      .map(f => f.path -> f.features.toSeq).toMap
    assert(f1 === f2)
    assert(f1.values.forall(_.length == 16))
    // content actually flowed: different files → different features
    assert(f1.values.toSet.size === 3)
  }

  test("real image decode: PNG thumbnail matches known quadrant luminances; corrupt falls back") {
    // 2×2 PNG with one color per quadrant of the 8×8 thumbnail grid
    val im = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    im.setRGB(0, 0, 0xffffff) // white → luminance 1.0
    im.setRGB(1, 0, 0x000000) // black → 0.0
    im.setRGB(0, 1, 0xff0000) // red   → 0.299
    im.setRGB(1, 1, 0x0000ff) // blue  → 0.114
    val d = Files.createTempDirectory("graft_img")
    javax.imageio.ImageIO.write(im, "png", d.resolve("q.png").toFile)
    javax.imageio.ImageIO.write(im, "jpg", d.resolve("q.jpg").toFile)
    // PNG magic bytes but undecodable body → stub fallback
    Files.write(d.resolve("bad.png"), Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3))
    val got = Multimodal.extractFeatures(spark,
        Multimodal.readBinaryDir(spark, d.toString), dim = 16)
      .collect().map(f => f.path.split('/').last -> f).toMap
    val png = got("q.png")
    assert(png.mime === "image/png")
    assert(png.features.length === 64)
    def cell(cx: Int, cy: Int): Float = png.features(cy * 8 + cx)
    for (cx <- 0 until 4; cy <- 0 until 4) assert(math.abs(cell(cx, cy) - 1.0f) < 1e-6)
    for (cx <- 4 until 8; cy <- 0 until 4) assert(math.abs(cell(cx, cy) - 0.0f) < 1e-6)
    for (cx <- 0 until 4; cy <- 4 until 8) assert(math.abs(cell(cx, cy) - 0.299f) < 1e-3)
    for (cx <- 4 until 8; cy <- 4 until 8) assert(math.abs(cell(cx, cy) - 0.114f) < 1e-3)
    val jpg = got("q.jpg")
    assert(jpg.mime === "image/jpeg") // sniffed, not from the extension
    assert(jpg.features.length === 64)
    assert(jpg.features.forall(v => v >= 0f && v <= 1f))
    val bad = got("bad.png")
    assert(bad.mime === "image/png")
    assert(bad.features.length === 16) // decode failed → dim-width stub
  }

  test("real WAV decode: RMS envelope matches a planted silence/square signal; " +
      "stereo mixes to mono; corrupt falls back") {
    import javax.sound.sampled._
    def wavBytes(samples: Array[Short], channels: Int): Array[Byte] = {
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16,
        channels, channels * 2, 8000f, false)
      val raw = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(raw),
        fmt, samples.length / channels)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // 1600 mono frames: first half silence, second half ±16384 square
    // wave → buckets 0-7 RMS 0, buckets 8-15 RMS 16384/32768 = 0.5
    val mono = Array.tabulate[Short](1600)(i =>
      if (i < 800) 0 else if (i % 2 == 0) 16384 else -16384)
    val wav = wavBytes(mono, channels = 1)
    assert(Multimodal.sniffMime(wav) === Some("audio/wav"))
    val env = Multimodal.audioFeatures(wav, 16).get
    assert(env.length === 16)
    (0 until 8).foreach(b => assert(math.abs(env(b)) < 1e-6, s"bucket $b"))
    (8 until 16).foreach(b => assert(math.abs(env(b) - 0.5f) < 1e-6, s"bucket $b"))
    // stereo with L = -R cancels to silence after the mono mix
    val stereo = Array.tabulate[Short](1600)(i =>
      if (i % 2 == 0) 12000 else -12000)
    val env2 = Multimodal.audioFeatures(wavBytes(stereo, channels = 2), 16).get
    env2.foreach(v => assert(math.abs(v) < 1e-6))
    // RIFF/WAVE magic but a garbage body → None → stub in the pipeline
    val corrupt = wav.take(20) ++ Array.fill[Byte](10)(0x7f)
    assert(Multimodal.audioFeatures(corrupt, 16).isEmpty)
    // end-to-end through extractFeatures: wav decodes real, corrupt stubs
    val d = Files.createTempDirectory("graft_wav")
    Files.write(d.resolve("tone.wav"), wav)
    Files.write(d.resolve("bad.wav"), corrupt)
    val got = Multimodal.extractFeatures(spark,
        Multimodal.readBinaryDir(spark, d.toString), dim = 16)
      .collect().map(f => f.path.split('/').last -> f).toMap
    assert(got("tone.wav").mime === "audio/wav")
    assert(got("tone.wav").features.toSeq === env.toSeq)
    assert(got("bad.wav").features.toSeq ===
      Multimodal.fakeDecode(corrupt, 16).toSeq)
  }

  test("IMA ADPCM WAV decode: closed-form constant blocks, encoder round-trip " +
      "tracks a square wave, stereo, JDK mu-law path, e2e fallback order") {
    // hand-build an IMA ADPCM WAV (format tag 0x11) from raw blocks
    def adpcmWav(blocks: Array[Byte], channels: Int, blockAlign: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def w16(v: Int) = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      def w32(v: Int) = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
      bos.write("RIFF".getBytes); w32(4 + 8 + 20 + 8 + blocks.length)
      bos.write("WAVE".getBytes)
      bos.write("fmt ".getBytes); w32(20)
      w16(0x11); w16(channels); w32(8000); w32(8000 * blockAlign / 505)
      w16(blockAlign); w16(4) // bits per sample
      val spb = (blockAlign - 4 * channels) * 2 / channels + 1
      w16(2); w16(spb) // cbSize + samplesPerBlock
      bos.write("data".getBytes); w32(blocks.length); bos.write(blocks)
      bos.toByteArray
    }
    // CLOSED-FORM: nibble 0 adds step>>3 and at index 0 step=7>>3=0, so a
    // block of predictor P + all-zero nibbles decodes to EXACTLY P repeated
    val constBlock = {
      val b = new Array[Byte](4 + 32) // mono, 4-byte header + 32 body bytes
      b(0) = (12345 & 0xff).toByte; b(1) = ((12345 >> 8) & 0xff).toByte
      b(2) = 0; b(3) = 0
      b
    }
    val (constPcm, ch1) = Multimodal.imaAdpcmPcm(adpcmWav(constBlock, 1, 36)).get
    assert(ch1 === 1)
    val constSamples = constPcm.grouped(2)
      .map(p => (((p(0) & 0xff) | (p(1) << 8)).toShort).toInt).toSeq
    assert(constSamples.length === 65) // 1 header sample + 64 nibbles
    assert(constSamples.forall(_ === 12345))
    // encoder round-trip: greedy IMA encoder (the spec's inverse recurrence
    // via adpcmStep itself picking the best nibble) must track a +-8000
    // square wave closely once the step size has adapted
    def encode(samples: Array[Int], blockAlign: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var pred = samples.head; var idx = 0
      val spb = (blockAlign - 4) * 2 + 1
      samples.grouped(spb).foreach { blk =>
        out.write(pred & 0xff); out.write((pred >> 8) & 0xff)
        out.write(idx); out.write(0)
        val nib = blk.drop(1).padTo(spb - 1, blk.last).map { s =>
          val best = (0 until 16).minBy { n =>
            val (p, _) = Multimodal.adpcmStep(n, pred, idx)
            math.abs(p - s)
          }
          val (p, i) = Multimodal.adpcmStep(best, pred, idx)
          pred = p; idx = i; best
        }
        nib.grouped(2).foreach(p => out.write((p(0) | (p(1) << 4)) & 0xff))
      }
      out.toByteArray
    }
    // period-8 square (4-sample plateaus): Nyquist-rate alternation is
    // the one signal ADPCM tracks worst (~8% RMS undershoot); plateaus
    // let the greedy encoder settle within quantization error
    val square = Array.tabulate(505)(i => if ((i / 4) % 2 == 0) 8000 else -8000)
    val wav = adpcmWav(encode(square, 132), 1, 132)
    assert(Multimodal.sniffMime(wav) === Some("audio/wav"))
    val env = Multimodal.audioFeatures(wav, 4).get
    // RMS of the tracked square wave ~ 8000/32768 ~ 0.244; allow the
    // first bucket its adaptation ramp
    env.drop(1).foreach(v => assert(math.abs(v - 8000.0 / 32768) < 0.02, v.toString))
    // stereo: L = const 5000 (zero nibbles), R = const -5000 -> per-channel
    // constants survive the interleave, mono mix cancels to 0
    val stBlock = new Array[Byte](8 + 8) // two 4-byte headers + one group each
    stBlock(0) = (5000 & 0xff).toByte; stBlock(1) = ((5000 >> 8) & 0xff).toByte
    val m5000 = (-5000 & 0xffff)
    stBlock(4) = (m5000 & 0xff).toByte; stBlock(5) = ((m5000 >> 8) & 0xff).toByte
    val stEnv = Multimodal.audioFeatures(adpcmWav(stBlock, 2, 16), 2).get
    stEnv.foreach(v => assert(math.abs(v) < 1e-6))
    // G.711 mu-law WAV decodes through the JDK conversion path
    import javax.sound.sampled._
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val raw = new Array[Byte](1600 * 2)
    (0 until 1600).foreach { i =>
      val s = if (i % 2 == 0) 16000 else -16000
      raw(2 * i) = (s & 0xff).toByte; raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ulawAis = AudioSystem.getAudioInputStream(ulawFmt,
      new AudioInputStream(new java.io.ByteArrayInputStream(raw), pcmFmt, 1600))
    val ulawBos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulawAis, AudioFileFormat.Type.WAVE, ulawBos)
    val ulawEnv = Multimodal.audioFeatures(ulawBos.toByteArray, 4).get
    // mu-law is logarithmic 8-bit: top-segment quantization error is up
    // to ~512/32768 at this level, so allow 2% absolute
    ulawEnv.foreach(v => assert(math.abs(v - 16000.0 / 32768) < 0.02, v.toString))
    // e2e: the ADPCM wav decodes real through extractFeatures (not the stub)
    val d = Files.createTempDirectory("graft_adpcm")
    Files.write(d.resolve("sq.wav"), wav)
    val got = Multimodal.extractFeatures(spark,
        Multimodal.readBinaryDir(spark, d.toString), dim = 4)
      .collect().head
    assert(got.mime === "audio/wav")
    assert(got.features.toSeq === Multimodal.audioFeatures(wav, 4).get.toSeq)
  }

  test("frame sampling emits stride-spaced ordinals") {
    val frames = Multimodal.sampleFrames(
      Multimodal.readBinaryDir(spark, dir, "c.bin"), stride = 1)
    val idx = frames.select($"frame_idx").as[Int].collect().sorted.toSeq
    assert(idx === (0 until 3).toSeq) // 2048 bytes → 3 fake frames
  }

  test("animated GIF: real multi-frame decode — frame count and per-frame thumbnails") {
    import java.awt.image.BufferedImage
    // three 32×32 solid-gray frames at distinct levels; gray survives
    // the GIF writer's palette quantization exactly, and the Rec.601
    // coefficients sum to 1, so each frame's thumbnail is level/255 in
    // every cell
    val levels = Seq(40, 120, 200)
    val frames = levels.map { g =>
      val im = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      for (y <- 0 until 32; x <- 0 until 32) im.setRGB(x, y, rgb)
      im
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val gif = bos.toByteArray

    assert(Multimodal.sniffMime(gif) === Some("image/gif"))
    assert(Multimodal.gifFrames(gif).get.length === 3)

    val d = Files.createTempDirectory("graft_gif")
    Files.write(d.resolve("anim.gif"), gif)
    val rows = Multimodal.sampleFrames(
        Multimodal.readBinaryDir(spark, d.toString), stride = 1)
      .select($"mime", $"n_frames", $"frame_idx", $"thumb")
      .as[(String, Int, Int, Array[Float])].collect().sortBy(_._3)
    assert(rows.length === 3)
    rows.zip(levels).foreach { case ((mime, n, idx, thumb), g) =>
      assert(mime === "image/gif" && n === 3)
      assert(thumb.length === 64)
      thumb.foreach(v =>
        assert(math.abs(v - g / 255.0f) < 1e-3, s"frame $idx cell $v vs ${g / 255.0f}"))
    }
    // stride honors the sampling contract on the real path too
    val strided = Multimodal.sampleFrames(
        Multimodal.readBinaryDir(spark, d.toString), stride = 2)
      .select($"frame_idx").as[Int].collect().sorted.toSeq
    assert(strided === Seq(0, 2))
  }

  private def be(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Minimal MPEG-1 Layer III stream: empty ID3v2 tag + one CBR frame
    * header (128 kbps, 44100 Hz) + silence to 4000 audio bytes. */
  private def mp3Bytes: Array[Byte] = {
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 0)
    val header = Array(0xff, 0xfb, 0x90, 0x00).map(_.toByte)
    id3 ++ header ++ Array.fill[Byte](4000 - 4)(0)
  }

  /** Minimal ISO-BMFF: ftyp + moov/mvhd (v0 or v1), timescale 1000,
    * duration `durTicks`. */
  private def mp4Bytes(durTicks: Long, v1: Boolean): Array[Byte] = {
    val ftyp = be(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be(0)
    val mvhdBody =
      if (!v1) Array[Byte](0, 0, 0, 0) ++ be(0) ++ be(0) ++ be(1000) ++ be(durTicks)
      else Array[Byte](1, 0, 0, 0) ++ be(0) ++ be(0) ++ be(0) ++ be(0) ++
        be(1000) ++ be(durTicks >> 32) ++ be(durTicks & 0xffffffffL)
    val mvhd = be(8 + mvhdBody.length) ++ "mvhd".getBytes ++ mvhdBody
    val moov = be(8 + mvhd.length) ++ "moov".getBytes ++ mvhd
    ftyp ++ moov
  }

  test("mp3/mp4 container metadata parses real frame/box headers") {
    // direct parses: 4000 audio bytes at 128 kbps -> 250 ms
    assert(Multimodal.mp3Metadata(mp3Bytes) === Some((250L, 128000, 44100)))
    assert(Multimodal.mp4DurationMs(mp4Bytes(2500L, v1 = false)) === Some(2500L))
    assert(Multimodal.mp4DurationMs(mp4Bytes(7250L, v1 = true)) === Some(7250L))
    // garbage and truncation return None rather than throwing
    assert(Multimodal.mp3Metadata(Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.mp4DurationMs("ftypnonsense".getBytes) === None)
    // end-to-end through the binaryFile source
    val d = Files.createTempDirectory("graft_av")
    Files.write(d.resolve("tone.mp3"), mp3Bytes)
    Files.write(d.resolve("clip.mp4"), mp4Bytes(2500L, v1 = false))
    Files.write(d.resolve("junk.bin"), Array.fill[Byte](64)(7))
    val got = Multimodal.containerInfo(spark,
        Multimodal.readBinaryDir(spark, d.toString)).collect()
      .map(c => (c.path.split("/").last, c.mime, c.duration_ms, c.bit_rate,
        c.sample_rate)).sortBy(_._1).toSeq
    val mp4Len = mp4Bytes(2500L, v1 = false).length.toLong
    assert(got === Seq(
      ("clip.mp4", "video/mp4", 2500L, (mp4Len * 8L * 1000L / 2500L).toInt, 0),
      ("junk.bin", "application/octet-stream", 0L, 0, 0),
      ("tone.mp3", "audio/mpeg", 250L, 128000, 44100)))
  }

  test("mp3: VBR detected via second frame header; ID3v1 trailer excluded") {
    // MPEG-1 L3 at 128 kbps / 44100 Hz, no padding: frame = 417 bytes
    val h128 = Array(0xff, 0xfb, 0x90, 0x00).map(_.toByte)
    val h160 = Array(0xff, 0xfb, 0xa0, 0x00).map(_.toByte)
    val frame128 = h128 ++ Array.fill[Byte](417 - 4)(0)
    // differing bitrate index in the second frame header -> VBR -> None
    assert(Multimodal.mp3Metadata(
      frame128 ++ h160 ++ Array.fill[Byte](100)(0)) === None)
    // same-bitrate second frame stays CBR: 834 audio bytes at 128 kbps
    val cbr = frame128 ++ frame128
    assert(Multimodal.mp3Metadata(cbr) ===
      Some((834L * 8L * 1000L / 128000L, 128000, 44100)))
    // a trailing 128-byte ID3v1 'TAG' block is metadata, not audio —
    // the duration must not change when it is appended
    val id3v1 = "TAG".getBytes("UTF-8") ++ Array.fill[Byte](125)(0)
    assert(Multimodal.mp3Metadata(mp3Bytes ++ id3v1) ===
      Some((250L, 128000, 44100)))
  }

  test("imageDHash: gradient-sign bits on a known raster; corrupt -> None") {
    // 18×8 left-to-right ramp: every grid cell is darker than its right
    // neighbor -> all 64 dHash bits set
    val im = new java.awt.image.BufferedImage(18, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 18; y <- 0 until 8) {
      val v = 255 - x * 14
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    assert(Multimodal.imageDHash(bos.toByteArray) === Some(-1L))
    // flat image -> no strict gradients -> 0
    val flat = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 9; y <- 0 until 8) flat.setRGB(x, y, 0x808080)
    val b2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(flat, "png", b2)
    assert(Multimodal.imageDHash(b2.toByteArray) === Some(0L))
    assert(Multimodal.imageDHash(Array[Byte](1, 2, 3, 4)) === None)
  }

  test("audioFingerprint: staircase envelope bits; silence -> 0; corrupt -> None") {
    // 65 segments of strictly decreasing amplitude square waves ->
    // every envelope delta positive -> all 64 bits set
    def wav(samples: Seq[Short]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(bos)
      val data = samples.length * 2
      d.writeBytes("RIFF")
      d.writeInt(Integer.reverseBytes(36 + data))
      d.writeBytes("WAVEfmt ")
      d.writeInt(Integer.reverseBytes(16))
      d.writeShort(java.lang.Short.reverseBytes(1).toInt)        // PCM
      d.writeShort(java.lang.Short.reverseBytes(1).toInt)        // mono
      d.writeInt(Integer.reverseBytes(8000))
      d.writeInt(Integer.reverseBytes(16000))
      d.writeShort(java.lang.Short.reverseBytes(2).toInt)
      d.writeShort(java.lang.Short.reverseBytes(16).toInt)
      d.writeBytes("data")
      d.writeInt(Integer.reverseBytes(data))
      samples.foreach(s => d.writeShort(java.lang.Short.reverseBytes(s).toInt))
      bos.toByteArray
    }
    val stair = (0 until 65).flatMap { b =>
      val amp = (30000 - b * 400).toShort
      (0 until 32).map(f => if (f % 2 == 0) amp else (-amp).toShort)
    }
    assert(Multimodal.audioFingerprint(wav(stair)) === Some(-1L))
    assert(Multimodal.audioFingerprint(wav(Seq.fill(65 * 32)(0.toShort)))
      === Some(0L))
    assert(Multimodal.audioFingerprint(Array[Byte](1, 2, 3)) === None)
  }

  test("audioNearDups == brute-force hamming <= 3 over the WAV fixtures") {
    val dir = "/root/repo/src/test/resources/graft/audio"
    val bins = Multimodal.readBinaryDir(spark, dir, "*.wav")
    val hs = Multimodal.audioHashes(spark, bins)
      .as[(String, Long)].collect().sortBy(_._1)
    assert(hs.length === 32)
    val brute = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      d = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if d <= 3
    } yield (hs(i)._1, hs(j)._1, d)).sorted
    val got = Multimodal.audioNearDups(spark, bins, maxHamming = 3)
      .as[(String, String, Int)].collect().sorted.toSeq
    assert(got === brute)
    assert(got.size === 36) // the six planted 4-variant families
  }

  test("imageNearDups == brute-force hamming <= 3 over the BMP fixtures; " +
      "undecodable binaries drop") {
    val dir = "/root/repo/src/test/resources/graft/images"
    val bins = Multimodal.readBinaryDir(spark, dir, "*.bmp")
    val hs = Multimodal.imageHashes(spark, bins)
      .as[(String, Long)].collect().sortBy(_._1)
    assert(hs.length === 32) // every fixture BMP decodes
    val brute = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      d = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if d <= 3
    } yield (hs(i)._1, hs(j)._1, d)).sorted
    val got = Multimodal.imageNearDups(spark, bins, maxHamming = 3)
      .as[(String, String, Int)].collect().sorted.toSeq
    assert(got === brute.map { case (a, b, d) => (a, b, d) })
    assert(got.size === 36) // the six planted 4-variant families
    // a corrupt binary contributes no hash and no pairs
    val d2 = Files.createTempDirectory("graft_baddup")
    Files.copy(Paths.get(s"$dir/img_00.bmp"), d2.resolve("a.bmp"))
    Files.copy(Paths.get(s"$dir/img_01.bmp"), d2.resolve("b.bmp"))
    Files.write(d2.resolve("c.bmp"), Array[Byte]('B', 'M', 9, 9))
    val small = Multimodal.imageNearDups(spark,
      Multimodal.readBinaryDir(spark, d2.toString, "*.bmp"))
      .as[(String, String, Int)].collect()
    assert(small.length === 1 && small.head._3 === 0)
  }

  test("imagePHash: family variants stay within a few bits, distinct " +
      "families differ, global brightness shift is phash-stable where " +
      "dhash-like gradients would survive too; corrupt -> None") {
    val dir = "/root/repo/src/test/resources/graft/images"
    val hs = Multimodal.imagePHashes(spark,
      Multimodal.readBinaryDir(spark, dir, "*.bmp"))
      .as[(String, Long)].collect()
      .map { case (p, h) => (p.substring(p.lastIndexOf('/') + 1), h) }
      .sortBy(_._1).toMap
    assert(hs.size === 32)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // one-pixel variants sit within a few bits of their family base
    for (fam <- 0 until 6; v <- 1 to 3) {
      val base = hs(f"img_${fam * 4}%02d.bmp")
      val vr = hs(f"img_${fam * 4 + v}%02d.bmp")
      assert(ham(base, vr) <= 8, s"family $fam variant $v: ${ham(base, vr)}")
    }
    // distinct families / uniques are far apart
    val reps = (0 until 6).map(f => hs(f"img_${f * 4}%02d.bmp")) ++
      (24 until 32).map(i => hs(f"img_$i%02d.bmp"))
    for (i <- reps.indices; j <- (i + 1) until reps.size)
      assert(ham(reps(i), reps(j)) > 8, s"reps $i,$j: ${ham(reps(i), reps(j))}")
    // corrupt bytes decode to None
    assert(Multimodal.imagePHash(Array[Byte]('B', 'M', 1, 2, 3)).isEmpty)
    // deterministic: recompute equals
    val again = Multimodal.imagePHash(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/img_00.bmp"))).get
    assert(again === hs("img_00.bmp"))
  }
}
