package graft

import graft.sources.{Flac, Multimodal}

/** From-spec FLAC decoder (q162). The checked-in fixtures
  * (tools/gen_flac_fixtures.py) carry a WAV twin per clip with
  * IDENTICAL samples, so the decode is asserted byte-identical to the
  * JDK's own WAV decode — the strongest cross-implementation check
  * available offline; the Python differential oracle
  * (tools/flac_replica.py) covers the same bytes independently for
  * the q162 pin. Closed-form: a CONSTANT-subframe-only clip decodes
  * to exactly its planted value (the q76 IMA-ADPCM precedent). */
class FlacSpec extends SparkSpec {

  private val dir = new java.io.File("src/test/resources/graft/flac")
  private def bytes(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(new java.io.File(dir, name).toPath)

  private def wavPcm(content: Array[Byte]): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val in = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val src = in.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
        src.getSampleRate, false)
      AudioSystem.getAudioInputStream(target, in).readAllBytes()
    } finally in.close()
  }

  test("closed-form: CONSTANT-only clip decodes to exactly the planted value") {
    val (pcm, ch) = Flac.pcm16(bytes("const_1234.flac")).get
    assert(ch === 1)
    assert(pcm.length === 65 * 32 * 2)
    var i = 0
    while (i < pcm.length) {
      val s = ((pcm(i) & 0xff) | (pcm(i + 1) << 8)).toShort
      assert(s === 1234)
      i += 2
    }
  }

  test("round-trip: every FLAC clip decodes byte-identically to its WAV twin " +
    "(VERBATIM / FIXED 1-3 / LPC subframes, partition orders 0 and 1)") {
    val clips = dir.listFiles().map(_.getName)
      .filter(n => n.startsWith("clip_") && n.endsWith(".flac")).sorted
    assert(clips.length === 32)
    for (c <- clips) {
      val (pcm, ch) = Flac.pcm16(bytes(c)).get
      assert(ch === 1)
      val wav = wavPcm(bytes(c.stripSuffix(".flac") + ".wav"))
      assert(pcm.sameElements(wav), s"FLAC decode differs from WAV twin for $c")
    }
  }

  test("audioFeatures chain reaches FLAC (JDK has no FLAC SPI) and the " +
    "envelope equals the WAV twin's") {
    val f = Multimodal.audioFeatures(bytes("clip_00.flac"), 65).get
    val w = Multimodal.audioFeatures(bytes("clip_00.wav"), 65).get
    assert(f.toSeq === w.toSeq)
    assert(Multimodal.sniffMime(bytes("clip_00.flac")) === Some("audio/flac"))
  }

  test("integrity: any in-frame byte flip fails CRC and decodes to None; " +
    "bad magic -> None") {
    val good = bytes("clip_01.flac")
    for (off <- Seq(50, good.length / 2, good.length - 3)) {
      val bad = good.clone()
      bad(off) = (bad(off) ^ 0x40).toByte
      assert(Flac.pcm16(bad).isEmpty, s"tampered byte at $off still decoded")
    }
    assert(Flac.pcm16("nope".getBytes ++ good.drop(4)).isEmpty)
    assert(Flac.pcm16(Array[Byte]()).isEmpty)
  }

  test("STREAMINFO integrity (r17): a tampered total-samples count decodes " +
    "to None; a written MD5 is verified (good -> Some, flipped -> None)") {
    val good = bytes("clip_01.flac")
    // STREAMINFO data starts at byte 8; total-samples occupies bits
    // 108..143 of it -> its last byte is abs offset 8 + 17 = 25.
    val badTotal = good.clone()
    badTotal(25) = (badTotal(25) ^ 0x01).toByte
    assert(Flac.pcm16(badTotal).isEmpty, "off-by-one total still decoded")
    // total = 0 means "unknown" -> still decodes, same samples.
    // total-samples = bits 108..143 of STREAMINFO data (abs bytes 21-25:
    // low nibble of 21, then 22..25).
    val zeroTotal = good.clone()
    zeroTotal(21) = (zeroTotal(21) & 0xf0).toByte
    for (i <- 22 to 25) zeroTotal(i) = 0
    assert(Flac.pcm16(zeroTotal).get._1.sameElements(Flac.pcm16(good).get._1))
    // Write the CORRECT stream MD5 into the fixture's zeroed field ->
    // must still decode; flip a byte of it -> None. For 16-bit mono the
    // MD5 input (unencoded interleaved LE samples) IS the pcm16 stream.
    val samples = Flac.pcm16(good).get._1
    val dig = java.security.MessageDigest.getInstance("MD5").digest(samples)
    val withMd5 = good.clone()
    System.arraycopy(dig, 0, withMd5, 26, 16)
    assert(Flac.pcm16(withMd5).get._1.sameElements(samples),
      "correct MD5 rejected")
    val badMd5 = withMd5.clone()
    badMd5(30) = (badMd5(30) ^ 0x10).toByte
    assert(Flac.pcm16(badMd5).isEmpty, "flipped MD5 still decoded")
  }

  test("decoder-only paths: wasted bits and Rice escape partitions " +
    "(hand-assembled frames)") {
    // samples 8,16,24,32 with 3 wasted bits -> stored as 1,2,3,4;
    // FIXED order 1 residuals all 1 -> Rice escape partition raw=2
    val samples = Array(8, 16, 24, 32)
    val bw = new FlacTestWriter
    bw.header(nSamples = 4)
    val f = new FlacTestWriter
    f.write(0x3ffe, 14); f.write(0, 1); f.write(0, 1)
    f.write(6, 4)      // 8-bit blocksize at end
    f.write(0, 4)      // rate from streaminfo
    f.write(0, 4)      // mono
    f.write(4, 3)      // 16 bps
    f.write(0, 1)
    f.write(0, 8)      // frame number 0
    f.write(3, 8)      // blocksize - 1
    f.crc8Here()
    f.write(0, 1)      // subframe padding
    f.write(8 | 1, 6)  // FIXED order 1
    f.write(1, 1)      // wasted bits flag
    f.write(1, 3)      // unary "001" -> readUnary()=2 -> wasted=3
    val eff = 13       // 16 - 3 wasted
    f.writeSigned(samples(0) >> 3, eff) // warmup
    f.write(0, 2)      // Rice method 0
    f.write(0, 4)      // partition order 0
    f.write(15, 4)     // ESCAPE
    f.write(2, 5)      // raw bits = 2
    for (i <- 1 until 4) f.writeSigned((samples(i) - samples(i - 1)) >> 3, 2)
    f.align()
    f.crc16Whole()
    val stream = bw.result ++ f.result
    val (pcm, ch) = Flac.pcm16(stream).get
    assert(ch === 1)
    val got = (0 until 4).map(i =>
      (((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort).toInt)
    assert(got === samples.toSeq)
  }
}

/** Minimal bit-level FLAC assembly for decoder-only-path tests —
  * deliberately tiny and separate from the Python fixture encoder. */
class FlacTestWriter {
  private val buf = scala.collection.mutable.ArrayBuffer[Byte]()
  private var acc = 0
  private var n = 0
  def write(v: Long, bits: Int): Unit = {
    var i = bits - 1
    while (i >= 0) {
      acc = (acc << 1) | ((v >> i) & 1).toInt
      n += 1
      if (n == 8) { buf += acc.toByte; acc = 0; n = 0 }
      i -= 1
    }
  }
  def writeSigned(v: Int, bits: Int): Unit =
    write((v & ((1L << bits) - 1)), bits)
  def align(): Unit = while (n != 0) write(0, 1)
  def crc8Here(): Unit = {
    require(n == 0)
    var c = 0
    buf.foreach { b =>
      c ^= b & 0xff
      for (_ <- 0 until 8)
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
    }
    buf += c.toByte
  }
  def crc16Whole(): Unit = {
    require(n == 0)
    var c = 0
    buf.foreach { b =>
      c ^= (b & 0xff) << 8
      for (_ <- 0 until 8)
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
            else (c << 1) & 0xffff
    }
    buf += (c >> 8).toByte
    buf += (c & 0xff).toByte
  }
  def header(nSamples: Int): Unit = {
    buf ++= "fLaC".getBytes
    write(1, 1); write(0, 7); write(34, 24)
    write(4, 16); write(4, 16)        // min/max blocksize
    write(0, 24); write(0, 24)        // frame sizes unknown
    write(8000, 20)                   // sample rate
    write(0, 3)                       // mono
    write(15, 5)                      // 16 bps
    write(nSamples, 36)
    for (_ <- 0 until 16) write(0, 8) // md5 unknown
  }
  def result: Array[Byte] = { require(n == 0); buf.toArray }
}
