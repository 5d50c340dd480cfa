package graft.sources

/** From-spec FLAC decoder (RFC 9639) — the lossless member of the
  * audio decode chain, closing the multimodal stub surface to mp3/mp4
  * sample decode only. FLAC is pure integer arithmetic end-to-end
  * (fixed/LPC prediction + Rice-coded residuals), so the decode is
  * sample-EXACT and differentially oracle-able: the checked-in
  * fixtures (tools/gen_flac_fixtures.py) carry WAV twins with
  * identical samples, and tools/flac_replica.py is an independent
  * Python decoder used by the q162 expected pin.
  *
  * Subset-decoder coverage: metadata-block walk (STREAMINFO parsed,
  * the rest skipped), all blocksize / sample-rate / sample-size
  * header codes, independent channels and the three stereo
  * decorrelation modes, CONSTANT / VERBATIM / FIXED 0-4 / LPC
  * subframes, wasted bits, Rice methods 0 and 1 at arbitrary
  * partition orders incl. escape codes, CRC-8 header and CRC-16 frame
  * verification (a tampered FRAME decodes to `None`, never to wrong
  * samples). STREAMINFO integrity (r17): the declared total-samples
  * count is cross-checked against the decoded frame sum, and the
  * stream MD5 (unencoded interleaved little-endian samples) is
  * verified whenever the encoder wrote one (all-zero = "unknown" per
  * spec, as this repo's fixtures do) and bps is a whole byte count —
  * so metadata tampering is caught except a zero-MD5 total flipped to
  * another exact frame-boundary value, which no checksum in the file
  * covers. The reference stores attachments as opaque blobs
  * (`src/signal/process_incoming_message.rs:53-59` sniffs mime only);
  * decode is engine-side capability beyond it. */
object Flac {

  private final class BitReader(data: Array[Byte], var pos: Int) {
    var bit: Int = 0
    def read(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        v = (v << 1) | ((data(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readInt(n: Int): Int = read(n).toInt
    def readSigned(n: Int): Int = {
      val v = read(n)
      (if ((v >> (n - 1)) != 0) v - (1L << n) else v).toInt
    }
    def readUnary(): Int = {
      var n = 0
      while (read(1) == 0) n += 1
      n
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  private def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= data(i) & 0xff
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
        k += 1
      }
      i += 1
    }
    c
  }

  private def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= (data(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
            else (c << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    c
  }

  private def codedNumber(br: BitReader): Long = {
    val b0 = br.readInt(8)
    if (b0 < 0x80) b0.toLong
    else {
      var n = 0
      while (((b0 << n) & 0x80) != 0) n += 1
      var v = (b0 & (0x7f >> n)).toLong
      var i = 0
      while (i < n - 1) { v = (v << 6) | (br.readInt(8) & 0x3f); i += 1 }
      v
    }
  }

  private val fixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  private def residuals(br: BitReader, blocksize: Int, order: Int): Array[Int] = {
    val method = br.readInt(2)
    require(method <= 1, "reserved residual method")
    val pbits = if (method == 0) 4 else 5
    val escape = (1 << pbits) - 1
    val po = br.readInt(4)
    val out = new Array[Int](blocksize - order)
    val per = blocksize >> po
    var idx = 0
    var k = 0
    while (k < (1 << po)) {
      val cnt = if (k == 0) per - order else per
      val p = br.readInt(pbits)
      if (p == escape) {
        val raw = br.readInt(5)
        var i = 0
        while (i < cnt) {
          out(idx) = if (raw == 0) 0 else br.readSigned(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          val q = br.readUnary().toLong
          val u = (q << p) | (if (p == 0) 0L else br.read(p))
          out(idx) = (if ((u & 1L) == 0L) u >> 1 else -((u + 1) >> 1)).toInt
          idx += 1; i += 1
        }
      }
      k += 1
    }
    require(idx == out.length, "residual partition count mismatch")
    out
  }

  private def subframe(br: BitReader, blocksize: Int, bps: Int): Array[Int] = {
    require(br.readInt(1) == 0, "subframe padding bit set")
    val t = br.readInt(6)
    val wasted = if (br.readInt(1) == 1) br.readUnary() + 1 else 0
    val eff = bps - wasted
    val s = new Array[Int](blocksize)
    if (t == 0) {
      java.util.Arrays.fill(s, br.readSigned(eff))
    } else if (t == 1) {
      var i = 0
      while (i < blocksize) { s(i) = br.readSigned(eff); i += 1 }
    } else if (t >= 8 && t <= 12) {
      val order = t - 8
      var i = 0
      while (i < order) { s(i) = br.readSigned(eff); i += 1 }
      val res = residuals(br, blocksize, order)
      val coef = fixedCoefs(order)
      var n = order
      while (n < blocksize) {
        var pred = 0L
        var j = 0
        while (j < order) { pred += coef(j).toLong * s(n - 1 - j); j += 1 }
        s(n) = res(n - order) + pred.toInt
        n += 1
      }
    } else if (t >= 32) {
      val order = t - 31
      var i = 0
      while (i < order) { s(i) = br.readSigned(eff); i += 1 }
      val prec = br.readInt(4) + 1
      require(prec != 16, "invalid qlp precision")
      val shift = br.readSigned(5)
      val coef = new Array[Int](order)
      i = 0
      while (i < order) { coef(i) = br.readSigned(prec); i += 1 }
      val res = residuals(br, blocksize, order)
      var n = order
      while (n < blocksize) {
        var pred = 0L
        var j = 0
        while (j < order) { pred += coef(j).toLong * s(n - 1 - j); j += 1 }
        s(n) = res(n - order) + (pred >> shift).toInt
        n += 1
      }
    } else throw new IllegalArgumentException(s"reserved subframe type $t")
    if (wasted > 0) {
      var i = 0
      while (i < blocksize) { s(i) = s(i) << wasted; i += 1 }
    }
    s
  }

  /** Decode a FLAC stream to interleaved per-sample ints + (channels,
    * bits per sample); `None` on anything that is not a valid FLAC
    * stream (bad magic, CRC mismatch, reserved codes, truncation). */
  private[graft] def decode(data: Array[Byte]): Option[(Array[Int], Int, Int)] = {
    try {
      if (data.length < 42 || data(0) != 'f' || data(1) != 'L' ||
        data(2) != 'a' || data(3) != 'C') return None
      var pos = 4
      var sr = -1; var ch = 0; var bps = 0; var total = 0L
      var md5 = new Array[Byte](16)
      var last = false
      while (!last) {
        val hdr = data(pos) & 0xff
        last = (hdr & 0x80) != 0
        val btype = hdr & 0x7f
        val len = ((data(pos + 1) & 0xff) << 16) | ((data(pos + 2) & 0xff) << 8) |
          (data(pos + 3) & 0xff)
        if (btype == 0) {
          val br = new BitReader(data, pos + 4)
          br.read(16); br.read(16); br.read(48)
          sr = br.readInt(20)
          ch = br.readInt(3) + 1
          bps = br.readInt(5) + 1
          total = br.read(36)
          var m = 0
          while (m < 16) { md5(m) = br.read(8).toByte; m += 1 }
        }
        pos += 4 + len
      }
      if (sr < 0) return None
      val out = new java.util.ArrayList[Array[Int]]()
      var decoded = 0L
      var nch = ch
      while (pos < data.length && (total == 0L || decoded < total)) {
        val frameStart = pos
        val br = new BitReader(data, pos)
        require(br.readInt(14) == 0x3ffe, "bad sync")
        br.read(1); br.read(1)
        val bsc = br.readInt(4)
        val src = br.readInt(4)
        val ca = br.readInt(4)
        val ssc = br.readInt(3)
        br.read(1)
        codedNumber(br)
        val blocksize = bsc match {
          case 6 => br.readInt(8) + 1
          case 7 => br.readInt(16) + 1
          case 1 => 192
          case b if b >= 2 && b <= 5 => 576 << (b - 2)
          case b if b >= 8 => 256 << (b - 8)
          case _ => throw new IllegalArgumentException("reserved blocksize")
        }
        src match {
          case 12 => br.read(8)
          case 13 | 14 => br.read(16)
          case _ => ()
        }
        val ssz = ssc match {
          case 0 => bps
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case 7 => 32
          case _ => throw new IllegalArgumentException("reserved sample size")
        }
        require(crc8(data, frameStart, br.pos) == br.readInt(8),
          "header crc8 mismatch")
        val chans: Array[Array[Int]] =
          if (ca < 8) Array.fill(ca + 1)(subframe(br, blocksize, ssz))
          else {
            val a = subframe(br, blocksize, ssz + (if (ca == 9) 1 else 0))
            val b = subframe(br, blocksize, ssz + (if (ca == 9) 0 else 1))
            ca match {
              case 8 => Array(a, Array.tabulate(blocksize)(i => a(i) - b(i)))
              case 9 => Array(Array.tabulate(blocksize)(i => a(i) + b(i)), b)
              case 10 => Array(
                Array.tabulate(blocksize)(i => (((a(i) << 1) | (b(i) & 1)) + b(i)) >> 1),
                Array.tabulate(blocksize)(i => (((a(i) << 1) | (b(i) & 1)) - b(i)) >> 1))
              case _ => throw new IllegalArgumentException("reserved channels")
            }
          }
        nch = chans.length
        br.align()
        require(crc16(data, frameStart, br.pos) == br.readInt(16),
          "frame crc16 mismatch")
        val inter = new Array[Int](blocksize * nch)
        var i = 0
        while (i < blocksize) {
          var c = 0
          while (c < nch) { inter(i * nch + c) = chans(c)(i); c += 1 }
          i += 1
        }
        out.add(inter)
        decoded += blocksize
        pos = br.pos
      }
      // STREAMINFO consistency: the declared total must equal the sum of
      // frame blocksizes exactly (a tampered 36-bit total that does not
      // land on a frame boundary, or exceeds the stream, decodes to None).
      require(total == 0L || decoded == total, "total-samples mismatch")
      val totalLen = { var t = 0; out.forEach(a => t += a.length); t }
      val all = new Array[Int](totalLen)
      var off = 0
      out.forEach { a => System.arraycopy(a, 0, all, off, a.length); off += a.length }
      // STREAMINFO MD5 (over the unencoded interleaved little-endian
      // samples) verified when present; all-zero means "unknown" per the
      // spec. Only whole-byte sample sizes are checked — sub-byte packing
      // is out of the subset this decoder accepts from real encoders.
      if (md5.exists(_ != 0) && bps % 8 == 0) {
        val bytesPer = bps / 8
        val dig = java.security.MessageDigest.getInstance("MD5")
        val buf = new Array[Byte](bytesPer)
        var s = 0
        while (s < all.length) {
          var b = 0
          while (b < bytesPer) { buf(b) = ((all(s) >> (8 * b)) & 0xff).toByte; b += 1 }
          dig.update(buf)
          s += 1
        }
        require(java.util.Arrays.equals(dig.digest(), md5), "stream md5 mismatch")
      }
      Some((all, nch, bps))
    } catch { case _: Exception => None }
  }

  /** 16-bit LE interleaved PCM bytes + channel count — the same
    * contract as `Multimodal.jdkPcm`/`imaAdpcmPcm`, so FLAC rides the
    * whole existing feature chain (q76 envelopes, q130 fingerprints).
    * Sources at other bit depths shift to 16 (lossless at 16, the
    * fixture depth). */
  def pcm16(content: Array[Byte]): Option[(Array[Byte], Int)] =
    decode(content).map { case (samples, ch, bps) =>
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        val s =
          if (bps == 16) samples(i)
          else if (bps > 16) samples(i) >> (bps - 16)
          else samples(i) << (16 - bps)
        bytes(2 * i) = (s & 0xff).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      (bytes, ch)
    }
}
