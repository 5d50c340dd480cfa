#!/usr/bin/env python3
"""Deterministic FLAC fixtures for the lossless-codec decode family
(q162): the q130 audio family scheme (6 near-dup families x 4
one-sample variants + 8 unique envelope shapes), each clip written
TWICE — clip_XX.flac (this file's from-spec FLAC encoder) and
clip_XX.wav (the canonical 44-byte PCM16 layout from
gen_audio_fixtures) with IDENTICAL samples, so the Scala spec can
assert the FLAC decode is byte-identical to the JDK WAV decode.
Plus const_1234.flac: every sample exactly 1234 via CONSTANT
subframes only — the closed-form block the spec checks the way q76
checks IMA-ADPCM predictor blocks.

The encoder is written from the public FLAC format spec (RFC 9639):
fixed-blocksize streams, mono 16-bit, frames cycling through
VERBATIM / FIXED order 1 / FIXED order 2 / FIXED order 3 / LPC order 2
subframes (CONSTANT whenever a block is genuinely constant), Rice
method 0 residuals at partition order 0 and 1, real CRC-8 / CRC-16.
FLAC is lossless integer arithmetic end-to-end, so the decoded PCM is
sample-exact — the differential oracle (tools/flac_replica.py, an
INDEPENDENT decoder) and the Scala decoder must both reproduce the
input samples bit-for-bit.

Usage: python3 tools/gen_flac_fixtures.py [outDir]
(default src/test/resources/graft/flac)
"""
import os
import sys

from gen_audio_fixtures import (BUCKETS, FRAMES_PER_BUCKET, RATE,
                                base_samples, variant, unique_samples,
                                write_wav)

N = BUCKETS * FRAMES_PER_BUCKET
BS = 512  # frame block size (last frame smaller)


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_signed(self, val, nbits):
        self.write(val & ((1 << nbits) - 1), nbits)

    def align(self):
        while self.n:
            self.write(0, 1)


def crc8(data):
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data):
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def utf8_number(bw, n):
    """Frame-number coding (the UTF-8-style scheme from the spec)."""
    if n < 0x80:
        bw.write(n, 8)
    elif n < 0x800:
        bw.write(0xC0 | (n >> 6), 8)
        bw.write(0x80 | (n & 0x3F), 8)
    else:
        bw.write(0xE0 | (n >> 12), 8)
        bw.write(0x80 | ((n >> 6) & 0x3F), 8)
        bw.write(0x80 | (n & 0x3F), 8)


def zigzag(r):
    return (r << 1) if r >= 0 else (-(r << 1) - 1)


def write_rice_partition(bw, residuals, p):
    for r in residuals:
        u = zigzag(r)
        q = u >> p
        bw.write(0, q)       # unary: q zeros ...
        bw.write(1, 1)       # ... then a one
        if p:
            bw.write(u & ((1 << p) - 1), p)


def rice_param(residuals):
    mx = max((zigzag(r) for r in residuals), default=0)
    # keep unary quotients short; never the 0b1111 escape
    p = max(0, mx.bit_length() - 2)
    return min(p, 14)


def write_residuals(bw, residuals, order, blocksize, part_order):
    """Rice method 0, the given partition order (every partition gets
    its own parameter, first partition is short by `order`)."""
    bw.write(0, 2)            # coding method 0: 4-bit Rice
    bw.write(part_order, 4)
    nparts = 1 << part_order
    per = blocksize >> part_order
    idx = 0
    for k in range(nparts):
        cnt = per - order if k == 0 else per
        part = residuals[idx:idx + cnt]
        idx += cnt
        p = rice_param(part)
        bw.write(p, 4)
        write_rice_partition(bw, part, p)
    assert idx == len(residuals)


FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def write_subframe(bw, block, kind, part_order):
    bw.write(0, 1)  # padding
    if len(set(block)) == 1 and kind != "verbatim":
        bw.write(0, 6)   # CONSTANT
        bw.write(0, 1)   # no wasted bits
        bw.write_signed(block[0], 16)
        return
    if kind == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for s in block:
            bw.write_signed(s, 16)
    elif kind.startswith("fixed"):
        order = int(kind[-1])
        bw.write(8 | order, 6)
        bw.write(0, 1)
        for s in block[:order]:
            bw.write_signed(s, 16)
        coef = FIXED_COEF[order]
        res = [block[i] - sum(c * block[i - 1 - j] for j, c in enumerate(coef))
               for i in range(order, len(block))]
        write_residuals(bw, res, order, len(block), part_order)
    elif kind == "lpc2":
        order, shift, precision = 2, 5, 15
        coef = [50, -20]  # pred = (50*x[i-1] - 20*x[i-2]) >> 5
        bw.write(0x20 | (order - 1), 6)
        bw.write(0, 1)
        for s in block[:order]:
            bw.write_signed(s, 16)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coef:
            bw.write_signed(c, precision)
        res = [block[i] - ((sum(c * block[i - 1 - j]
                                for j, c in enumerate(coef))) >> shift)
               for i in range(order, len(block))]
        write_residuals(bw, res, order, len(block), part_order)
    else:
        raise ValueError(kind)


KINDS = ["verbatim", "fixed1", "fixed2", "fixed3", "lpc2"]


def encode_flac(samples, kinds=None):
    out = bytearray()
    out += b"fLaC"
    si = BitWriter()
    si.write(1, 1)            # last metadata block
    si.write(0, 7)            # STREAMINFO
    si.write(34, 24)
    si.write(BS, 16)          # min block size
    si.write(BS, 16)          # max block size
    si.write(0, 24)           # min frame size unknown
    si.write(0, 24)           # max frame size unknown
    si.write(RATE, 20)
    si.write(0, 3)            # channels - 1
    si.write(15, 5)           # bits per sample - 1
    si.write(len(samples), 36)
    for _ in range(16):
        si.write(0, 8)        # MD5 unknown
    out += si.buf
    nframes = (len(samples) + BS - 1) // BS
    for fi in range(nframes):
        block = samples[fi * BS:(fi + 1) * BS]
        bw = BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)        # reserved
        bw.write(0, 1)        # fixed blocksize stream
        bw.write(0b0111, 4)   # blocksize: 16 bits at header end
        bw.write(0, 4)        # sample rate: from STREAMINFO
        bw.write(0, 4)        # channels: mono independent
        bw.write(0b100, 3)    # 16 bits per sample
        bw.write(0, 1)        # reserved
        utf8_number(bw, fi)
        bw.write(len(block) - 1, 16)
        bw.buf.append(crc8(bw.buf))
        kind = (kinds or KINDS)[fi % len(kinds or KINDS)]
        # exercise partition order 1 on even frames when divisible
        po = 1 if fi % 2 == 0 and len(block) % 2 == 0 and \
            (len(block) >> 1) > 4 else 0
        write_subframe(bw, block, kind, po)
        bw.align()
        c16 = crc16(bw.buf)
        bw.buf.append(c16 >> 8)
        bw.buf.append(c16 & 0xFF)
        out += bw.buf
    return bytes(out)


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    clips = []
    k = 0
    for fam in range(6):
        base = base_samples(fam)
        for v in range(4):
            clips.append(("clip_%02d" % k, variant(base, v, fam)))
            k += 1
    for u in range(8):
        clips.append(("clip_%02d" % k, unique_samples(u)))
        k += 1
    for name, samples in clips:
        with open(os.path.join(out_dir, name + ".flac"), "wb") as f:
            f.write(encode_flac(samples))
        write_wav(os.path.join(out_dir, name + ".wav"), samples)
    # closed-form CONSTANT-only clip: every sample exactly 1234
    const = [1234] * N
    with open(os.path.join(out_dir, "const_1234.flac"), "wb") as f:
        f.write(encode_flac(const, kinds=["fixed2"]))  # collapses to CONSTANT
    # self-check: the INDEPENDENT replica decoder must reproduce every
    # input sample bit-for-bit (encoder and decoder share no code)
    import flac_replica
    for name, samples in clips + [("const_1234", const)]:
        dec = flac_replica.decode_flac(
            open(os.path.join(out_dir, name + ".flac"), "rb").read())
        assert dec == samples, "replica mismatch on %s" % name
    print("wrote %d flac clips (+wav twins) to %s, replica-verified"
          % (len(clips) + 1, out_dir))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "src/test/resources/graft/flac")
