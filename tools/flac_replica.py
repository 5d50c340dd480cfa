#!/usr/bin/env python3
"""Independent from-spec FLAC decoder (RFC 9639) — the differential
oracle half for q162: decodes the checked-in FLAC fixtures to exact
integer PCM with NO code shared with the encoder in
gen_flac_fixtures.py (and obviously none with the Scala decoder in
sources/Flac.scala). Supports what a real subset decoder needs:
metadata-block walk, fixed/variable blocking, all blocksize /
sample-rate / sample-size header codes, independent channels,
CONSTANT / VERBATIM / FIXED 0-4 / LPC subframes, wasted bits, Rice
methods 0 and 1 with arbitrary partition orders and escape codes,
CRC-8 header and CRC-16 frame verification (raises on mismatch).
"""


class BitReader:
    def __init__(self, data, pos=0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0    # bit offset within byte, MSB first

    def read(self, n):
        v = 0
        for _ in range(n):
            byte = self.data[self.pos]
            v = (v << 1) | ((byte >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_signed(self, n):
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self):
        n = 0
        while self.read(1) == 0:
            n += 1
        return n

    def align(self):
        if self.bit:
            self.bit = 0
            self.pos += 1


def _crc8(data):
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data):
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
    return c


def _coded_number(br):
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _residuals(br, blocksize, order):
    method = br.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    out = []
    per = blocksize >> po
    for k in range(1 << po):
        cnt = per - order if k == 0 else per
        p = br.read(pbits)
        if p == escape:
            raw = br.read(5)
            for _ in range(cnt):
                out.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(cnt):
                q = br.read_unary()
                u = (q << p) | (br.read(p) if p else 0)
                out.append((u >> 1) if u % 2 == 0 else -((u + 1) >> 1))
    return out


def _subframe(br, blocksize, bps):
    if br.read(1):
        raise ValueError("subframe padding bit set")
    t = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if t == 0:
        samples = [br.read_signed(eff)] * blocksize
    elif t == 1:
        samples = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= t <= 12:
        order = t - 8
        samples = [br.read_signed(eff) for _ in range(order)]
        res = _residuals(br, blocksize, order)
        coef = FIXED_COEFS[order]
        for i, r in enumerate(res):
            n = order + i
            samples.append(r + sum(c * samples[n - 1 - j]
                                   for j, c in enumerate(coef)))
    elif t >= 32:
        order = t - 31
        samples = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid qlp precision")
        shift = br.read_signed(5)
        coef = [br.read_signed(prec) for _ in range(order)]
        res = _residuals(br, blocksize, order)
        for i, r in enumerate(res):
            n = order + i
            pred = sum(c * samples[n - 1 - j] for j, c in enumerate(coef))
            samples.append(r + (pred >> shift))
    else:
        raise ValueError("reserved subframe type %d" % t)
    return [s << wasted for s in samples]


BLOCKSIZE_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}


def decode_flac(data):
    """-> list of per-sample ints (channels interleaved)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a flac stream")
    pos = 4
    sr = ch = bps = total = None
    while True:
        hdr = data[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        ln = int.from_bytes(data[pos + 1:pos + 4], "big")
        if btype == 0:
            br = BitReader(data, pos + 4)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(48)  # min/max frame size
            sr = br.read(20)
            ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        pos += 4 + ln
        if last:
            break
    if sr is None:
        raise ValueError("missing STREAMINFO")
    out = []
    decoded = 0
    while pos < len(data) and (total == 0 or decoded < total):
        frame_start = pos
        br = BitReader(data, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("bad sync")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bsc = br.read(4)
        src = br.read(4)
        ca = br.read(4)
        ssc = br.read(3)
        br.read(1)  # reserved
        _coded_number(br)
        if bsc == 6:
            blocksize = br.read(8) + 1
        elif bsc == 7:
            blocksize = br.read(16) + 1
        elif bsc in BLOCKSIZE_CODE:
            blocksize = BLOCKSIZE_CODE[bsc]
        elif bsc >= 8:
            blocksize = 256 << (bsc - 8)
        else:
            raise ValueError("reserved blocksize code")
        if src == 12:
            br.read(8)
        elif src in (13, 14):
            br.read(16)
        ssz = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}[ssc]
        hdr_len = br.pos - frame_start
        if _crc8(data[frame_start:frame_start + hdr_len]) != br.read(8):
            raise ValueError("header crc8 mismatch")
        if ca < 8:
            nch = ca + 1
            chans = [_subframe(br, blocksize, ssz) for _ in range(nch)]
        else:
            # stereo decorrelation: left/side, right/side, mid/side
            a = _subframe(br, blocksize, ssz + (1 if ca == 9 else 0))
            b = _subframe(br, blocksize, ssz + (0 if ca == 9 else 1))
            if ca == 8:    # left/side
                chans = [a, [l - s for l, s in zip(a, b)]]
            elif ca == 9:  # side/right
                chans = [[s + r for s, r in zip(a, b)], b]
            elif ca == 10:  # mid/side
                chans = [[(((m << 1) | (s & 1)) + s) >> 1 for m, s in zip(a, b)],
                         [(((m << 1) | (s & 1)) - s) >> 1 for m, s in zip(a, b)]]
            else:
                raise ValueError("reserved channel assignment")
            nch = 2
        br.align()
        if _crc16(data[frame_start:br.pos]) != br.read(16):
            raise ValueError("frame crc16 mismatch")
        for i in range(blocksize):
            for c in range(nch):
                out.append(chans[c][i])
        decoded += blocksize
        pos = br.pos
    # STREAMINFO consistency (mirrors the Scala decoder's r17 check):
    # a non-zero declared total must equal the decoded frame sum.
    if total != 0 and decoded != total:
        raise ValueError("total-samples mismatch")
    return out


if __name__ == "__main__":
    import sys
    s = decode_flac(open(sys.argv[1], "rb").read())
    print(len(s), s[:8])
