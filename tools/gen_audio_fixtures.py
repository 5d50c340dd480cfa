#!/usr/bin/env python3
"""Deterministic PCM16 mono WAV fixtures for the audio-dedup family
(q130/q131): 6 near-dup families x 4 variants (variant 0 is the base;
variants 1-3 change ONE sample each, so the 65-bucket envelope moves in
at most one bucket and the fingerprint hamming stays <= 2) plus 8
unique envelope shapes. The canonical 44-byte WAV layout written here
is parsed back byte-exactly by both javax.sound.sampled (the JVM
operator) and read_wav below (the Python oracle replica).

Usage: python3 tools/gen_audio_fixtures.py [outDir]
(default src/test/resources/graft/audio)
"""
import os
import struct
import sys

BUCKETS = 65
FRAMES_PER_BUCKET = 32
N = BUCKETS * FRAMES_PER_BUCKET
RATE = 8000
M = (1 << 63) - 25


def lcg(seed):
    return (seed % M * 6364136223846793005 + 1442695040888963407) % M


def base_samples(fam):
    """Per-bucket constant-amplitude square wave (amplitude from the
    LCG in [1000, 30000]) -> a staircase RMS envelope."""
    out = []
    s = fam * 524287 + 7
    for b in range(BUCKETS):
        s = lcg(s + b * 97)
        amp = 1000 + s % 29001
        for f in range(FRAMES_PER_BUCKET):
            out.append(amp if f % 2 == 0 else -amp)
    return out


def variant(samples, v, fam):
    out = list(samples)
    if v > 0:
        s = lcg(fam * 104729 + v * 4211)
        i = s % N
        out[i] = -30000 + (s >> 16) % 60001
    return out


def unique_samples(u):
    return base_samples(2000 + u * 41)


def write_wav(path, samples):
    data = b"".join(struct.pack("<h", s) for s in samples)
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, RATE, RATE * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)


def read_wav(path):
    """Parse back our own canonical layout -> list of int16 samples."""
    data = open(path, "rb").read()
    n = struct.unpack("<I", data[40:44])[0] // 2
    return list(struct.unpack("<%dh" % n, data[44:44 + 2 * n]))


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    k = 0
    for fam in range(6):
        base = base_samples(fam)
        for v in range(4):
            write_wav(os.path.join(out_dir, "clip_%02d.wav" % k),
                      variant(base, v, fam))
            k += 1
    for u in range(8):
        write_wav(os.path.join(out_dir, "clip_%02d.wav" % k),
                  unique_samples(u))
        k += 1
    print("wrote %d WAVs -> %s" % (k, out_dir))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "src/test/resources/graft/audio")
