#!/usr/bin/env python3
"""Deterministic 24-bit BMP fixtures for the image-dedup family
(q128/q129): 6 near-dup families x 4 variants (variant 0 is the base;
variants 1-3 flip ONE pixel each, so dHash hamming stays <= 2 within a
family) plus 8 unique LCG-textured images. BMP BI_RGB bottom-up is
byte-exact to construct here and losslessly decoded by javax.imageio,
so the Python oracle replica (gen_expected.py q128/q129) reads back the
same pixel values the JVM sees.

Usage: python3 tools/gen_image_fixtures.py [outDir]
(default src/test/resources/graft/images)
"""
import os
import struct
import sys

W, H = 24, 16
M = (1 << 63) - 25  # LCG modulus (inner-mod discipline, engine-portable)


def lcg(seed):
    return (seed % M * 6364136223846793005 + 1442695040888963407) % M


def base_pixels(fam):
    """Deterministic RGB raster for family `fam` (top-down rows)."""
    px = []
    s = fam * 7919 + 13
    for y in range(H):
        row = []
        for x in range(W):
            s = lcg(s + x * 31 + y * 101)
            r = (s >> 5) % 256
            g = (s >> 13) % 256
            b = (s >> 21) % 256
            row.append((r, g, b))
        px.append(row)
    return px


def variant(px, v, fam):
    """Variant v (1-3): flip one pixel to a deterministic new value."""
    out = [list(row) for row in px]
    if v > 0:
        s = lcg(fam * 104729 + v * 2111)
        x = s % W
        y = (s >> 8) % H
        out[y][x] = ((s >> 16) % 256, (s >> 24) % 256, (s >> 32) % 256)
    return out


def unique_pixels(k):
    return base_pixels(1000 + k * 37)


def write_bmp(path, px):
    """24bpp BI_RGB bottom-up, rows padded to 4 bytes."""
    row_bytes = (W * 3 + 3) // 4 * 4
    img_size = row_bytes * H
    with open(path, "wb") as f:
        f.write(b"BM")
        f.write(struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 14 + 40))
        f.write(struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0, img_size,
                            2835, 2835, 0, 0))
        for y in range(H - 1, -1, -1):  # bottom-up
            row = bytearray()
            for x in range(W):
                r, g, b = px[y][x]
                row += bytes((b, g, r))  # BGR
            row += b"\x00" * (row_bytes - len(row))
            f.write(bytes(row))


def read_bmp(path):
    """Parse back our own fixed layout -> top-down [[(r,g,b)]]."""
    data = open(path, "rb").read()
    off = struct.unpack("<I", data[10:14])[0]
    w = struct.unpack("<i", data[18:22])[0]
    h = struct.unpack("<i", data[22:26])[0]
    row_bytes = (w * 3 + 3) // 4 * 4
    px = [[None] * w for _ in range(h)]
    for i in range(h):
        y = h - 1 - i  # bottom-up
        base = off + i * row_bytes
        for x in range(w):
            b, g, r = data[base + 3 * x:base + 3 * x + 3]
            px[y][x] = (r, g, b)
    return px


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    k = 0
    for fam in range(6):
        base = base_pixels(fam)
        for v in range(4):
            write_bmp(os.path.join(out_dir, "img_%02d.bmp" % k),
                      variant(base, v, fam))
            k += 1
    for u in range(8):
        write_bmp(os.path.join(out_dir, "img_%02d.bmp" % k),
                  unique_pixels(u))
        k += 1
    print("wrote %d BMPs -> %s" % (k, out_dir))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "src/test/resources/graft/images")
