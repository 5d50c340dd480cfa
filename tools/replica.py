#!/usr/bin/env python3
"""Independent Python replicas of graft's non-SQL-expressible kernels.

These re-implement the PUBLIC algorithms (murmur3_x86_32, word/char
shingling, MinHash/SimHash/hyperplane LSH, Lloyd's k-means with
quantized-long sums, int8 / product quantization + ADC, hash-BOW
logistic regression) from their specs, INDEPENDENTLY of the Scala
kernels in `src/main/scala/graft/expressions` / `operators`. Two
implementations of the same deterministic algorithm form a differential
oracle (`tools/gen_expected.py` writes the expected outputs the DuckDB
oracle reads): a bug in either side shows up as a hash mismatch in the
driver's correctness gate.

Determinism ground rules mirrored from the Scala side:
  - murmur3_x86_32 is Spark's variant: 4-byte little-endian blocks,
    then a SIGNED per-byte tail (`Murmur3_x86_32.hashUnsafeBytes`).
  - all vector folds are sequential double-precision in array order
    (Python floats are IEEE doubles - bit-identical).
  - `round(x, n)` replicates Spark's Round on doubles: BigDecimal of
    the SHORTEST decimal repr, HALF_UP (Python `repr` produces the
    same shortest repr).
  - k-means / LR partials quantize per-row contributions to scaled
    longs (Math.round resp. Math.rint) and sum as exact ints.
"""
import math
import re
from decimal import Decimal, ROUND_HALF_UP

M32 = 0xFFFFFFFF

# --- murmur3_x86_32, Spark variant ----------------------------------


def _rotl32(x, n):
    return ((x << n) | (x >> (32 - n))) & M32


def _mix_k1(k1):
    k1 = (k1 * 0xCC9E2D51) & M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & M32


def _mix_h1(h1, k1):
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & M32


def _fmix(h1, length):
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M32
    h1 ^= h1 >> 16
    return h1


def _signed32(x):
    return x - (1 << 32) if x & 0x80000000 else x


def mm3_int(i, seed):
    """Murmur3_x86_32.hashInt(i, seed) -> signed 32-bit int."""
    h1 = _mix_h1(seed & M32, _mix_k1(i & M32))
    return _signed32(_fmix(h1, 4))


def mm3_bytes(b, seed):
    """Murmur3_x86_32.hashUnsafeBytes(b, seed) -> signed 32-bit int.
    Spark's historical variant: whole 4-byte LE ints, then the tail
    bytes one at a time as SIGNED bytes through the int mixer."""
    n = len(b)
    aligned = n - n % 4
    h1 = seed & M32
    for i in range(0, aligned, 4):
        blk = b[i] | (b[i + 1] << 8) | (b[i + 2] << 16) | (b[i + 3] << 24)
        h1 = _mix_h1(h1, _mix_k1(blk))
    for i in range(aligned, n):
        byte = b[i] - 256 if b[i] >= 128 else b[i]
        h1 = _mix_h1(h1, _mix_k1(byte & M32))
    return _signed32(_fmix(h1, n))


def mm3_str(s, seed):
    return mm3_bytes(s.encode("utf-8"), seed)


# --- Spark round / Java rounding helpers ----------------------------


def spark_round(x, scale):
    """Spark Round on DoubleType: BigDecimal(shortest repr), HALF_UP."""
    if x is None or math.isnan(x) or math.isinf(x):
        return x
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def r6(x):
    return spark_round(x, 6)


def java_round(x):
    """java.lang.Math.round(double) = floor(x + 0.5) as long."""
    return math.floor(x + 0.5)


def java_rint(x):
    """java.lang.Math.rint = round-half-even to integral double."""
    f = math.floor(x)
    d = x - f
    if d < 0.5:
        return int(f)
    if d > 0.5:
        return int(f) + 1
    return int(f) if int(f) % 2 == 0 else int(f) + 1


# --- text kernels ----------------------------------------------------

_WS = re.compile(r"\s+", re.ASCII)


def words(text):
    """Spark split(trim(text), '\\s+'): trim strips SPACES only; split
    keeps leading/trailing empty tokens from non-space whitespace."""
    if text is None:
        return None
    return _WS.split(text.strip(" "))


def word_shingles(ws, k):
    """WordShingles kernel: distinct word k-grams joined by spaces,
    first-occurrence order; fewer than k words -> the whole text."""
    if len(ws) < k:
        return list(dict.fromkeys([" ".join(ws)]))
    return list(dict.fromkeys(
        " ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)))


def char_shingles(text, k):
    if len(text) < k:
        return [text]
    return list(dict.fromkeys(
        text[i:i + k] for i in range(len(text) - k + 1)))


def minhash_sig(shingles, n_hashes):
    """MinHashSig kernel: per seed p, min murmur3(shingle, p)."""
    mins = [2147483647] * n_hashes
    for s in shingles:
        b = s.encode("utf-8")
        for p in range(n_hashes):
            h = mm3_bytes(b, p)
            if h < mins[p]:
                mins[p] = h
    return mins


def simhash_bits(distinct_words, bits):
    """SimHashBits kernel: signed-vote sign per bit, MSB-first packing
    (acc*2+bit) -> SIGNED 64-bit long for bits=64."""
    votes = [0] * bits
    for w in distinct_words:
        b = w.encode("utf-8")
        for p in range(bits):
            if mm3_bytes(b, p) >= 0:
                votes[p] += 1
            else:
                votes[p] -= 1
    acc = 0
    for p in range(bits):
        acc = acc * 2 + (1 if votes[p] > 0 else 0)
    if bits == 64 and acc & (1 << 63):
        acc -= 1 << 64
    return acc


def fingerprint(ws):
    """FingerprintHash kernel: floorMod(acc*1000003 + murmur3(w,42), 1e9+7)."""
    acc = 0
    for w in ws:
        h = mm3_str(w, 42)
        acc = (acc * 1000003 + h) % 1000000007
    return acc


def hash_embed(ws, dim):
    """HashEmbed kernel: murmur3(w,42) bucket counts, L2-normalized."""
    counts = [0.0] * dim
    for w in ws:
        counts[mm3_str(w, 42) % dim] += 1.0
    ss = 0.0
    for c in counts:
        ss += c * c
    if ss > 0.0:
        n = math.sqrt(ss)
        counts = [c / n for c in counts]
    return counts


# --- vector kernels --------------------------------------------------


def dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def norm2(a):
    return math.sqrt(dot(a, a))


def cosine6(a, b):
    return r6(dot(a, b) / (norm2(a) * norm2(b)))


def l2_dist_sq(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        d = x - y
        acc += d * d
    return acc


def hyperplane_coef(i, p):
    """coefficient for dim i of plane p: murmur3 int mapped to [-1,1]."""
    return (mm3_int(i, p) % 2000001) / 1000000.0 - 1.0


_COEF_CACHE = {}


def _coefs(dim, p):
    key = (dim, p)
    if key not in _COEF_CACHE:
        _COEF_CACHE[key] = [hyperplane_coef(i, p) for i in range(dim)]
    return _COEF_CACHE[key]


def hyperplane_bits(vec, bits):
    out = []
    for p in range(bits):
        coefs = _coefs(len(vec), p)
        proj = 0.0
        for i, x in enumerate(vec):
            proj += x * coefs[i]
        out.append(1 if proj >= 0.0 else 0)
    return out


def hyperplane_bucket(vec, bits):
    bs = hyperplane_bits(vec, bits)
    bucket = 0
    for p in range(bits):
        if bs[p]:
            bucket |= 1 << (bits - 1 - p)
    return bucket


def int8_encode(vec):
    """Int8Encode kernel -> (codes 0..255 list, vmin, scale)."""
    if not vec:
        return [], 0.0, 0.0
    mn = min(vec)
    mx = max(vec)
    scale = (mx - mn) / 255.0
    if scale > 0.0:
        codes = [java_round((x - mn) / scale) & 0xFF for x in vec]
    else:
        codes = [0] * len(vec)
    return codes, mn, scale


def int8_cosine(codes, vmin, scale, probe):
    d = 0.0
    nx = 0.0
    pn = norm2(probe)
    for i in range(min(len(codes), len(probe))):
        x = float(codes[i]) * scale + vmin
        d += x * probe[i]
        nx += x * x
    if nx == 0.0 or pn == 0.0:
        return 0.0
    return d / (math.sqrt(nx) * pn)


# --- k-means (Lloyd's with quantized-long means) ---------------------


def assign(vec, cents):
    """argmin l2_dist_sq, first-match tie-break (lowest cluster id)."""
    best = None
    bi = 0
    for i, c in enumerate(cents):
        d = l2_dist_sq(vec, c)
        if best is None or d < best:
            best = d
            bi = i
    return bi, best


def kmeans(items, k, max_iter):
    """items: list of (id, vector(list of double)) - Lloyd's loop with
    seeds = k lowest-id vectors and CentroidScaledAggregator means
    (Math.round(v*1e12) long sums; mean = (sum/1e12)/n in doubles).
    Returns (centroids, iterations)."""
    srt = sorted(items, key=lambda t: t[0])
    cents = [list(v) for _, v in srt[:k]]
    it = 0
    converged = False
    while not converged and it < max_iter:
        sums = [None] * len(cents)
        counts = [0] * len(cents)
        for _, v in items:
            ci, _ = assign(v, cents)
            if sums[ci] is None:
                sums[ci] = [0] * len(v)
            s = sums[ci]
            for j, x in enumerate(v):
                s[j] += java_round(x * 1e12)
            counts[ci] += 1
        nxt = []
        for ci, c in enumerate(cents):
            if counts[ci] == 0:
                nxt.append(list(c))
            else:
                n = counts[ci]
                nxt.append([float(s) / 1e12 / n for s in sums[ci]])
        converged = cents == nxt
        cents = nxt
        it += 1
    return cents, it


# --- product quantization -------------------------------------------


def pq_train(items, dim, m, k, max_iter):
    """Per-subspace codebooks via kmeans over sliced vectors."""
    dsub = dim // m
    books = []
    for j in range(m):
        sub = [(i, v[j * dsub:(j + 1) * dsub]) for i, v in items]
        cents, _ = kmeans(sub, k, max_iter)
        books.append(cents)
    return {"m": m, "dsub": dsub, "books": books}


def pq_encode(vec, model):
    dsub = model["dsub"]
    return [assign(vec[j * dsub:(j + 1) * dsub], model["books"][j])[0]
            for j in range(model["m"])]


def pq_adc_tables(probe, model):
    dsub = model["dsub"]
    tables = []
    for j, book in enumerate(model["books"]):
        lut = []
        for cent in book:
            s = 0.0
            for i in range(dsub):
                d = probe[j * dsub + i] - cent[i]
                s += d * d
            lut.append(s)
        tables.append(lut)
    return tables


def pq_adc_dist(codes, tables):
    """Left-fold sum of table lookups, rounded to 6 dp."""
    acc = tables[0][codes[0]]
    for j in range(1, len(tables)):
        acc = acc + tables[j][codes[j]]
    return r6(acc)


# --- logistic regression (QualityClassifier.train) -------------------


def lr_train(data, dim, iters, lr):
    """data: list of (y, x[dim]); full-batch GD with rint(1e12)-long
    gradient sums - mirrors QualityClassifier.train."""
    n = float(len(data))
    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        g = [0] * (dim + 1)
        for y, x in data:
            z = b
            for j in range(dim):
                z += w[j] * x[j]
            p = 1.0 / (1.0 + math.exp(-z))
            d = p - y
            for j in range(dim):
                g[j] += java_rint(d * x[j] * 1e12)
            g[dim] += java_rint(d * 1e12)
        for j in range(dim):
            w[j] -= lr * (g[j] / 1e12) / n
        b -= lr * (g[dim] / 1e12) / n
    return w, b


def sigmoid6(z):
    return r6(1.0 / (1.0 + math.exp(-z)))


# --- xxhash64 + HyperLogLog++ (the q29 estimator) --------------------

M64 = (1 << 64) - 1
_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5


def _rotl64(x, n):
    return ((x << n) | (x >> (64 - n))) & M64


def xxh64_long(v, seed=42):
    """XXH64 of one 8-byte long (Spark's XxHash64 for LongType,
    seed 42 — what approx_count_distinct hashes with)."""
    h = (seed + _XXP5 + 8) & M64
    k1 = (v & M64) * _XXP2 & M64
    k1 = _rotl64(k1, 31)
    k1 = k1 * _XXP1 & M64
    h ^= k1
    h = (_rotl64(h, 27) * _XXP1 + _XXP4) & M64
    h ^= h >> 33
    h = h * _XXP2 & M64
    h ^= h >> 29
    h = h * _XXP3 & M64
    h ^= h >> 32
    return h


_HLL = None


def _hll_constants():
    global _HLL
    if _HLL is None:
        import json
        import os
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "hllpp_constants.json")
        _HLL = json.load(open(path))
    return _HLL


def hllpp_count(values, rsd=0.05):
    """HyperLogLog++ distinct estimate of a long column — the published
    algorithm (Heule et al. 2013): p = ceil(2·log2(1.106/rsd)) registers
    of max leading-zero rank over xxh64, harmonic-mean raw estimate,
    K=6 sliding-window nearest-neighbor bias interpolation (squared
    distance) when e < 5m, linear counting when zero registers exist and
    H ≤ threshold (or e ≤ 2.5m). Constants for p=9 (the 0.05 default)
    from the paper's appendix (`tools/hllpp_constants.json`). Matches
    Spark's approx_count_distinct exactly across all three regimes
    (validated on 14 cardinalities, 5 → 100k)."""
    import bisect
    t = _hll_constants()
    p = math.ceil(2.0 * math.log(1.106 / rsd) / math.log(2.0))
    assert p == 9, "constants checked in for the rsd=0.05 default only"
    m = 1 << p
    w_padding = 1 << (p - 1)
    regs = [0] * m
    for v in values:
        x = xxh64_long(v)
        idx = x >> (64 - p)
        w = ((x << p) | w_padding) & M64
        rank = 64 - w.bit_length() + 1
        if rank > regs[idx]:
            regs[idx] = rank
    z_inv = 0.0
    zeros = 0.0
    for r in regs:
        z_inv += 2.0 ** -r
        if r == 0:
            zeros += 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / z_inv

    def bias_corrected(e):
        if not e < 5.0 * m:
            return e
        ests = t["RAW_ESTIMATE_P9"]
        biases = t["BIAS_P9"]
        n = len(ests)
        i = bisect.bisect_left(ests, e)
        low = max(i - 6 + 1, 0)
        high = min(low + 6, n)

        def dist(j):
            d = e - ests[j]
            return d * d

        while high < n and dist(high) < dist(low):
            low += 1
            high += 1
        return e - sum(biases[low:high]) / (high - low)

    if zeros > 0:
        h = m * math.log(m / zeros)
        est = h if (h <= t["THRESHOLDS"][p - 4] or e <= 2.5 * m) \
            else bias_corrected(e)
    else:
        est = bias_corrected(e)
    return java_round(est)


# --- java.util.Random (the MLlib BRP-LSH plane source) ---------------


class JavaRandom:
    """Bit-exact java.util.Random: 48-bit LCG + the Knuth polar
    nextGaussian (pair-cached). MLlib's BucketedRandomProjectionLSH
    draws its random unit vectors from exactly this generator
    (seed 42 in `Similarity.mllibAnnJoin`), which is what makes the
    q38 expected output reproducible outside the JVM."""

    MASK48 = (1 << 48) - 1

    def __init__(self, seed):
        self.seed = (seed ^ 0x5DEECE66D) & self.MASK48
        self.have = False
        self.next_g = 0.0

    def _next(self, bits):
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & self.MASK48
        return self.seed >> (48 - bits)

    def next_double(self):
        return ((self._next(26) << 27) + self._next(27)) * (2.0 ** -53)

    def next_gaussian(self):
        if self.have:
            self.have = False
            return self.next_g
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0.0 < s < 1.0:
                break
        mult = math.sqrt(-2 * math.log(s) / s)
        self.next_g = v2 * mult
        self.have = True
        return v1 * mult


def brp_unit_vectors(seed, n_tables, dim):
    """MLlib createRawLSHModel: n_tables gaussian vectors drawn in
    order from one JavaRandom, each L2-normalized."""
    rng = JavaRandom(seed)
    planes = []
    for _ in range(n_tables):
        arr = [rng.next_gaussian() for _ in range(dim)]
        n = math.sqrt(sum_sq_seq(arr))
        planes.append([x / n for x in arr])
    return planes


def sum_sq_seq(xs):
    acc = 0.0
    for x in xs:
        acc += x * x
    return acc


# --- OPQ (Pq.trainOpq) — bit-for-bit replay of the Scala trainer -----


def mat_vec(rotation, v):
    """Sequential fold per output row — identical op order to the
    MatVec kernel / Pq.rotateVec."""
    out = []
    for row in rotation:
        acc = 0.0
        for i in range(len(row)):
            acc += row[i] * v[i]
        out.append(acc)
    return out


def lifted_moments(items, dim):
    """(sxx row-major, sx, n) over java_round(x*1e6) lifts — Python
    ints are exact, matching the addExact/multiplyExact long partials
    (Scala throws when a lifted product exceeds Long.MaxValue, i.e.
    |component| >~ 3037; no guard needed here)."""
    sxx = [0] * (dim * dim)
    sx = [0] * dim
    n = 0
    for _, v in items:
        x6 = [java_round(x * 1e6) for x in v]
        for i in range(dim):
            base = i * dim
            xi = x6[i]
            for j in range(dim):
                sxx[base + j] += xi * x6[j]
            sx[i] += xi
        n += 1
    return sxx, sx, n


def jacobi_eigen(m_in, sweeps=12):
    """Cyclic Jacobi, FIXED sweeps, no early exit — transliterated from
    Pq.jacobiEigen op for op (IEEE doubles, correctly-rounded sqrt)."""
    n = len(m_in)
    a = [list(row) for row in m_in]
    v = [[1.0 if i == j else 0.0 for j in range(n)] for i in range(n)]
    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                apq = a[p][q]
                if apq != 0.0:
                    theta = (a[q][q] - a[p][p]) / (2.0 * apq)
                    if theta >= 0.0:
                        t = 1.0 / (theta + math.sqrt(1.0 + theta * theta))
                    else:
                        t = 1.0 / (theta - math.sqrt(1.0 + theta * theta))
                    c = 1.0 / math.sqrt(1.0 + t * t)
                    s = t * c
                    for k in range(n):
                        akp = a[k][p]
                        akq = a[k][q]
                        a[k][p] = c * akp - s * akq
                        a[k][q] = s * akp + c * akq
                    for k in range(n):
                        apk = a[p][k]
                        aqk = a[q][k]
                        a[p][k] = c * apk - s * aqk
                        a[q][k] = s * apk + c * aqk
                    for k in range(n):
                        vkp = v[k][p]
                        vkq = v[k][q]
                        v[k][p] = c * vkp - s * vkq
                        v[k][q] = s * vkp + c * vkq
    return [a[i][i] for i in range(n)], v


def allocation_rotation(vals, vecs, dim, m):
    """Ge et al. eigenvalue allocation: descending-eigenvalue order,
    each eigenvector to the non-full bucket with the smallest EXACT
    product (fractions.Fraction == the Scala BigDecimal compare);
    negative eigenvalues clamp to 0, ties to the lowest bucket."""
    from fractions import Fraction
    dsub = dim // m
    order = sorted(range(dim), key=lambda j: (-vals[j], j))
    prod = [Fraction(1)] * m
    cnt = [0] * m
    rows = [None] * dim
    for j in order:
        lam = vals[j] if vals[j] > 0.0 else 0.0
        best = -1
        for b in range(m):
            if cnt[b] < dsub and (best < 0 or prod[b] < prod[best]):
                best = b
        prod[best] = prod[best] * Fraction(lam)
        rows[best * dsub + cnt[best]] = [vecs[i][j] for i in range(dim)]
        cnt[best] += 1
    return rows


def reconstruction_cross(items, rotation, model, dim):
    """Exact 1e6-lifted M = sum y6 x6^T, y = PQ reconstruction of the
    rotated vector (argmin per subspace, first-match ties)."""
    dsub = model["dsub"]
    acc = [0] * (dim * dim)
    for _, v in items:
        rx = mat_vec(rotation, v)
        y = []
        for j, book in enumerate(model["books"]):
            best = None
            bi = 0
            for ci, cent in enumerate(book):
                d2 = 0.0
                for i in range(dsub):
                    d = rx[j * dsub + i] - cent[i]
                    d2 += d * d
                if best is None or d2 < best:
                    best = d2
                    bi = ci
            y.extend(book[bi])
        x6 = [java_round(x * 1e6) for x in v]
        for a_ in range(dim):
            y6 = java_round(y[a_] * 1e6)
            base = a_ * dim
            for b_ in range(dim):
                acc[base + b_] += y6 * x6[b_]
    return acc


def polar_rotation(mlong, dim):
    """R = M (M^T M)^(-1/2) via jacobi_eigen — Pq.polarRotation."""
    md = [[float(mlong[i * dim + j]) for j in range(dim)] for i in range(dim)]
    mtm = []
    for i in range(dim):
        row = []
        for j in range(dim):
            s = 0.0
            for k in range(dim):
                s += md[k][i] * md[k][j]
            row.append(s)
        mtm.append(row)
    vals, v = jacobi_eigen(mtm)
    lmax = 0.0
    for l in vals:
        if l > lmax:
            lmax = l
    if lmax <= 0.0:
        return [[1.0 if i == j else 0.0 for j in range(dim)]
                for i in range(dim)]
    order = sorted(range(dim), key=lambda j: (-vals[j], j))
    ucols = []
    used_order = []
    for j in order:
        if vals[j] > lmax * 1e-10:
            sigma = math.sqrt(vals[j])
            u = []
            for i in range(dim):
                s = 0.0
                for k in range(dim):
                    s += md[i][k] * v[k][j]
                u.append(s / sigma)
            ucols.append(u)
            used_order.append(j)
    for j in order:
        if not (vals[j] > lmax * 1e-10):
            used_order.append(j)
    gram_schmidt_rows(ucols)
    allc = list(ucols)
    while len(allc) < dim:
        best_w = None
        best_n2 = -1.0
        for t in range(dim):
            w = [1.0 if i == t else 0.0 for i in range(dim)]
            for u in allc:
                d = 0.0
                for k in range(dim):
                    d += w[k] * u[k]
                for k in range(dim):
                    w[k] = w[k] - d * u[k]
            n2 = 0.0
            for k in range(dim):
                n2 += w[k] * w[k]
            if n2 > best_n2:
                best_n2 = n2
                best_w = w
        inv = 1.0 / math.sqrt(best_n2)
        allc.append([x * inv for x in best_w])
    out = []
    for i in range(dim):
        row = []
        for j in range(dim):
            s = 0.0
            for p in range(dim):
                s += allc[p][i] * v[j][used_order[p]]
            row.append(s)
        out.append(row)
    gram_schmidt_rows(out)
    return out


def opq_train(items, dim, m, k, max_iter, opq_iters=0):
    """Pq.trainOpq: covariance eigen -> allocation rotation -> PQ on
    rotated vectors -> opq_iters Procrustes alternations."""
    sxx, sx, n = lifted_moments(items, dim)
    cov = [[(float(sxx[i * dim + j]) - float(sx[i]) * float(sx[j]) / float(n))
            / float(n) for j in range(dim)] for i in range(dim)]
    vals, vecs = jacobi_eigen(cov)
    rot = allocation_rotation(vals, vecs, dim, m)

    def train_books(r):
        rotated = [(i, mat_vec(r, v)) for i, v in items]
        return pq_train(rotated, dim, m, k, max_iter)

    model = train_books(rot)
    for _ in range(opq_iters):
        rot = polar_rotation(
            reconstruction_cross(items, rot, model, dim), dim)
        model = train_books(rot)
    return rot, model


def gram_schmidt_rows(r):
    """Pq.gramSchmidtRows — modified Gram-Schmidt over rows in row
    order, in place; zero rows left untouched."""
    dim = len(r)
    for i in range(dim):
        for p in range(i):
            d = 0.0
            for k in range(dim):
                d += r[i][k] * r[p][k]
            for k in range(dim):
                r[i][k] = r[i][k] - d * r[p][k]
        n2 = 0.0
        for k in range(dim):
            n2 += r[i][k] * r[i][k]
        if n2 > 0.0:
            inv = 1.0 / math.sqrt(n2)
            for k in range(dim):
                r[i][k] = r[i][k] * inv


# --- Vamana graph ANN (operators/Vamana.scala, q172) -----------------
# Everything is exact integer arithmetic over 1e6-lifted vectors, so
# the transliteration has nothing to match but the op order: distances
# are exact int sums, argmins tie-break to the smaller index, and the
# alpha-pruning test is the integer comparison
# alpha_num*d(p*,v) <= alpha_den*d(p,v).

def lift6_vec(v):
    return [java_round(x * 1e6) for x in v]


def vamana_dist2(a, b):
    s = 0
    for x, y in zip(a, b):
        d = x - y
        s += d * d
    return s


def vamana_greedy(adj, vecs, start, q, l):
    """GreedySearch(start, q, L) -> (beam [(dist, idx)] sorted asc,
    visited set). Beam = pool truncated to the L closest."""
    dist = {}

    def d(i):
        if i not in dist:
            dist[i] = vamana_dist2(vecs[i], q)
        return dist[i]

    pool = {start}
    visited = set()
    while True:
        best, best_d = -1, None
        for p in pool:
            if p in visited:
                continue
            dp = d(p)
            if best_d is None or dp < best_d or (dp == best_d and p < best):
                best, best_d = p, dp
        if best < 0:
            break
        visited.add(best)
        pool.update(adj[best])
        if len(pool) > l:
            kept = sorted(((d(p), p) for p in pool))[:l]
            pool = {p for _, p in kept}
    beam = sorted(((d(p), p) for p in pool))[:l]
    return beam, visited


def vamana_robust_prune(p, cands, vecs, alpha_num, alpha_den, r):
    vp = vecs[p]
    pool = sorted((vamana_dist2(vecs[c], vp), c)
                  for c in set(cands) if c != p)
    out = []
    while pool and len(out) < r:
        p_star = pool[0][1]
        out.append(p_star)
        vs = vecs[p_star]
        pool = [(dpv, v) for dpv, v in pool[1:]
                if alpha_num * vamana_dist2(vecs[v], vs) > alpha_den * dpv]
    return out


def vamana_build(vecs, r=16, l=32, alpha_num=12, alpha_den=10):
    """(medoid_idx, adjacency) over vecs in ascending-id order — the
    Vamana.buildShard transliteration (two passes: alpha=1 then alpha)."""
    n = len(vecs)
    dim = len(vecs[0])
    cent = [0] * dim
    for v in vecs:
        for j in range(dim):
            cent[j] += v[j]
    # Math.floorDiv == Python // for any signs
    cent = [c // n for c in cent]
    medoid, best_d = 0, None
    for i in range(n):
        dd = vamana_dist2(vecs[i], cent)
        if best_d is None or dd < best_d:
            medoid, best_d = i, dd
    adj = [[] for _ in range(n)]
    for a_num in (alpha_den, alpha_num):
        for x in range(n):
            _, visited = vamana_greedy(adj, vecs, medoid, vecs[x], l)
            adj[x] = vamana_robust_prune(
                x, list(visited) + adj[x], vecs, a_num, alpha_den, r)
            for b in adj[x]:
                if x not in adj[b]:
                    nb = adj[b] + [x]
                    adj[b] = (vamana_robust_prune(
                        b, nb, vecs, a_num, alpha_den, r)
                        if len(nb) > r else nb)
    return medoid, adj


def vamana_search_shards(shards, q6, l):
    """Scatter-gather: per-shard greedy beams merged by (dist, id).
    `shards` = list of (ids_sorted, vecs6, medoid_idx, adj)."""
    merged = []
    for ids, vecs, medoid, adj in shards:
        beam, _ = vamana_greedy(adj, vecs, medoid, q6, l)
        merged.extend((d, ids[i]) for d, i in beam)
    return sorted(merged)


def vamana_insert_shard(vecs, is_new, adj, medoid_idx,
                        r=16, l=32, alpha_num=12, alpha_den=10):
    """FreshDiskANN insert pass (Vamana.insertShard transliteration,
    sources/VamanaStore.scala): combined shard in ascending-id order,
    `adj` (existing adjacency over combined indices, [] for new nodes)
    mutated in place. New points insert in ascending index order: one
    greedy beam from the medoid, RobustPrune(visited) out-edges, then
    back-edges with RobustPrune on overflow past R; if every back-edge
    prune dropped x, it force-appends to its NEAREST out-neighbor
    (the reachability guarantee — that node may hold R+1 edges)."""
    n = len(vecs)
    for x in range(n):
        if not is_new[x]:
            continue
        _, visited = vamana_greedy(adj, vecs, medoid_idx, vecs[x], l)
        adj[x] = vamana_robust_prune(
            x, list(visited), vecs, alpha_num, alpha_den, r)
        has_in = False
        for b in adj[x]:
            if x not in adj[b]:
                nb = adj[b] + [x]
                adj[b] = (vamana_robust_prune(
                    b, nb, vecs, alpha_num, alpha_den, r)
                    if len(nb) > r else nb)
            if x in adj[b]:
                has_in = True
        if not has_in and adj[x]:
            adj[adj[x][0]].append(x)
    return adj
