#!/usr/bin/env python3
"""Independent expected-output generator for the non-SQL-expressible
deterministic queries (the q75/q86 differential-oracle pattern, widened
per the round-9 verdict's top item).

For each covered query this re-implements the full operator semantics in
Python (via `tools/replica.py` — murmur3 LSH, Lloyd's k-means, PQ/ADC,
int8 stores, logistic GD...), INDEPENDENTLY of the Scala kernels, runs
it over the sf0.01 fixtures, and writes the expected rows to a
checked-in parquet that the DuckDB oracle reads. Pinned to sf0.01 (the
driver's correctness scale); regenerate whenever the fixtures change:

  python3 tools/gen_expected.py /root/testdata/sf0.01 \
      src/test/resources/graft/expected [query ...]

`ExpectedPinSpec` recomputes the Scala side at sf0.01 and fails loudly
with the regenerate command if these parquets go stale.
"""
import math
import os
import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from replica import (  # noqa: E402
    assign, brp_unit_vectors, cosine6, dot, fingerprint, hash_embed,
    hllpp_count, hyperplane_bits, hyperplane_bucket, int8_cosine,
    int8_encode, kmeans, l2_dist_sq, lr_train, minhash_sig, norm2,
    mat_vec, opq_train, pq_adc_dist, pq_adc_tables, pq_encode, pq_train,
    r6, sigmoid6, simhash_bits, spark_round, word_shingles, words,
    lift6_vec, vamana_build, vamana_insert_shard,
    vamana_search_shards)

QUESTION = "query filter join aggregate window shuffle"

SYSTEM_PROMPT = ("You are a friendly and useful Chatbot. "
                 "Be of assistance the best you can.\n")


def llama3_prompt(question, context):
    return ("\n<|begin_of_text|>\n<|start_header_id|>system<|end_header_id|>\n"
            + SYSTEM_PROMPT
            + "<|eot_id|>\n\n<|start_header_id|>user<|end_header_id|>\n"
            + question + "\n\nContext:\n" + context
            + "<|eot_id|>\n\n<|start_header_id|>assistant<|end_header_id|>")


NOISE_LITERALS = {
    "failed to derive thread from content",
    "Null message (for example deleted)",
    "is calling!", "is typing...", "got PNI signature message",
    "Empty data message", "presage",
    "failed to display desktop notification", "Something went wrong!"}
NOISE_PREFIXES = ("got Delivery receipt", "got Read receipt", "new story:",
                  "receipt for messages sent at", "Reacted with ")


def noise_keep(body):
    return (body is not None and body not in NOISE_LITERALS
            and not any(body.startswith(p) for p in NOISE_PREFIXES))


def token_count(text):
    return 0 if text.strip(" ") == "" else len(words(text))


def chunker(text, ideal_tokens, chunk_words):
    """Chunker.chunk semantics: (chunk_id, chunk_text, chunk_tokens)."""
    ws = words(text)
    ntok = token_count(text)
    if ntok <= ideal_tokens:
        chunks = [text.strip(" ")]
    else:
        n = math.ceil(len(ws) / chunk_words)
        chunks = [" ".join(ws[j * chunk_words:(j + 1) * chunk_words])
                  for j in range(n)]
    out = []
    for j, c in enumerate(chunks):
        if c.strip(" ") != "":
            out.append((j, c, token_count(c)))
    return out


# --- fixture loading -------------------------------------------------

class Fixtures:
    def __init__(self, sf_dir):
        self.sf_dir = sf_dir
        con = duckdb.connect()
        self.docs = con.execute(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
            "ORDER BY doc_id").fetchall()
        self.embs = con.execute(
            f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
            "ORDER BY vec_id").fetchall()
        self.embs = [(i, [float(x) for x in v]) for i, v in self.embs]
        self.events = con.execute(
            f"SELECT event_id, props FROM '{sf_dir}/events.parquet' "
            "ORDER BY event_id").fetchall()
        con.close()
        self._cache = {}

    def cached(self, key, build):
        if key not in self._cache:
            self._cache[key] = build()
        return self._cache[key]

    # shared trained models (mirror SparkEntry's per-dataset caches)
    def quantizer(self):
        return self.cached("ivf", lambda: kmeans(self.embs, 16, 5)[0])

    def pq_model(self):
        return self.cached("pq", lambda: pq_train(self.embs, 64, 8, 16, 5))

    def opq_model(self):
        return self.cached(
            "opq", lambda: opq_train(self.embs, 64, 8, 16, 5, 1))

    def pq_resid_model(self):
        def build():
            cents = self.quantizer()
            resid = [(i, [x - c for x, c in zip(v, cents[assign(v, cents)[0]])])
                     for i, v in self.embs]
            return pq_train(resid, 64, 8, 16, 5)
        return self.cached("pqresid", build)

    def doc_shingles(self):
        return self.cached("sh3", lambda: {
            i: word_shingles(words(t), 3) for i, t in self.docs})

    def doc_embeddings(self):
        return self.cached("demb", lambda: {
            i: hash_embed(words(t), 64) for i, t in self.docs})


# --- per-query generators: return (schema_sql, rows) -----------------


def minhash_bands(sh, n_bands=8, rows_per_band=2):
    sig = minhash_sig(sh, n_bands * rows_per_band)
    return [(b, ":".join(str(x) for x in
                         sig[b * rows_per_band:(b + 1) * rows_per_band]))
            for b in range(n_bands)]


def gen_q24(fx):
    bands = {i: minhash_bands(sh) for i, sh in fx.doc_shingles().items()}
    buckets = {}
    for i, bs in bands.items():
        for key in bs:
            buckets.setdefault(key, []).append(i)
    cands = set()
    for ids in buckets.values():
        for a in ids:
            for b in ids:
                if a < b:
                    cands.add((a, b))
    sh = fx.doc_shingles()
    rows = []
    for a, b in sorted(cands):
        sa, sb = set(sh[a]), set(sh[b])
        inter = float(len(sa & sb))
        union = float(len(sh[a]) + len(sh[b])) - inter
        j = 1.0 if union == 0.0 else inter / union
        if j >= 0.5:
            rows.append((a, b, r6(j)))
    return ("id_a BIGINT, id_b BIGINT, jaccard DOUBLE", rows)


def gen_q25(fx):
    sigs = {i: simhash_bits(list(dict.fromkeys(words(t))), 64)
            for i, t in fx.docs}
    buckets = {}
    for i, s in sigs.items():
        for b in range(4):
            buckets.setdefault((b, (s >> (16 * b)) & 0xFFFF), []).append(i)
    cands = set()
    for ids in buckets.values():
        for a in ids:
            for b in ids:
                if a < b:
                    cands.add((a, b))
    rows = []
    for a, b in sorted(cands):
        h = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
        if h <= 3:
            rows.append((a, b, h))
    return ("id_a BIGINT, id_b BIGINT, hamming INT", rows)


def _embed_digest(fx):
    rows = []
    for i, t in fx.docs:
        e = hash_embed(words(t), 64)
        rows.append((i, 64, r6(e[0]), r6(norm2(e)), r6(sum_seq(e))))
    return ("doc_id BIGINT, dim INT, e0 DOUBLE, norm DOUBLE, "
            "checksum DOUBLE", rows)


def sum_seq(xs):
    acc = 0.0
    for x in xs:
        acc += x * 1.0
    return acc


def gen_q26(fx):
    return _embed_digest(fx)


def gen_q59(fx):
    return _embed_digest(fx)


def gen_q27(fx):
    probes = [(i, v) for i, v in fx.embs if i < 5]
    corpus = [(i, v) for i, v in fx.embs if i >= 5]
    n_bands, band_bits = 4, 8

    def sig_strings(v):
        bits = hyperplane_bits(v, n_bands * band_bits)
        return [(b, "".join(str(x) for x in
                            bits[b * band_bits:(b + 1) * band_bits]))
                for b in range(n_bands)]

    cbuckets = {}
    for i, v in corpus:
        for key in sig_strings(v):
            cbuckets.setdefault(key, []).append(i)
    pairs = set()
    for p, v in probes:
        for key in sig_strings(v):
            for c in cbuckets.get(key, []):
                pairs.add((p, c))
    vecs = dict(fx.embs)
    norms = {i: norm2(v) for i, v in fx.embs}
    per_probe = {}
    for p, c in pairs:
        sim = r6(dot(vecs[c], vecs[p]) / (norms[c] * norms[p]))
        per_probe.setdefault(p, []).append((sim, c))
    rows = []
    for p in sorted(per_probe):
        ranked = sorted(per_probe[p], key=lambda t: (-t[0], t[1]))[:5]
        for r, (sim, c) in enumerate(ranked, 1):
            rows.append((p, c, sim, r))
    return ("probe_id BIGINT, neighbor_id BIGINT, sim DOUBLE, rank INT", rows)


def gen_q29(fx):
    """approx_count_distinct(user_id) per event_type — the independent
    HyperLogLog++ estimator over the same xxh64 hashes."""
    con = duckdb.connect()
    groups = con.execute(
        f"SELECT event_type, list(user_id), count(*) "
        f"FROM '{fx.sf_dir}/events.parquet' "
        "GROUP BY event_type ORDER BY event_type").fetchall()
    con.close()
    rows = [(t, hllpp_count(us), n) for t, us, n in groups]
    return ("event_type VARCHAR, approx_users BIGINT, n BIGINT", rows)


def gen_q38(fx):
    """MLlib BucketedRandomProjectionLSH approxSimilarityJoin replica:
    planes from JavaRandom(42) (the model's seed), hash_t =
    floor(dot(v, plane_t) / bucketLength), candidates share any
    table's hash, euclidean dist < threshold (strict)."""
    planes = brp_unit_vectors(42, 3, 64)

    def hashes(v):
        out = []
        for p in planes:
            acc = 0.0
            for a, b in zip(v, p):
                acc += a * b
            out.append(math.floor(acc / 2.0))
        return out

    hs = {i: hashes(v) for i, v in fx.embs}
    vecs = dict(fx.embs)
    rows = []
    for a in (i for i, _ in fx.embs if i < 5):
        for b in (i for i, _ in fx.embs if i >= 5):
            if any(hs[a][t] == hs[b][t] for t in range(3)):
                d = math.sqrt(l2_dist_sq(vecs[a], vecs[b]))
                if d < 12.0:
                    rows.append((a, b, r6(d)))
    rows.sort()
    return ("probe_id BIGINT, neighbor_id BIGINT, dist DOUBLE", rows)


def gen_q28(fx):
    rows = [(i, fingerprint(words(t))) for i, t in fx.docs]
    return ("doc_id BIGINT, fp BIGINT", rows)


def gen_q36(fx):
    probe = hash_embed(words(QUESTION), 64)
    probe_norm = math.sqrt(sum_sq(probe))
    scored = []
    for i, t in fx.docs:
        if not noise_keep(t):
            continue
        for cid, ctext, ctok in chunker(t, 32, 24):
            e = hash_embed(words(ctext), 64)
            sim = r6(dot(e, probe) / (norm2(e) * probe_norm))
            scored.append((sim, i, cid, ctok))
    scored.sort(key=lambda r: (-r[0], r[1], r[2]))
    rows = [(i, cid, ctok, sim) for sim, i, cid, ctok in scored[:20]]
    return ("doc_id BIGINT, chunk_id INT, chunk_tokens INT, sim DOUBLE", rows)


def sum_sq(xs):
    acc = 0.0
    for x in xs:
        acc += x * x
    return acc


def gen_q37(fx):
    ones = [1.0] * 64
    rows = []
    for eid, props in fx.events:
        if not noise_keep(props):
            continue
        for cid, ctext, ctok in chunker(props, 48, 36):
            e = hash_embed(words(ctext), 64)
            rows.append((eid, cid, ctok, r6(norm2(e)), r6(dot(e, ones))))
    rows.sort(key=lambda r: (r[0], r[1]))
    return ("event_id BIGINT, chunk_id INT, tokens INT, emb_norm DOUBLE, "
            "emb_checksum DOUBLE", rows)


def _ivf(fx, seeds):
    """ivfWithSeeds replica: seeds = [(cell, vec)]; probes vec_id<5,
    corpus vec_id>=5, nProbe=4, k=5."""
    probes = [(i, v) for i, v in fx.embs if i < 5]
    corpus = [(i, v) for i, v in fx.embs if i >= 5]
    cells = {}
    for i, v in corpus:
        best = None
        for cell, sv in seeds:
            d = l2_dist_sq(v, sv)
            if best is None or (d, cell) < best:
                best = (d, cell)
        cells.setdefault(best[1], []).append(i)
    vecs = dict(fx.embs)
    norms = {i: norm2(v) for i, v in fx.embs}
    rows = []
    for p, v in sorted(probes):
        ds = sorted(((l2_dist_sq(v, sv), cell) for cell, sv in seeds))[:4]
        cand = []
        for _, cell in ds:
            for c in cells.get(cell, []):
                sim = r6(dot(vecs[c], vecs[p]) / (norms[c] * norms[p]))
                cand.append((sim, c))
        cand.sort(key=lambda t: (-t[0], t[1]))
        for r, (sim, c) in enumerate(cand[:5], 1):
            rows.append((p, c, sim, r))
    return ("probe_id BIGINT, neighbor_id BIGINT, sim DOUBLE, rank INT", rows)


def gen_q42(fx):
    corpus = [(i, v) for i, v in fx.embs if i >= 5]
    seeds = [(i, v) for i, v in sorted(corpus)[:16]]
    return _ivf(fx, seeds)


def gen_q78(fx):
    cents = fx.quantizer()
    return _ivf(fx, list(enumerate(cents)))


def probe_buckets(probe, n_bits=4):
    b = hyperplane_bucket(probe, n_bits)
    return [b] + [b ^ (1 << i) for i in range(n_bits)]


def gen_q70(fx):
    probe = dict(fx.embs)[0]
    bs = set(probe_buckets(probe))
    cand = [(i, v) for i, v in fx.embs if hyperplane_bucket(v, 4) in bs]
    scored = sorted(((cosine6(v, probe), i) for i, v in cand),
                    key=lambda t: (-t[0], t[1]))[:20]
    rows = [(i, sim) for sim, i in scored]
    return ("vec_id BIGINT, sim DOUBLE", rows)


def gen_q73(fx):
    probe = dict(fx.embs)[0]
    bs = set(probe_buckets(probe))
    approx = []
    for i, v in fx.embs:
        if hyperplane_bucket(v, 4) in bs:
            codes, vmin, scale = int8_encode(v)
            approx.append((r6(int8_cosine(codes, vmin, scale, probe)), i))
    top_m = sorted(approx, key=lambda t: (-t[0], t[1]))[:50]
    vecs = dict(fx.embs)
    rer = sorted(((cosine6(vecs[i], probe), i) for _, i in top_m),
                 key=lambda t: (-t[0], t[1]))[:20]
    rows = [(i, sim) for sim, i in rer]
    return ("vec_id BIGINT, sim DOUBLE", rows)


def _store_dedup_pairs(fx, threshold):
    """SignatureStore.dedupAgainstStore replica: store = doc_id%5!=0,
    batch = doc_id%5==0, Params(3, 8, 2)."""
    sh = fx.doc_shingles()
    store = [i for i, _ in fx.docs if i % 5 != 0]
    batch = [i for i, _ in fx.docs if i % 5 == 0]
    sbuckets = {}
    for i in store:
        for key in minhash_bands(sh[i]):
            sbuckets.setdefault(key, []).append(i)
    cands = set()
    for i in batch:
        for key in minhash_bands(sh[i]):
            for s in sbuckets.get(key, []):
                cands.add((i, s))
    rows = []
    for a, b in sorted(cands):
        sa, sb = set(sh[a]), set(sh[b])
        inter = float(len(sa & sb))
        union = float(len(sh[a]) + len(sh[b])) - inter
        j = 1.0 if union == 0.0 else inter / union
        if j >= threshold:
            rows.append((a, b, r6(j)))
    return rows


def gen_q72(fx):
    rows = _store_dedup_pairs(fx, 0.5)
    return ("id_new BIGINT, id_stored BIGINT, jaccard DOUBLE", rows)


def gen_q79(fx):
    dup_ids = {a for a, _, _ in _store_dedup_pairs(fx, 0.5)}
    corpus = [(i, t) for i, t in fx.docs
              if i % 5 != 0 or i not in dup_ids]
    emb = {i: hash_embed(words(t), 64) for i, t in corpus}
    texts = dict(corpus)
    probe = hash_embed(words(QUESTION), 64)
    bs = set(probe_buckets(probe))
    approx = []
    for i, e in emb.items():
        if hyperplane_bucket(e, 4) in bs:
            codes, vmin, scale = int8_encode(e)
            approx.append((r6(int8_cosine(codes, vmin, scale, probe)), i))
    top_m = sorted(approx, key=lambda t: (-t[0], t[1]))[:50]
    top = sorted(((cosine6(emb[i], probe), i) for _, i in top_m),
                 key=lambda t: (-t[0], t[1]))[:5]
    rows = []
    for sim, i in top:
        rank = sum(1 for s2, d2 in top
                   if s2 > sim or (s2 == sim and d2 <= i))
        rows.append((rank, i, sim, llama3_prompt(QUESTION, texts[i])))
    rows.sort(key=lambda r: r[0])
    return ("rank INT, doc_id BIGINT, sim DOUBLE, prompt VARCHAR", rows)


def gen_q200(fx):
    # quantizer-refresh audit: pin ONLY the deterministic kmeans
    # assignment (train on even vec_ids, k=8, maxIter=10, the q74
    # replica); PSI + per-cell centroid drift + the decision are pure
    # SQL over embeddings x this pin (q143/q121 proven trees)
    evens = [(i, v) for i, v in fx.embs
             if v is not None and len(v) == 64 and i % 2 == 0]
    cents, _ = kmeans(evens, 8, 10)
    rows = []
    for i, v in fx.embs:
        if v is None or len(v) != 64:
            continue
        rows.append((i, assign(v, cents)[0], i % 2 == 0))
    return ("vec_id BIGINT, cell INT, a BOOLEAN", rows)


def gen_q201(fx):
    # tokenizer-refresh audit: independent python trainer (train_bpe,
    # the q86 replica) retrains 40 merges on the corpus; per-source
    # token counts under the production table (gen_bpe_expected's
    # encoder, the q75 replica) and the fresh table, side by side
    import collections
    from train_bpe import pretokenize, train
    from gen_bpe_expected import load_merges, encode_word
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, source, text FROM '{fx.sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    con.close()
    freqs = collections.Counter()
    for _, _, t in rows:
        if t is not None:
            freqs.update(pretokenize(t))
    merges = train(freqs, 40)
    to_id = {}
    new_ranks = {}
    for r, (la, lb) in enumerate(merges):
        lh, rh = la.hex(), lb.hex()
        idl = la[0] if len(la) == 1 else to_id[lh]
        idr = lb[0] if len(lb) == 1 else to_id[rh]
        to_id[lh + rh] = 256 + r
        new_ranks[(idl, idr)] = (r, 256 + r)
    old_ranks = load_merges()
    memo_old, memo_new = {}, {}
    agg = {}
    for _, src, t in rows:
        if t is None:
            continue
        to = tn = 0
        for w in pretokenize(t):
            if w not in memo_old:
                memo_old[w] = len(encode_word(w, old_ranks))
                memo_new[w] = len(encode_word(w, new_ranks))
            to += memo_old[w]
            tn += memo_new[w]
        a = agg.setdefault(src, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += token_count(t)
        a[2] += len(t.encode("utf-8"))
        a[3] += to
        a[4] += tn
    out = []
    for src in sorted(agg):
        nd, nw, nb, to, tn = agg[src]
        out.append((src, nd, nw, nb, to, tn,
                    r6(to / nw) if nw > 0 else None,
                    r6(tn / nw) if nw > 0 else None))
    return ("source VARCHAR, n_docs BIGINT, n_words BIGINT, "
            "n_bytes BIGINT, tokens_old BIGINT, tokens_new BIGINT, "
            "tpw_old DOUBLE, tpw_new DOUBLE", out)


def gen_q74(fx):
    cents, iters = kmeans(fx.embs, 8, 10)
    members = {}
    dists = {}
    for i, v in fx.embs:
        ci, d = assign(v, cents)
        members[ci] = members.get(ci, 0) + 1
        dists.setdefault(ci, []).append(r6(d))
    rows = []
    for ci, c in enumerate(cents):
        # DECIMAL(18,6) sum of 6-dp values: exact integer micros
        # (repr-based, mirroring Spark's double->decimal cast)
        micros = sum(int((Decimal(repr(d)) * 1000000).to_integral_value())
                     for d in dists.get(ci, []))
        sum_d = r6(float(Decimal(micros).scaleb(-6)))
        c_norm = r6(math.sqrt(sum_sq(c)))
        c_sum = r6(sum_seq(c))
        rows.append((ci, members.get(ci, 0), sum_d, c_norm, c_sum, iters))
    return ("cluster INT, n_members BIGINT, sum_dist2 DOUBLE, "
            "c_norm DOUBLE, c_sum DOUBLE, iterations INT", rows)


def gen_q88(fx):
    cents = fx.quantizer()
    assigned = {i: assign(v, cents)[0] for i, v in fx.embs}
    by_cluster = {}
    for i, v in fx.embs:
        by_cluster.setdefault(assigned[i], []).append((i, v))
    norms = {i: norm2(v) for i, v in fx.embs}
    vecs = dict(fx.embs)
    dropped = set()
    for members in by_cluster.values():
        ids = sorted(i for i, _ in members)
        for x, a in enumerate(ids):
            for b in ids[x + 1:]:
                sim = r6(dot(vecs[a], vecs[b]) / (norms[a] * norms[b]))
                if sim >= 0.3:
                    dropped.add(b)
    rows = [(i, assigned[i], i not in dropped) for i, _ in fx.embs]
    return ("vec_id BIGINT, cluster INT, kept BOOLEAN", rows)


def _pq_probe(fx, model, probe, cells=None, cents=None, residual=False):
    """Shared PQ probe: ADC top-50 then exact rerank top-20."""
    scored = []
    if cells is None:  # q81: hyperplane-bucket store
        bs = set(probe_buckets(probe))
        tables = pq_adc_tables(probe, model)
        for i, v in fx.embs:
            if hyperplane_bucket(v, 4) in bs:
                scored.append((pq_adc_dist(pq_encode(v, model), tables), i))
    else:  # IVF store on trained cells
        cell_of = {i: assign(v, cents)[0] for i, v in fx.embs}
        for c in cells:
            if residual:
                pres = [p - cc for p, cc in zip(probe, cents[c])]
                tables = pq_adc_tables(pres, model)
            else:
                tables = pq_adc_tables(probe, model)
            for i, v in fx.embs:
                if cell_of[i] != c:
                    continue
                enc = ([x - cc for x, cc in zip(v, cents[c])]
                       if residual else v)
                scored.append((pq_adc_dist(pq_encode(enc, model), tables), i))
    top_m = sorted(scored, key=lambda t: (t[0], t[1]))[:50]
    vecs = dict(fx.embs)
    rer = sorted(((cosine6(vecs[i], probe), i) for _, i in top_m),
                 key=lambda t: (-t[0], t[1]))[:20]
    return [(i, sim) for sim, i in rer]


def gen_q81(fx):
    probe = dict(fx.embs)[0]
    rows = _pq_probe(fx, fx.pq_model(), probe)
    return ("vec_id BIGINT, sim DOUBLE", rows)


def gen_q163(fx):
    """OPQ store probe: everything lives in ROTATED space except the
    final exact rerank (original vectors, original probe)."""
    probe = dict(fx.embs)[0]
    rot, model = fx.opq_model()
    rp = mat_vec(rot, probe)
    bs = set(probe_buckets(rp))
    tables = pq_adc_tables(rp, model)
    scored = []
    for i, v in fx.embs:
        rv = mat_vec(rot, v)
        if hyperplane_bucket(rv, 4) in bs:
            scored.append((pq_adc_dist(pq_encode(rv, model), tables), i))
    top_m = sorted(scored, key=lambda t: (t[0], t[1]))[:50]
    vecs = dict(fx.embs)
    rer = sorted(((cosine6(vecs[i], probe), i) for _, i in top_m),
                 key=lambda t: (-t[0], t[1]))[:20]
    return ("vec_id BIGINT, sim DOUBLE", [(i, s) for s, i in rer])


def gen_q168(fx):
    """IVF-OPQ: the q163 rotation + the q93 residual recipe entirely in
    rotated space; exact rerank on originals."""
    probe = dict(fx.embs)[0]
    rot, _books = fx.opq_model()
    rotated = [(i, mat_vec(rot, v)) for i, v in fx.embs]
    cents = kmeans(rotated, 16, 5)[0]
    resid = [(i, [x - c for x, c in zip(v, cents[assign(v, cents)[0]])])
             for i, v in rotated]
    model = pq_train(resid, 64, 8, 16, 5)
    rp = mat_vec(rot, probe)
    cells = _probe_cells(rp, cents, 4)
    cell_of = {i: assign(v, cents)[0] for i, v in rotated}
    scored = []
    for c in cells:
        pres = [p - cc for p, cc in zip(rp, cents[c])]
        tables = pq_adc_tables(pres, model)
        for i, v in rotated:
            if cell_of[i] != c:
                continue
            enc = [x - cc for x, cc in zip(v, cents[c])]
            scored.append((pq_adc_dist(pq_encode(enc, model), tables), i))
    top_m = sorted(scored, key=lambda t: (t[0], t[1]))[:50]
    vecs = dict(fx.embs)
    rer = sorted(((cosine6(vecs[i], probe), i) for _, i in top_m),
                 key=lambda t: (-t[0], t[1]))[:20]
    return ("vec_id BIGINT, sim DOUBLE", [(i, s) for s, i in rer])


def gen_q172(fx):
    """Vamana graph ANN (q172): sharded deterministic DiskANN build +
    scatter-gather greedy beam search, exact cosine rerank on the
    ORIGINAL vectors — transliterates operators/Vamana.scala (all
    decisions in exact 1e6-lifted integers, nothing to match but the
    op order)."""
    probe = dict(fx.embs)[0]
    q6 = lift6_vec(probe)
    n_shards = 4
    shards = []
    for s in range(n_shards):
        members = [(i, v) for i, v in fx.embs if i % n_shards == s]
        ids = [i for i, _ in members]      # fx.embs is vec_id-ordered
        vecs6 = [lift6_vec(v) for _, v in members]
        medoid, adj = vamana_build(vecs6, 16, 32, 12, 10)
        shards.append((ids, vecs6, medoid, adj))
    merged = vamana_search_shards(shards, q6, 32)[:50]
    vecs = dict(fx.embs)
    rer = sorted(((cosine6(vecs[i], probe), i) for _, i in merged),
                 key=lambda t: (-t[0], t[1]))[:20]
    return ("vec_id BIGINT, sim DOUBLE", [(i, s) for s, i in rer])


def gen_q189(fx):
    """Streaming Vamana store (q189): three FreshDiskANN insertion
    batches (vec_id <200 / 200-349 / >=350) replayed per shard over
    the batch-build base, then a 3-probe scatter-gather search with
    exact cosine rerank — transliterates sources/VamanaStore.scala
    (exact integer decisions end-to-end)."""
    n_shards, r, l, a_num, a_den = 4, 16, 32, 12, 10
    batches = [[(i, v) for i, v in fx.embs if i < 200],
               [(i, v) for i, v in fx.embs if 200 <= i < 350],
               [(i, v) for i, v in fx.embs if i >= 350]]
    # per-shard state: (ids ascending, vecs6, adjacency as ID lists,
    # medoid ID) — mirrors the store's visible latest-per-id graph
    state = {}
    for batch in batches:
        for s in range(n_shards):
            new = sorted((i, lift6_vec(v)) for i, v in batch
                         if i % n_shards == s)
            # within-batch duplicate ids collapse by the store's exact
            # tie-break: min LEXICOGRAPHIC comma-joined vec6 string
            # (VamanaStore.processBatch's minBy(_.mkString(","));
            # "10..." < "2..." — string order, not numeric). Fixture
            # batches carry unique ids, so this is a no-op there; it
            # keeps the differential oracle honest if a future fixture
            # regen plants duplicates (r18 ADVICE).
            by_id = {}
            for i, v in new:
                key = ",".join(str(x) for x in v)
                if i not in by_id or key < by_id[i][0]:
                    by_id[i] = (key, v)
            new = sorted((i, kv[1]) for i, kv in by_id.items())
            if not new:
                continue
            if s not in state:
                ids = [i for i, _ in new]
                vecs6 = [v for _, v in new]
                medoid, adj = vamana_build(vecs6, r, l, a_num, a_den)
                state[s] = (ids, vecs6,
                            {ids[i]: [ids[j] for j in adj[i]]
                             for i in range(len(ids))}, ids[medoid])
            else:
                old_ids, old_vecs, adj_by_id, medoid_id = state[s]
                old = dict(zip(old_ids, old_vecs))
                new = [(i, v) for i, v in new if i not in old]
                comb = sorted(old.items()) + new
                comb.sort(key=lambda t: t[0])
                ids = [i for i, _ in comb]
                vecs6 = [v for _, v in comb]
                idx = {i: k for k, i in enumerate(ids)}
                is_new = [i not in old for i in ids]
                adj = [[idx[j] for j in adj_by_id[i]]
                       if i in adj_by_id else [] for i in ids]
                vamana_insert_shard(vecs6, is_new, adj, idx[medoid_id],
                                    r, l, a_num, a_den)
                state[s] = (ids, vecs6,
                            {ids[k]: [ids[j] for j in adj[k]]
                             for k in range(len(ids))}, medoid_id)
    shards = []
    for s in sorted(state):
        ids, vecs6, adj_by_id, medoid_id = state[s]
        idx = {i: k for k, i in enumerate(ids)}
        adj = [[idx[j] for j in adj_by_id[i]] for i in ids]
        shards.append((ids, vecs6, idx[medoid_id], adj))
    vecs = dict(fx.embs)
    rows = []
    for pid in (0, 7, 13):
        probe = vecs[pid]
        merged = vamana_search_shards(shards, lift6_vec(probe), l)[:50]
        rer = sorted(((cosine6(vecs[i], probe), i) for _, i in merged),
                     key=lambda t: (-t[0], t[1]))[:10]
        rows.extend((pid, i, sim) for sim, i in rer)
    return ("probe_id BIGINT, vec_id BIGINT, sim DOUBLE", rows)


def _probe_cells(probe, cents, n_probe):
    ds = sorted(((l2_dist_sq(probe, c), i) for i, c in enumerate(cents)))
    return [i for _, i in ds[:n_probe]]


def gen_q83(fx):
    probe = dict(fx.embs)[0]
    cents = fx.quantizer()
    cells = _probe_cells(probe, cents, 4)
    rows = _pq_probe(fx, fx.pq_model(), probe, cells=cells, cents=cents)
    return ("vec_id BIGINT, sim DOUBLE", rows)


def gen_q93(fx):
    probe = dict(fx.embs)[0]
    cents = fx.quantizer()
    cells = _probe_cells(probe, cents, 4)
    rows = _pq_probe(fx, fx.pq_resid_model(), probe, cells=cells,
                     cents=cents, residual=True)
    return ("vec_id BIGINT, sim DOUBLE", rows)


def gen_q89(fx):
    feats = {i: hash_embed(words(t), 128) for i, t in fx.docs}
    labels = {i: 1 if "spark" in words(t) else 0 for i, t in fx.docs}
    data = [(float(labels[i]), feats[i]) for i, _ in fx.docs]
    w, b = lr_train(data, 128, 80, 8.0)
    rows = []
    for i, _ in fx.docs:
        z = dot(feats[i], w) + b
        score = sigmoid6(z)
        rows.append((i, labels[i], score, 1 if score >= 0.5 else 0))
    return ("doc_id BIGINT, label INT, score DOUBLE, pred INT", rows)


def gen_q51(fx):
    import numpy as np
    rows = []
    for fn in sorted(os.listdir(fx.sf_dir)):
        if not fn.endswith(".parquet"):
            continue
        data = open(os.path.join(fx.sf_dir, fn), "rb").read()
        arr = np.frombuffer(data, dtype=np.uint8)
        feats = []
        for rcls in range(16):
            vals = (arr[rcls::16].astype(np.float32)
                    / np.float32(255.0))
            feats.append(float(np.cumsum(vals, dtype=np.float32)[-1])
                         if len(vals) else 0.0)
        acc = 0.0
        for f in feats:
            acc += f
        # containerInfo over the same binaries: parquet is no media
        # container -> duration/bit_rate/sample_rate structurally 0
        rows.append((fn, "application/vnd.apache.parquet", len(data),
                     spark_round(acc, 4), 0, 0, 0))
    return ("file VARCHAR, mime VARCHAR, bytes BIGINT, feat_sum DOUBLE, "
            "duration_ms BIGINT, bit_rate INT, sample_rate INT", rows)


IMAGES_DIR = "/root/repo/src/test/resources/graft/images"


def _dhash_of_bmp(path):
    """Replicate Multimodal.imageThumbGrid(9,8) + dHashBits exactly:
    double luminance accumulation in y-outer/x-inner order with the
    same literal coefficients and associativity, cell = float32 of the
    double average (JVM .toFloat == np.float32 round-to-nearest),
    strict > comparison, bit r*8+c, signed-64 wrap for the BIGINT."""
    import numpy as np
    from gen_image_fixtures import read_bmp
    px = read_bmp(path)
    h, w = len(px), len(px[0])
    gw, gh = 9, 8
    grid = [[None] * gw for _ in range(gh)]
    for cy in range(gh):
        for cx in range(gw):
            x0 = cx * w // gw
            x1 = max(x0 + 1, (cx + 1) * w // gw)
            y0 = cy * h // gh
            y1 = max(y0 + 1, (cy + 1) * h // gh)
            acc = 0.0
            for y in range(y0, y1):
                for x in range(x0, x1):
                    r, g, b = px[y][x]
                    acc += 0.299 * r + 0.587 * g + 0.114 * b
            grid[cy][cx] = np.float32(acc / ((x1 - x0) * (y1 - y0) * 255.0))
    bits = 0
    for r in range(gh):
        for c in range(gw - 1):
            if grid[r][c] > grid[r][c + 1]:
                bits |= 1 << (r * 8 + c)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def _image_hashes():
    return [(fn, _dhash_of_bmp(os.path.join(IMAGES_DIR, fn)))
            for fn in sorted(os.listdir(IMAGES_DIR)) if fn.endswith(".bmp")]


def gen_q128(fx):
    return ("file VARCHAR, dhash BIGINT", _image_hashes())


_PHASH_W = None


def _phash_weights():
    global _PHASH_W
    if _PHASH_W is None:
        import json
        flat = json.load(open(
            "/root/repo/src/main/resources/graft/phash_weights.json"))["w"]
        _PHASH_W = [flat[u * 32:(u + 1) * 32] for u in range(8)]
    return _PHASH_W


def _phash_of_bmp(path):
    """Replicate Multimodal.imageThumbGrid(32,32) + phashBits exactly:
    float32 cells (same double luminance fold), Java Math.round lift
    (floor(x+0.5)), exact-integer separable DCT with the CHECKED-IN
    weight table and floorDiv-1000 rescale (python // == Java floorDiv
    on negatives), lower-median selection, strict >, signed-64 wrap."""
    import math as m
    import numpy as np
    from gen_image_fixtures import read_bmp
    px = read_bmp(path)
    h, w = len(px), len(px[0])
    gw = gh = 32
    cells = [None] * 1024
    for cy in range(gh):
        for cx in range(gw):
            x0 = cx * w // gw
            x1 = max(x0 + 1, (cx + 1) * w // gw)
            y0 = cy * h // gh
            y1 = max(y0 + 1, (cy + 1) * h // gh)
            acc = 0.0
            for y in range(y0, y1):
                for x in range(x0, x1):
                    r, g, b = px[y][x]
                    acc += 0.299 * r + 0.587 * g + 0.114 * b
            cells[cy * gw + cx] = np.float32(
                acc / ((x1 - x0) * (y1 - y0) * 255.0))
    L = [m.floor(float(c) * 1e6 + 0.5) for c in cells]
    W = _phash_weights()
    mid = [[0] * 32 for _ in range(8)]
    for u in range(8):
        for y in range(32):
            s = 0
            for x in range(32):
                s += W[u][x] * L[y * 32 + x]
            mid[u][y] = s // 1000
    f = [0] * 64
    for u in range(8):
        for v in range(8):
            s = 0
            for y in range(32):
                s += W[v][y] * mid[u][y]
            f[u * 8 + v] = s
    med = sorted(f)[31]
    bits = 0
    for i in range(64):
        if f[i] > med:
            bits |= 1 << i
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def gen_q182(fx):
    return ("file VARCHAR, phash BIGINT",
            [(fn, _phash_of_bmp(os.path.join(IMAGES_DIR, fn)))
             for fn in sorted(os.listdir(IMAGES_DIR))
             if fn.endswith(".bmp")])


def gen_q183(fx):
    """Doc-level k-core peel over the PINNED q25 near-dup pair set —
    an INDEPENDENT implementation (plain Batagelj-Zaversnik on the doc
    graph, no group quotient) of what simhashCores computes via the
    weighted group peel. Heap-lazy min-degree removal with the BZ
    clamp (a vertex dragged below k by the k-cascade keeps core k)."""
    import duckdb
    import heapq
    con = duckdb.connect()
    pairs = con.execute(
        "SELECT id_a, id_b FROM read_parquet('/root/repo/src/test/"
        "resources/graft/expected/q25_sf001.parquet')").fetchall()
    docs = [r[0] for r in con.execute(
        f"SELECT doc_id FROM '{fx.sf_dir}/documents.parquet' "
        "WHERE doc_id IS NOT NULL AND text IS NOT NULL").fetchall()]
    adj = {d: [] for d in docs}
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    cur = {d: len(adj[d]) for d in docs}
    heap = [(cur[d], d) for d in docs]
    heapq.heapify(heap)
    removed = set()
    core = {}
    kmax = 0
    while heap:
        d, g = heapq.heappop(heap)
        if g in removed or cur[g] != d:
            continue
        kmax = max(kmax, d)
        core[g] = kmax
        removed.add(g)
        for h in adj[g]:
            if h not in removed:
                nd = max(cur[h] - 1, kmax)
                if nd != cur[h]:
                    cur[h] = nd
                    heapq.heappush(heap, (nd, h))
    return ("node BIGINT, core BIGINT",
            sorted((d, core[d]) for d in docs))


AUDIO_DIR = "/root/repo/src/test/resources/graft/audio"


def _afp_of_samples(samples):
    """Replicate Multimodal.rmsEnvelope(buckets=65) + dHashBits(65,1)
    exactly: mono double per frame (ch=1 -> the sample value), bucket
    f*65//n, sum-of-squares in frame order, float32 of
    sqrt(sumSq/count)/32768.0 (IEEE sqrt is correctly rounded in both
    runtimes), strict > deltas, signed-64 wrap."""
    import math as m
    import numpy as np
    n = len(samples)
    buckets = 65
    sum_sq = [0.0] * buckets
    counts = [0] * buckets
    for f in range(n):
        mono = float(samples[f])
        b = f * buckets // n
        sum_sq[b] += mono * mono
        counts[b] += 1
    env = [np.float32(m.sqrt(sum_sq[b] / counts[b]) / 32768.0)
           if counts[b] else np.float32(0.0) for b in range(buckets)]
    bits = 0
    for c in range(64):
        if env[c] > env[c + 1]:
            bits |= 1 << c
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def _afp_of_wav(path):
    from gen_audio_fixtures import read_wav
    return _afp_of_samples(read_wav(path))


FLAC_DIR = "/root/repo/src/test/resources/graft/flac"


def _afp_of_flac(path):
    """q162: the INDEPENDENT from-spec Python FLAC decoder
    (tools/flac_replica.py — no code shared with the fixture encoder
    or the Scala decoder) followed by the exact q130 envelope fold."""
    from flac_replica import decode_flac
    return _afp_of_samples(decode_flac(open(path, "rb").read()))


def gen_q162(fx):
    return ("file VARCHAR, afp BIGINT",
            [(fn, _afp_of_flac(os.path.join(FLAC_DIR, fn)))
             for fn in sorted(os.listdir(FLAC_DIR))
             if fn.endswith(".flac")])


def _audio_hashes():
    return [(fn, _afp_of_wav(os.path.join(AUDIO_DIR, fn)))
            for fn in sorted(os.listdir(AUDIO_DIR)) if fn.endswith(".wav")]


def gen_q130(fx):
    return ("file VARCHAR, afp BIGINT", _audio_hashes())


def gen_q131(fx):
    hs = _audio_hashes()
    mask = (1 << 64) - 1
    rows = []
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            d = bin((hs[i][1] ^ hs[j][1]) & mask).count("1")
            if d <= 3:
                rows.append((hs[i][0], hs[j][0], d))
    return ("id_a VARCHAR, id_b VARCHAR, hamming INT", rows)


def gen_q129(fx):
    hs = _image_hashes()
    mask = (1 << 64) - 1
    rows = []
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            d = bin((hs[i][1] ^ hs[j][1]) & mask).count("1")
            if d <= 3:  # band candidate rule is complete at <= 3
                rows.append((hs[i][0], hs[j][0], d))
    return ("id_a VARCHAR, id_b VARCHAR, hamming INT", rows)


def gen_q95(fx):
    """Packed-sequence digests: the independent BPE encoder
    (gen_bpe_expected machinery) produces the same token stream in
    doc_id order; pack at 512 and digest per sequence."""
    from gen_bpe_expected import encode_word, load_merges
    from train_bpe import pretokenize
    ranks = load_merges()
    memo = {}
    seqs = {}
    gpos = 0
    for i, t in fx.docs:
        for w in pretokenize(t or ""):
            if w not in memo:
                memo[w] = encode_word(w, ranks)
            for tok in memo[w]:
                sid = gpos // 512
                pos = gpos % 512
                s = seqs.setdefault(sid, {"n": 0, "docs": set(), "first": None,
                                          "last": None, "ck": 0})
                s["n"] += 1
                s["docs"].add(i)
                if s["first"] is None:
                    s["first"] = tok
                s["last"] = tok
                s["ck"] += (pos + 1) * tok
                gpos += 1
    rows = [(sid, s["n"], len(s["docs"]), s["first"], s["last"], s["ck"])
            for sid, s in sorted(seqs.items())]
    return ("seq_id BIGINT, n_tokens BIGINT, n_docs BIGINT, "
            "first_token INT, last_token INT, checksum BIGINT", rows)


def _bpe_token_stream(fx, docs=None):
    """(doc_id, token) pairs of the corpus BPE stream in the given doc
    order (default: doc_id order) — the shared front half of q95/q96/
    q97's packing replicas."""
    from gen_bpe_expected import encode_word, load_merges
    from train_bpe import pretokenize
    ranks = load_merges()
    memo = {}
    for i, t in (docs if docs is not None else fx.docs):
        for w in pretokenize(t or ""):
            if w not in memo:
                memo[w] = encode_word(w, ranks)
            for tok in memo[w]:
                yield i, tok


def _pack_digests(stream, seq_len):
    """packSequences digests over a (doc, token) stream: one row per
    seq — (seq_id, n_tokens, n_docs, first, last, pos-weighted ck)."""
    seqs = {}
    for gpos, (i, tok) in enumerate(stream):
        sid = gpos // seq_len
        pos = gpos % seq_len
        s = seqs.setdefault(sid, {"n": 0, "docs": set(), "first": None,
                                  "last": None, "ck": 0})
        s["n"] += 1
        s["docs"].add(i)
        if s["first"] is None:
            s["first"] = tok
        s["last"] = tok
        s["ck"] += (pos + 1) * tok
    return [(sid, s["n"], len(s["docs"]), s["first"], s["last"], s["ck"])
            for sid, s in sorted(seqs.items())]


PACK_SCHEMA = ("seq_id BIGINT, n_tokens BIGINT, n_docs BIGINT, "
               "first_token INT, last_token INT, checksum BIGINT")

# TextOps.stopwords / langOrder — the independent replica of the q56
# language gate (10 words per language; ExpectedPinSpec catches drift)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "de", "et", "un", "une", "les", "des", "est", "que"],
    "es": ["el", "la", "de", "y", "un", "una", "los", "las", "es", "que"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "zu", "den",
           "von"],
    "zh": ["\u7684", "\u4e86", "\u662f", "\u5728", "\u6211", "\u6709",
           "\u548c", "\u4e0d", "\u4eba", "\u8fd9"]}
LANG_ORDER = ["en", "fr", "es", "de", "zh"]


def _curate(fx):
    """q56's five-stage curation, independently: noise filter -> en
    language gate -> quality gate -> exact dedup (keep lowest id) ->
    within-source 3-gram Jaccard near-dup drop. Returns
    [(doc_id, source, text, score)] in doc_id order."""
    import re as _re
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, source, text FROM '{fx.sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    con.close()
    alpha = _re.compile(r"^[a-z]+$", _re.ASCII)
    stop_sets = [STOPWORDS[l] for l in LANG_ORDER]
    kept = []
    for i, src, t in rows:
        if not noise_keep(t):
            continue
        ws = words(t.lower())
        n = len(ws)
        hits = [sum(1 for w in ws if w in L) for L in stop_sets]
        best = max(hits)
        lang = next((name for name, h in zip(LANG_ORDER, hits)
                     if h > 0 and h == best), "und")
        if lang != "en":
            continue
        score = spark_round(
            min(1.0, n / 64.0) * (0.5 + 0.5 * (hits[0] / n))
            * (sum(1 for w in ws if alpha.match(w)) / n), 6)
        if score < 0.2:
            continue
        kept.append((i, src, t, score))
    first_by_text = {}
    for i, src, t, sc in kept:
        if t not in first_by_text:
            first_by_text[t] = (i, src, t, sc)
    ded = sorted(first_by_text.values())
    sh = {i: set(word_shingles(words(t), 3)) for i, _, t, _ in ded}
    by_src = {}
    for i, src, _, _ in ded:
        by_src.setdefault(src, []).append(i)
    drop = set()
    for ids in by_src.values():
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                inter = len(sh[a] & sh[b])
                union = len(sh[a]) + len(sh[b]) - inter
                if union and inter / union >= 0.5:
                    drop.add(b)
    return [r for r in ded if r[0] not in drop]


def gen_q96(fx):
    """End-to-end pretraining pipeline: curate -> mixToBudget(600) ->
    shuffleShards(4) -> packSequences(256), each stage replicated
    independently (integer-exact LCG/rate arithmetic)."""
    cur = _curate(fx)
    totals = {}
    with_tok = []
    for i, src, t, _ in cur:
        tk = token_count(t)
        with_tok.append((i, src, t, tk))
        totals[src] = totals.get(src, 0) + tk
    rate = {src: (100 if tot <= 0 else min(100, (100 * 600) // tot))
            for src, tot in totals.items()}
    mixed = [(i, src, t) for i, src, t, _ in with_tok
             if (i * 1103515245 + 12345) % 100 < rate[src]]
    # epoch shuffle: LCG key, shard = key mod 4, pos ranks (key, id)
    keyed = [(((i % 2**31) * 1103515245 + 12345) % 2**31, i, t)
             for i, _, t in mixed]
    ordered = []
    for shard in range(4):
        in_shard = sorted((k, i, t) for k, i, t in keyed if k % 4 == shard)
        for pos, (_, i, t) in enumerate(in_shard, start=1):
            ordered.append((shard * 2**32 + pos, t))
    ordered.sort()
    return (PACK_SCHEMA,
            _pack_digests(_bpe_token_stream(fx, docs=ordered), 256))


def gen_q97(fx):
    """writePackedShards digests: the q95 stream packed at 512, 4 seqs
    per shard dir; per-shard (n_seqs, n_tokens, pos-weighted ck)."""
    shards = {}
    for gpos, (_, tok) in enumerate(_bpe_token_stream(fx)):
        sid = gpos // 512
        sh = shards.setdefault(sid // 4, {"seqs": set(), "n": 0, "ck": 0})
        sh["seqs"].add(sid)
        sh["n"] += 1
        sh["ck"] += (gpos % 512 + 1) * tok
    rows = [(sh, d["seqs"].__len__(), d["n"], d["ck"])
            for sh, d in sorted(shards.items())]
    return ("shard INT, n_seqs BIGINT, n_tokens BIGINT, checksum BIGINT",
            rows)


def gen_q135(fx):
    """MMR rerank: top-32 by cosine vs the vec_id=0 probe, then the
    greedy integer-score selection (lam=500 permille, k=8)."""
    vecs = dict(fx.embs)
    probe = vecs[0]
    pn = norm2(probe)

    def lift(x):
        from decimal import ROUND_HALF_UP
        return int(Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP) * 1000000)

    scored = sorted(
        ((r6(dot(v, probe) / (norm2(v) * pn)), i) for i, v in fx.embs),
        key=lambda t: (-t[0], t[1]))[:32]
    remaining = [(i, vecs[i], rel) for rel, i in scored]
    lam = 500
    sel = []
    rows = []
    while remaining and len(sel) < 8:
        best = None
        for i, v, rel in remaining:
            if sel:
                div = max(lift(cosine6(v, sv)) for _, sv in sel)
            else:
                div = 0
            score = lam * lift(rel) - (1000 - lam) * div
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, (i, v, rel, score))
        i, v, rel, score = best[1]
        sel.append((i, v))
        remaining = [c for c in remaining if c[0] != i]
        rows.append((len(sel), i, rel, score))
    return ("rank INT, vec_id BIGINT, rel DOUBLE, score_nano BIGINT", rows)


GENERATORS = {
    "q24": gen_q24, "q25": gen_q25, "q26": gen_q26, "q27": gen_q27,
    "q28": gen_q28, "q29": gen_q29, "q36": gen_q36, "q37": gen_q37,
    "q38": gen_q38, "q42": gen_q42,
    "q51": gen_q51, "q59": gen_q59, "q70": gen_q70, "q72": gen_q72,
    "q73": gen_q73, "q74": gen_q74, "q78": gen_q78, "q79": gen_q79,
    "q81": gen_q81, "q83": gen_q83, "q88": gen_q88, "q89": gen_q89,
    "q93": gen_q93, "q95": gen_q95, "q96": gen_q96, "q97": gen_q97,
    "q128": gen_q128, "q129": gen_q129, "q182": gen_q182, "q183": gen_q183,
    "q130": gen_q130, "q131": gen_q131, "q135": gen_q135,
    "q162": gen_q162, "q163": gen_q163, "q168": gen_q168,
    "q172": gen_q172, "q189": gen_q189, "q200": gen_q200,
    "q201": gen_q201,
}


def main(sf_dir, out_dir, only=()):
    os.makedirs(out_dir, exist_ok=True)
    fx = Fixtures(sf_dir)
    names = list(only) if only else sorted(GENERATORS)
    for name in names:
        schema, rows = GENERATORS[name](fx)
        con = duckdb.connect()
        con.execute(f"CREATE TABLE t({schema})")
        ph = ", ".join("?" * (schema.count(",") + 1))
        con.executemany(f"INSERT INTO t VALUES ({ph})", rows)
        path = os.path.join(out_dir, f"{name}_sf001.parquet")
        con.execute(f"COPY t TO '{path}' (FORMAT PARQUET)")
        con.close()
        print(f"wrote {len(rows):6d} rows -> {path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
