#!/usr/bin/env python3
"""Synthetic scale fixtures for the SCALING.md study (round 11).

The driver's fixtures stop at sf0.1 and /root/testdata is read-only, so
scaling curves need locally generated data. This generator reproduces
the OBSERVED distribution of the driver's `documents` / `embeddings`
tables (measured on sf0.1):

  documents: uniform 10-100 words from the same 31-word vocabulary
    (30 common words ~uniform + 'dup' at ~0.09%), lang weights
    en .412 / fr .148 / es .149 / de .140 / zh .151, 20 sources,
    ~0.16% exact-duplicate rate, n_chars = len(text).
  embeddings: 64-dim L2-NORMALIZED gaussian vectors (observed std
    1/8 per coord, norm 1.0), labels uniform 0..9.

Only these two tables are generated — the ten heavy operators audited
in SCALING.md read nothing else. Same generator at every multiplier, so
cross-scale comparisons are apples-to-apples; the m=1 point doubles as
a calibration check against the driver's real sf0.1.

  python3 tools/gen_scale_fixtures.py <outdir> <multiplier>
  # sf0.1-equivalent: m=1 (5k docs / 2k vecs); sf1: m=10
"""
import os
import sys

import duckdb
import numpy as np

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data",
         "fast", "filter", "group", "hash", "join", "key", "line",
         "merge", "order", "part", "query", "row", "scan", "slow",
         "small", "sort", "spark", "stream", "table", "the", "value",
         "vector", "window"]
LANGS = ["en", "fr", "es", "de", "zh"]
LANG_P = [0.4118, 0.1484, 0.1488, 0.1404, 0.1506]


def gen_documents(con, out, n, rng):
    lens = rng.integers(10, 101, size=n)
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    sources = rng.integers(0, 20, size=n)
    dup_of = rng.random(size=n) < 0.0016
    texts = []
    for i in range(n):
        if dup_of[i] and i > 0:
            texts.append(texts[rng.integers(0, i)])
            continue
        idx = rng.integers(0, len(VOCAB), size=lens[i])
        ws = [VOCAB[j] for j in idx]
        # the rare 'dup' token at its observed ~0.09% occurrence rate
        for k in np.nonzero(rng.random(size=lens[i]) < 0.0009)[0]:
            ws[k] = "dup"
        texts.append(" ".join(ws))
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?, ?, ?)",
        [(i, texts[i], langs[i], f"src{sources[i]}", len(texts[i]))
         for i in range(n)])
    con.execute(f"COPY documents TO '{out}/documents.parquet' (FORMAT PARQUET)")


def gen_embeddings(con, out, m, rng):
    v = rng.standard_normal((m, 64))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = v.astype(np.float32)
    labels = rng.integers(0, 10, size=m)
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[], "
                "label INT)")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?, ?)",
        [(i, [float(x) for x in v[i]], int(labels[i])) for i in range(m)])
    con.execute(f"COPY embeddings TO '{out}/embeddings.parquet' (FORMAT PARQUET)")


def main(out, mult):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    gen_documents(con, out, 5000 * mult, np.random.default_rng(42))
    gen_embeddings(con, out, 2000 * mult, np.random.default_rng(43))
    con.close()
    print(f"wrote {5000 * mult} docs / {2000 * mult} vecs -> {out}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
