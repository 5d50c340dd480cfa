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

  python3 tools/gen_scale_fixtures.py <outdir> <multiplier> [zipf_s]
  # sf0.1-equivalent: m=1 (5k docs / 2k vecs); sf1: m=10

Round 12: an optional third arg switches on Zipf(s)-skewed keys — the
100 TB dimension the near-uniform fixtures cannot measure (hot
sources, boilerplate docs, celebrity users). With zipf_s > 0 (the
study uses 1.2):

  documents.source   ~ Zipf over the 20 sources (top ~22%)
  duplicate texts    rate 10%, copied from a 20-text boilerplate pool
                     picked with Zipf weights — duplicated mass
                     concentrates on one hot text (~2.2% of the corpus
                     is ONE string at s=1.2)
  events.user_id     ~ Zipf over the user domain (top user ~22% of
                     all events)
  orders.o_custkey   ~ Zipf over customers (one window partition /
                     join key carries ~21% of orders)

zipf_s=0 (the default) reproduces the round-11 uniform fixtures
byte-for-byte — the skew branches never touch the rng otherwise.
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


def zipf_p(k, s):
    w = np.arange(1, k + 1, dtype=float) ** (-s)
    return w / w.sum()


def gen_documents(con, out, n, rng, zipf_s=0.0):
    lens = rng.integers(10, 101, size=n)
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    if zipf_s > 0:
        sources = rng.choice(20, size=n, p=zipf_p(20, zipf_s))
        dup_of = rng.random(size=n) < 0.10
        # boilerplate pool: which text a duplicate copies is itself
        # Zipf-picked, so duplicated mass concentrates on one hot string
        pool = [" ".join(VOCAB[j] for j in
                         rng.integers(0, len(VOCAB), size=pl))
                for pl in rng.integers(10, 101, size=20)]
        pool_pick = rng.choice(20, size=n, p=zipf_p(20, zipf_s))
    else:
        sources = rng.integers(0, 20, size=n)
        dup_of = rng.random(size=n) < 0.0016
    texts = []
    for i in range(n):
        if dup_of[i] and i > 0:
            texts.append(pool[pool_pick[i]] if zipf_s > 0
                         else texts[rng.integers(0, i)])
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


def gen_events(con, out, n, rng, zipf_s=0.0):
    """Matches the observed sf0.1 events distribution: 5 uniform event
    types, user_id uniform over n/67 users, ts uniform over 30 days of
    2024-01, value ~ |N(0,1)|-scaled into the observed 0-560 range,
    props = {"k": int}. Written as TIMESTAMPTZ (UTC-adjusted micros) so
    Spark reads TimestampType, matching what Tables.events yields after
    its NANOS conversion — a naive TIMESTAMP would surface as
    TIMESTAMP_NTZ and break unix_micros-based queries (q13)."""
    types = np.array(["signup", "purchase", "view", "click", "error"])
    users = max(1, n // 67)  # sf0.1: 100k events / 1500 users
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    ts = t0 + rng.integers(0, 30 * 86400 * 1_000_000, size=n).astype("timedelta64[us]")
    ev_type = types[rng.integers(0, 5, size=n)]
    value = np.round(np.abs(rng.standard_normal(n)) * 120.0, 2)
    props_k = rng.integers(0, 100, size=n)
    # celebrity users: Zipf over the user domain (skew mode only; the
    # default keeps the original per-row uniform draw so the uniform
    # fixtures stay byte-identical across rounds)
    uids = (rng.choice(users, size=n, p=zipf_p(users, zipf_s))
            if zipf_s > 0 else None)
    con.execute("SET timezone = 'UTC'")
    con.execute("CREATE TABLE events(event_id BIGINT, ts TIMESTAMPTZ, "
                "user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)")
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)",
        [(i, ts[i].item(),
          int(uids[i]) if uids is not None else int(rng.integers(0, users)),
          ev_type[i],
          float(value[i]), '{"k": %d}' % props_k[i]) for i in range(n)])
    con.execute(f"COPY events TO '{out}/events.parquet' (FORMAT PARQUET)")


def gen_lineitem(con, out, n_orders, rng):
    """Matches the observed sf0.1 lineitem shape: lines-per-order ~
    Poisson(4) with empty orders dropped (the observed multiplicity
    histogram), l_linenumber uniform 1-7 INDEPENDENT of position
    ((orderkey, linenumber) is NOT unique — CLAUDE.md), part/supp keys
    uniform at the observed scale ratios, uniform flags, price in the
    observed 900-105000 band, shipdate uniform 1995-2001."""
    n_lines = rng.poisson(4.0, size=n_orders)
    rows = []
    t0 = np.datetime64("1995-01-01", "s")
    span = int((np.datetime64("2001-11-04", "s") - t0) / np.timedelta64(1, "s"))
    flags = ["A", "N", "R"]
    for ok in range(n_orders):
        for _ in range(n_lines[ok]):
            rows.append((
                ok, int(rng.integers(0, max(1, n_orders // 8))),
                int(rng.integers(0, max(1, n_orders // 150))),
                int(rng.integers(1, 8)),
                float(rng.integers(1, 51)),
                round(900.0 + float(rng.random()) * 104100.0, 2),
                round(float(rng.integers(0, 11)) / 100.0, 2),
                round(float(rng.integers(0, 9)) / 100.0, 2),
                flags[rng.integers(0, 3)],
                "F" if rng.random() < 0.5 else "O",
                (t0 + np.timedelta64(int(rng.integers(0, span)), "s")).item()))
    con.execute(
        "CREATE TABLE lineitem(l_orderkey BIGINT, l_partkey BIGINT, "
        "l_suppkey BIGINT, l_linenumber INT, l_quantity DOUBLE, "
        "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
        "l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP)")
    con.executemany(
        "INSERT INTO lineitem VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY lineitem TO '{out}/lineitem.parquet' (FORMAT PARQUET)")
    return len(rows)


def gen_orders_customer(con, out, n_orders, rng, zipf_s=0.0):
    """orders + customer at the observed sf0.1 shape: 10 orders per
    customer, uniform status/priority/mktsegment categories, totalprice
    uniform in the observed band, orderdate uniform 1995-2001 (naive
    TIMESTAMP — the real fixtures are TIMESTAMP_NTZ)."""
    n_cust = max(1, n_orders // 10)
    t0 = np.datetime64("1995-01-01", "s")
    span = int((np.datetime64("2001-08-01", "s") - t0) / np.timedelta64(1, "s"))
    statuses = ["O", "P", "F"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    segs = ["MACHINERY", "BUILDING", "FURNITURE", "HOUSEHOLD", "AUTOMOBILE"]
    # hot customer: one window partition / join key carrying ~21% of all
    # orders at s=1.2 (skew mode only)
    cust_pick = (rng.choice(n_cust, size=n_orders, p=zipf_p(n_cust, zipf_s))
                 if zipf_s > 0 else None)
    con.execute("CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT, "
                "o_orderstatus VARCHAR, o_totalprice DOUBLE, "
                "o_orderdate TIMESTAMP, o_orderpriority VARCHAR)")
    con.executemany(
        "INSERT INTO orders VALUES (?, ?, ?, ?, ?, ?)",
        [(i,
          int(cust_pick[i]) if cust_pick is not None
          else int(rng.integers(0, n_cust)),
          statuses[rng.integers(0, 3)],
          round(1000.0 + float(rng.random()) * 499000.0, 2),
          (t0 + np.timedelta64(int(rng.integers(0, span)), "s")).item(),
          prios[rng.integers(0, 5)]) for i in range(n_orders)])
    con.execute(f"COPY orders TO '{out}/orders.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE customer(c_custkey BIGINT, c_name VARCHAR, "
                "c_nationkey INT, c_acctbal DOUBLE, c_mktsegment VARCHAR)")
    con.executemany(
        "INSERT INTO customer VALUES (?, ?, ?, ?, ?)",
        [(i, f"Customer#{i:09d}", int(rng.integers(0, 25)),
          round(-1000.0 + float(rng.random()) * 11000.0, 2),
          segs[rng.integers(0, 5)]) for i in range(n_cust)])
    con.execute(f"COPY customer TO '{out}/customer.parquet' (FORMAT PARQUET)")
    return n_cust


def main(out, mult, zipf_s=0.0):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    gen_documents(con, out, 5000 * mult, np.random.default_rng(42), zipf_s)
    gen_embeddings(con, out, 2000 * mult, np.random.default_rng(43))
    gen_events(con, out, 10000 * mult, np.random.default_rng(44), zipf_s)
    nl = gen_lineitem(con, out, 15000 * mult, np.random.default_rng(45))
    nc = gen_orders_customer(con, out, 15000 * mult, np.random.default_rng(46),
                             zipf_s)
    con.close()
    skew = f" zipf_s={zipf_s}" if zipf_s > 0 else ""
    print(f"wrote {5000 * mult} docs / {2000 * mult} vecs / "
          f"{10000 * mult} events / {nl} lineitem / "
          f"{15000 * mult} orders / {nc} customers{skew} -> {out}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]),
         float(sys.argv[3]) if len(sys.argv) > 3 else 0.0)
