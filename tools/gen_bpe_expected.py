#!/usr/bin/env python3
"""Independent BPE encoder → the q75 oracle's expected counts.

Re-implements the merge-table encoding spec (greedy lowest-rank adjacent
merge, whitespace pre-tokenization) in Python, INDEPENDENTLY of the Scala
kernel (`graft.functions.Bpe` / `BpeDocStats`), and writes per-document
(doc_id, bpe_tokens, bpe_chunks) for the driver's correctness scale
(sf0.01) to a checked-in parquet the DuckDB oracle reads. Two
implementations of the same deterministic algorithm = a differential
oracle; a bug in either side shows up as a hash mismatch.

Usage: python3 tools/gen_bpe_expected.py /root/testdata/sf0.01 \
         src/test/resources/graft/bpe_expected_sf001.parquet
"""
import sys
import duckdb

from train_bpe import pretokenize

CHUNK_TOKENS = 64


def load_merges(path="src/main/resources/graft/bpe_merges.txt"):
    ranks = {}
    byid = {i: bytes([i]) for i in range(256)}
    to_id = {}
    with open(path) as f:
        for r, line in enumerate(f):
            lh, rh = line.split()
            lb, rb = bytes.fromhex(lh), bytes.fromhex(rh)
            idl = lb[0] if len(lb) == 1 else to_id[lh]
            idr = rb[0] if len(rb) == 1 else to_id[rh]
            new_id = 256 + r
            to_id[lh + rh] = new_id
            byid[new_id] = lb + rb
            ranks[(idl, idr)] = (r, new_id)
    return ranks


def encode_word(word, ranks):
    ids = list(word.encode("utf-8"))
    while len(ids) > 1:
        best = None
        for i in range(len(ids) - 1):
            v = ranks.get((ids[i], ids[i + 1]))
            if v is not None and (best is None or v[0] < best[2]):
                best = (ids[i], ids[i + 1], v[0], v[1])
        if best is None:
            break
        idl, idr, _, new_id = best
        out, i = [], 0
        while i < len(ids):
            if i + 1 < len(ids) and ids[i] == idl and ids[i + 1] == idr:
                out.append(new_id)
                i += 2
            else:
                out.append(ids[i])
                i += 1
        ids = out
    return ids


def doc_stats(text, ranks, memo):
    total = cur = chunks = 0
    for w in pretokenize(text):
        if w not in memo:
            memo[w] = len(encode_word(w, ranks))
        c = memo[w]
        total += c
        if cur > 0 and cur + c > CHUNK_TOKENS:
            chunks += 1
            cur = 0
        cur += c
    if cur > 0:
        chunks += 1
    return total, chunks


def chunk_texts(text, ranks, memo):
    """Greedy word-boundary chunks of <= CHUNK_TOKENS BPE tokens —
    mirrors the BpeChunkTexts kernel independently."""
    chunks, cur, cur_tokens = [], [], 0
    for w in pretokenize(text):
        if w not in memo:
            memo[w] = len(encode_word(w, ranks))
        c = memo[w]
        if cur_tokens > 0 and cur_tokens + c > CHUNK_TOKENS:
            chunks.append(" ".join(cur))
            cur, cur_tokens = [], 0
        cur.append(w)
        cur_tokens += c
    if cur_tokens > 0:
        chunks.append(" ".join(cur))
    return chunks


def main(sf_dir, out_path, chunks_out_path=None):
    ranks = load_merges()
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    memo = {}
    recs = []
    chunk_recs = []
    for doc_id, text in rows:
        t, c = doc_stats(text or "", ranks, memo)
        recs.append((doc_id, t, c))
        for ord_, ch in enumerate(chunk_texts(text or "", ranks, memo)):
            chunk_recs.append((doc_id, ord_, len(ch), len(ch.split(" "))))
    con.execute("CREATE TABLE expected(doc_id BIGINT, bpe_tokens INT, "
                "bpe_chunks INT)")
    con.executemany("INSERT INTO expected VALUES (?, ?, ?)", recs)
    con.execute(f"COPY expected TO '{out_path}' (FORMAT PARQUET)")
    print(f"wrote {len(recs)} rows -> {out_path}")
    if chunks_out_path:
        con.execute("CREATE TABLE expected_chunks(doc_id BIGINT, "
                    "chunk_ord INT, n_chars INT, n_words INT)")
        con.executemany("INSERT INTO expected_chunks VALUES (?, ?, ?, ?)",
                        chunk_recs)
        con.execute(f"COPY expected_chunks TO '{chunks_out_path}' "
                    "(FORMAT PARQUET)")
        print(f"wrote {len(chunk_recs)} chunk rows -> {chunks_out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
