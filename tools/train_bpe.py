#!/usr/bin/env python3
"""Train the checked-in byte-level BPE merge table (offline, deterministic).

Classic BPE training (Sennrich et al. 2016, byte-level base alphabet as in
GPT-2) over the fixture corpus: whitespace pre-tokenization (Java
`trim`/`split("\\s+")` semantics, matching `TextOps.words`), words as UTF-8
byte sequences, greedy highest-count pair merges with a lexicographic
tie-break so the table is bit-reproducible.

Output format (`src/main/resources/graft/bpe_merges.txt`): one merge per
line, `<left_hex> <right_hex>`, rank = 0-based line number; token ids are
0-255 for base bytes and 256+rank for merges. The Scala kernel
(`graft.functions.Bpe`) and the independent oracle encoder
(`tools/gen_bpe_expected.py`) both consume this file.

Usage: python3 tools/train_bpe.py /root/testdata/sf0.01 [n_merges]
"""
import sys
import collections
import duckdb

JAVA_WS = " \t\n\x0b\f\r"


def pretokenize(text):
    # Java: trim() strips <= U+0020; split("\\s+") splits ASCII whitespace.
    return [w for w in text.strip(JAVA_WS).replace("\t", " ")
            .replace("\n", " ").replace("\x0b", " ").replace("\f", " ")
            .replace("\r", " ").split(" ") if w]


def train(word_freqs, n_merges):
    # word as tuple of byte-seq tokens; each token is a bytes object
    words = {tuple(bytes([b]) for b in w.encode("utf-8")): f
             for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for toks, f in words.items():
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], [-x for x in kv[0][0]],
                                                  [-x for x in kv[0][1]]))
        (la, lb), cnt = best
        if cnt < 2:
            break
        merges.append((la, lb))
        merged = la + lb
        new_words = {}
        for toks, f in words.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == la and toks[i + 1] == lb:
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + f
        words = new_words
    return merges


def main(sf_dir, n_merges):
    con = duckdb.connect()
    texts = [r[0] for r in con.execute(
        f"SELECT text FROM '{sf_dir}/documents.parquet' "
        "WHERE text IS NOT NULL ORDER BY doc_id").fetchall()]
    freqs = collections.Counter()
    for t in texts:
        freqs.update(pretokenize(t))
    merges = train(freqs, n_merges)
    out = "src/main/resources/graft/bpe_merges.txt"
    with open(out, "w") as f:
        for la, lb in merges:
            f.write(f"{la.hex()} {lb.hex()}\n")
    print(f"wrote {len(merges)} merges over {len(freqs)} words -> {out}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 64)
