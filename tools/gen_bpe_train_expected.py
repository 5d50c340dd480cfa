#!/usr/bin/env python3
"""Independent BPE TRAINER → the q86 oracle's expected merge table.

Runs the reference Python training implementation (`train_bpe.train`:
classic Sennrich-style byte-level BPE — highest-count adjacent pair,
lexicographic smallest-bytes tie-break with longer-preferred on prefix
ties) over the sf0.01 fixture corpus and writes the first N merges as
(rank, left_hex, right_hex) to a checked-in parquet the DuckDB oracle
reads. The Scala side (`graft.functions.BpeTrain`) re-implements the
same deterministic spec Spark-natively (distributed word histogram +
per-iteration distributed pair counts); two implementations of one spec
= a differential oracle. Regenerate whenever the fixtures change.

Usage: python3 tools/gen_bpe_train_expected.py /root/testdata/sf0.01 \
         src/test/resources/graft/bpe_train_expected_sf001.parquet [n_merges]
"""
import sys
import collections

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from train_bpe import pretokenize, train


def main(sf_dir, out, n_merges):
    con = duckdb.connect()
    texts = [r[0] for r in con.execute(
        f"SELECT text FROM '{sf_dir}/documents.parquet' "
        "WHERE text IS NOT NULL ORDER BY doc_id").fetchall()]
    freqs = collections.Counter()
    for t in texts:
        freqs.update(pretokenize(t))
    merges = train(freqs, n_merges)
    table = pa.table({
        "rank": pa.array(range(len(merges)), type=pa.int32()),
        "left_hex": pa.array([la.hex() for la, _ in merges], type=pa.string()),
        "right_hex": pa.array([lb.hex() for _, lb in merges], type=pa.string()),
    })
    pq.write_table(table, out)
    print(f"wrote {len(merges)} expected merges -> {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 40)
