"""Deterministic sf1 testdata generator (round-4 verdict #1: prove the
design at 10x the bench scale).

/root/testdata stops at sf0.1 and is read-only, so the sf1 tables are
synthesized here with the SAME shape and distributions as the driver's
tables (measured from sf0.1: 30-word vocab, doc length uniform 10..100,
lang {en 41%, zh/es/fr/de ~15% each}, 20 sources; embeddings 64-dim
float32 + int label), scaled 10x: 50,000 documents, 20,000 embeddings.
Seed fixed -> byte-identical output across runs; no external data.

Usage: python BENCH/gen_sf1.py [out_dir]   (default /tmp/llmrs_sf1)
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "join", "hash", "row", "batch", "scan", "column", "customer", "filter", "small", "merge",
    "slow", "order", "vector", "line", "table", "data", "agg", "value", "key", "stream",
    "window", "spark", "group", "part", "big", "sort", "query", "fast", "the", "dup",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
N_DOCS = 50_000
N_VECS = 20_000
DIM = 64
SEED = 42


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    lens = rng.integers(10, 101, size=N_DOCS)
    words = rng.integers(0, len(VOCAB), size=int(lens.sum()))
    texts = []
    off = 0
    for ln in lens:
        texts.append(" ".join(VOCAB[w] for w in words[off : off + ln]))
        off += ln
    langs = rng.choice(LANGS, size=N_DOCS, p=LANG_P)
    sources = [f"src{i % 20}" for i in rng.integers(0, 20, size=N_DOCS)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs.tolist()),
                "source": pa.array(sources),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(out_dir, "documents.parquet"),
    )

    vecs = rng.standard_normal((N_VECS, DIM)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                "label": pa.array(rng.integers(0, 10, size=N_VECS).tolist(), pa.int32()),
            }
        ),
        os.path.join(out_dir, "embeddings.parquet"),
    )
    print(f"wrote {N_DOCS} docs + {N_VECS} embeddings to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/llmrs_sf1")
