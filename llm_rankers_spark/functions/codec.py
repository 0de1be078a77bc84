"""Posting-list codec: delta + varint (LEB128) with block-max metadata.

The reference delegates index storage to Lucene (Rank-R1/bright/
index_corpus.sh:3-9); this module is our native replacement. Everything is
numpy-vectorized so it runs fast inside Arrow-batched UDFs (no per-row
Python in the hot path).

Layout of one packed posting list (one (term, shard) row):

- ``docs_blob``  : varint stream of doc-ordinal deltas (first value is the
  ordinal itself; block *i*'s first delta is relative to block *i-1*'s last
  ordinal, so any block can be decoded after a skip using ``block_last``).
- ``tfs_blob``   : varint stream of term frequencies, same order.
- ``dls_blob``   : varint stream of document lengths, same order. Storing dl
  inline (like Lucene's norms, one value per posting) keeps BM25 scoring a
  single sequential read — no N-way join against a doc-length table at
  query time, which is the difference between a scan and a shuffle at
  10^12 docs.
- ``block_last`` : last doc ordinal of each 128-entry block (skip pointers).
- ``block_max_tfn``: per-block max of tf/(tf + k1*(1-b+b*dl/avgdl)) at the
  index-default (k1=0.9, b=0.4) — the block-max WAND upper bound is
  ``idf * block_max_tfn``. Valid only for the baked parameters; the scorer
  falls back to ``idf * 1.0`` bounds (plain WAND) when queried with others.
- ``doc_offs``/``tf_offs``/``dl_offs``: byte offset of each block's start in
  the corresponding blob, enabling block-aligned decode after a skip.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK = 128
DEFAULT_K1 = 0.9  # reference README.md:70 (pyserini --k1 0.9 --b 0.4)
DEFAULT_B = 0.4

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7 = _U64(0x7F)


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized, no per-value Python loop)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (1..10)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= (_U64(1) << _U64(7 * k))).astype(np.int64)
    offs = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offs[1:])
    out = np.zeros(int(offs[-1] + nbytes[-1]), dtype=np.uint8)
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        byte = ((v[mask] >> _U64(7 * j)) & _MASK7).astype(np.uint8)
        cont = ((nbytes[mask] - 1) > j).astype(np.uint8) << 7
        out[offs[mask] + j] = byte | cont
    return out.tobytes()


def encode_varint_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Like :func:`encode_varint` but also return per-value byte lengths."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= (_U64(1) << _U64(7 * k))).astype(np.int64)
    return encode_varint(v), nbytes


def decode_varint(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 stream to uint64 (vectorized via reduceat)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=_U64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    idx = np.arange(b.size, dtype=np.int64)
    group = np.searchsorted(ends, idx)
    shift = ((idx - starts[group]) * 7).astype(_U64)
    chunks = (b.astype(_U64) & _MASK7) << shift
    out = np.bitwise_or.reduceat(chunks, starts)
    if count is not None and out.size != count:
        raise ValueError(f"decoded {out.size} values, expected {count}")
    return out


@dataclass
class PackedPostings:
    n: int
    docs_blob: bytes
    tfs_blob: bytes
    dls_blob: bytes
    block_last: np.ndarray  # int64, per block
    block_max_tfn: np.ndarray  # float64, per block
    doc_offs: np.ndarray  # int64 byte offsets, per block
    tf_offs: np.ndarray
    dl_offs: np.ndarray


def _block_offsets(lengths: np.ndarray, n: int) -> np.ndarray:
    """Byte offset of each BLOCK-aligned block start given per-value lengths."""
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=cum[1:])
    return cum[0:n:BLOCK].copy()


def pack_postings(
    doc_ords: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> PackedPostings:
    """Pack one posting list (doc ordinals must be strictly increasing)."""
    doc_ords = np.ascontiguousarray(doc_ords, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    n = doc_ords.size
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return PackedPostings(0, b"", b"", b"", z, z.astype(np.float64), z, z, z)

    deltas = np.empty(n, dtype=np.int64)
    deltas[0] = doc_ords[0]
    np.subtract(doc_ords[1:], doc_ords[:-1], out=deltas[1:])
    if n > 1 and (deltas[1:] <= 0).any():
        raise ValueError("doc ordinals must be strictly increasing")

    docs_blob, dlen = encode_varint_with_lengths(deltas)
    tfs_blob, tlen = encode_varint_with_lengths(tfs)
    dls_blob, llen = encode_varint_with_lengths(dls)

    nblocks = (n + BLOCK - 1) // BLOCK
    block_last = doc_ords[np.minimum(np.arange(1, nblocks + 1) * BLOCK, n) - 1]
    tfn = tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl))
    block_max_tfn = np.array(
        [tfn[i * BLOCK : (i + 1) * BLOCK].max() for i in range(nblocks)],
        dtype=np.float64,
    )
    return PackedPostings(
        n=n,
        docs_blob=docs_blob,
        tfs_blob=tfs_blob,
        dls_blob=dls_blob,
        block_last=block_last.astype(np.int64),
        block_max_tfn=block_max_tfn,
        doc_offs=_block_offsets(dlen, n),
        tf_offs=_block_offsets(tlen, n),
        dl_offs=_block_offsets(llen, n),
    )


def pack_postings_batched(
    doc_ords: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    starts: np.ndarray,
    avgdl: float,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> dict[str, list]:
    """Pack MANY single-block posting lists (each ≤ BLOCK entries) in one
    vectorized pass — byte-identical to per-list :func:`pack_postings`.

    A code corpus has millions of rare identifier terms whose posting lists
    hold a handful of entries; per-list numpy-call overhead (not the
    encoding itself) dominates the index build there. LEB128 encodes each
    value independently, so the concatenation of per-list blobs equals the
    per-list slices of one whole-array encoding — three encodes per Arrow
    batch instead of three per term.

    ``doc_ords``/``tfs``/``dls`` are the concatenated lists; ``starts`` the
    group start indices (groups contiguous, each strictly increasing).
    Returns columns keyed like the postings schema, one list element per
    group.
    """
    n_total = int(doc_ords.size)
    if n_total == 0:
        return {c: [] for c in (
            "n", "docs_blob", "tfs_blob", "dls_blob", "block_last",
            "block_max_tfn", "doc_offs", "tf_offs", "dl_offs",
        )}
    doc_ords = np.ascontiguousarray(doc_ords, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = n_total

    deltas = np.empty(n_total, dtype=np.int64)
    deltas[1:] = doc_ords[1:] - doc_ords[:-1]
    deltas[starts] = doc_ords[starts]
    interior = np.ones(n_total, dtype=bool)
    interior[starts] = False
    if (deltas[interior] <= 0).any():
        raise ValueError("doc ordinals must be strictly increasing")

    docs_blob, dlen = encode_varint_with_lengths(deltas)
    tfs_blob, tlen = encode_varint_with_lengths(tfs)
    dls_blob, llen = encode_varint_with_lengths(dls)

    def byte_ranges(lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        cum = np.zeros(n_total + 1, dtype=np.int64)
        np.cumsum(lengths, out=cum[1:])
        return cum[starts], cum[ends]

    d_lo, d_hi = byte_ranges(dlen)
    t_lo, t_hi = byte_ranges(tlen)
    l_lo, l_hi = byte_ranges(llen)

    tfn = tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl))
    bmax = np.maximum.reduceat(tfn, starts)
    last = doc_ords[ends - 1]
    counts = ends - starts

    g = starts.size
    zero = [0]
    return {
        "n": [int(c) for c in counts],
        "docs_blob": [docs_blob[d_lo[i] : d_hi[i]] for i in range(g)],
        "tfs_blob": [tfs_blob[t_lo[i] : t_hi[i]] for i in range(g)],
        "dls_blob": [dls_blob[l_lo[i] : l_hi[i]] for i in range(g)],
        "block_last": [[int(last[i])] for i in range(g)],
        "block_max_tfn": [[float(bmax[i])] for i in range(g)],
        "doc_offs": [zero] * g,
        "tf_offs": [zero] * g,
        "dl_offs": [zero] * g,
    }


def unpack_all(p: "PackedPostings | dict") -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a whole posting list → (doc_ords, tfs, dls)."""
    if isinstance(p, dict):
        n, docs_blob, tfs_blob, dls_blob = p["n"], p["docs_blob"], p["tfs_blob"], p["dls_blob"]
    else:
        n, docs_blob, tfs_blob, dls_blob = p.n, p.docs_blob, p.tfs_blob, p.dls_blob
    deltas = decode_varint(docs_blob, n).astype(np.int64)
    doc_ords = np.cumsum(deltas)
    tfs = decode_varint(tfs_blob, n).astype(np.int64)
    dls = decode_varint(dls_blob, n).astype(np.int64)
    return doc_ords, tfs, dls


def unpack_block(
    docs_blob: bytes,
    tfs_blob: bytes,
    dls_blob: bytes,
    doc_offs: np.ndarray,
    tf_offs: np.ndarray,
    dl_offs: np.ndarray,
    block_last: np.ndarray,
    n: int,
    i: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode block *i* only (used by WAND after a skip)."""
    nblocks = doc_offs.shape[0]
    lo = i * BLOCK
    hi = min(lo + BLOCK, n)
    cnt = hi - lo
    d_end = doc_offs[i + 1] if i + 1 < nblocks else len(docs_blob)
    t_end = tf_offs[i + 1] if i + 1 < nblocks else len(tfs_blob)
    l_end = dl_offs[i + 1] if i + 1 < nblocks else len(dls_blob)
    deltas = decode_varint(memoryview(docs_blob)[doc_offs[i] : d_end], cnt).astype(np.int64)
    base = 0 if i == 0 else int(block_last[i - 1])
    doc_ords = base + np.cumsum(deltas)
    tfs = decode_varint(memoryview(tfs_blob)[tf_offs[i] : t_end], cnt).astype(np.int64)
    dls = decode_varint(memoryview(dls_blob)[dl_offs[i] : l_end], cnt).astype(np.int64)
    return doc_ords, tfs, dls
