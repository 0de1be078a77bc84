import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from llm_rankers_spark.functions.codec import (
    BLOCK,
    decode_varint,
    encode_varint,
    pack_postings,
    unpack_all,
    unpack_block,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert decode_varint(encode_varint(arr)).tolist() == values


def test_varint_boundaries():
    vals = [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**63 - 1]
    arr = np.array(vals, dtype=np.uint64)
    assert decode_varint(encode_varint(arr), len(vals)).tolist() == vals


@given(
    st.lists(st.tuples(st.integers(0, 10**9), st.integers(1, 500), st.integers(1, 5000)), min_size=1, max_size=400)
)
@settings(max_examples=100, deadline=None)
def test_pack_roundtrip(entries):
    # build strictly-increasing ordinals from gaps
    gaps = np.array([e[0] % 1000 + 1 for e in entries], dtype=np.int64)
    ords = np.cumsum(gaps)
    tfs = np.array([e[1] for e in entries], dtype=np.int64)
    dls = np.array([e[2] for e in entries], dtype=np.int64)
    p = pack_postings(ords, tfs, dls, avgdl=100.0)
    o2, t2, l2 = unpack_all(p)
    assert o2.tolist() == ords.tolist()
    assert t2.tolist() == tfs.tolist()
    assert l2.tolist() == dls.tolist()


def test_block_decode_matches_full():
    n = 1000
    rng = np.random.default_rng(7)
    ords = np.cumsum(rng.integers(1, 50, size=n))
    tfs = rng.integers(1, 30, size=n)
    dls = rng.integers(10, 3000, size=n)
    p = pack_postings(ords, tfs, dls, avgdl=500.0)
    nblocks = p.doc_offs.shape[0]
    assert nblocks == (n + BLOCK - 1) // BLOCK
    got_o, got_t, got_l = [], [], []
    for i in range(nblocks):
        o, t, l = unpack_block(
            p.docs_blob, p.tfs_blob, p.dls_blob, p.doc_offs, p.tf_offs, p.dl_offs, p.block_last, p.n, i
        )
        got_o.extend(o.tolist())
        got_t.extend(t.tolist())
        got_l.extend(l.tolist())
    assert got_o == ords.tolist()
    assert got_t == tfs.tolist()
    assert got_l == dls.tolist()


def test_block_max_is_upper_bound():
    n = 300
    rng = np.random.default_rng(3)
    ords = np.cumsum(rng.integers(1, 9, size=n))
    tfs = rng.integers(1, 100, size=n)
    dls = rng.integers(5, 900, size=n)
    avgdl = 200.0
    k1, b = 0.9, 0.4
    p = pack_postings(ords, tfs, dls, avgdl=avgdl, k1=k1, b=b)
    tfn = tfs / (tfs + k1 * (1 - b + b * dls / avgdl))
    for i in range(p.doc_offs.shape[0]):
        blk = tfn[i * BLOCK : (i + 1) * BLOCK]
        assert p.block_max_tfn[i] == pytest.approx(blk.max())
        assert (blk <= p.block_max_tfn[i] + 1e-12).all()


def test_non_increasing_ordinals_rejected():
    with pytest.raises(ValueError):
        pack_postings(np.array([3, 3]), np.array([1, 1]), np.array([1, 1]), avgdl=1.0)


def test_empty_posting():
    p = pack_postings(np.array([], dtype=np.int64), np.array([]), np.array([]), avgdl=1.0)
    o, t, l = unpack_all(p)
    assert o.size == 0 and t.size == 0 and l.size == 0


@given(
    st.lists(  # groups of (n_entries, gap-seed) — include exactly-BLOCK lists
        st.tuples(st.integers(1, BLOCK), st.integers(0, 10**6)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=100, deadline=None)
def test_batched_pack_byte_identical_to_per_list(groups):
    from llm_rankers_spark.functions.codec import pack_postings_batched

    ords_l, tfs_l, dls_l, starts = [], [], [], []
    pos = 0
    for n, seed in groups:
        g = np.random.default_rng(seed)
        ords_l.append(np.cumsum(g.integers(1, 1000, size=n, dtype=np.int64)))
        tfs_l.append(g.integers(1, 500, size=n, dtype=np.int64))
        dls_l.append(g.integers(1, 5000, size=n, dtype=np.int64))
        starts.append(pos)
        pos += n
    ords = np.concatenate(ords_l)
    tfs = np.concatenate(tfs_l)
    dls = np.concatenate(dls_l)
    got = pack_postings_batched(ords, tfs, dls, np.array(starts), avgdl=123.4)
    for i, (n, _) in enumerate(groups):
        want = pack_postings(ords_l[i], tfs_l[i], dls_l[i], avgdl=123.4)
        assert got["n"][i] == want.n == n
        assert got["docs_blob"][i] == want.docs_blob
        assert got["tfs_blob"][i] == want.tfs_blob
        assert got["dls_blob"][i] == want.dls_blob
        assert got["block_last"][i] == want.block_last.tolist()
        assert got["block_max_tfn"][i] == want.block_max_tfn.tolist()
        assert got["doc_offs"][i] == want.doc_offs.tolist()
        assert got["tf_offs"][i] == want.tf_offs.tolist()
        assert got["dl_offs"][i] == want.dl_offs.tolist()


def test_batched_pack_rejects_non_increasing_within_group():
    from llm_rankers_spark.functions.codec import pack_postings_batched

    # two groups; second group's interior delta is 0 — must raise even
    # though the cross-group boundary (5 -> 3) is legitimately "decreasing"
    ords = np.array([1, 5, 3, 3], dtype=np.int64)
    ones = np.ones(4, dtype=np.int64)
    pack_postings_batched(np.array([1, 5, 3, 9]), ones, ones, np.array([0, 2]), avgdl=10.0)
    with pytest.raises(ValueError):
        pack_postings_batched(ords, ones, ones, np.array([0, 2]), avgdl=10.0)
