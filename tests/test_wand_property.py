"""Property-based check of the block-max WAND kernel (SURVEY §5: random
tiny corpora; invariant WAND ≡ exhaustive). Pure-python — no Spark session —
so hypothesis can hammer the pivot/skip/bound logic (including the BMW d'+1
advance rule) across hundreds of random corpora."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from llm_rankers_spark.functions.codec import DEFAULT_B, DEFAULT_K1, pack_postings
from llm_rankers_spark.operators.bm25 import (
    _score_rows_block_max,
    _score_rows_exhaustive,
    _score_rows_wand,
)


def _row(p):
    return {
        "n": p.n,
        "docs_blob": p.docs_blob,
        "tfs_blob": p.tfs_blob,
        "dls_blob": p.dls_blob,
        "doc_offs": p.doc_offs,
        "tf_offs": p.tf_offs,
        "dl_offs": p.dl_offs,
        "block_last": p.block_last,
        "block_max_tfn": p.block_max_tfn,
    }


corpus_strategy = st.tuples(
    st.integers(min_value=1, max_value=400),  # n_docs
    st.integers(min_value=1, max_value=6),  # n_terms
    st.integers(min_value=1, max_value=25),  # k
    st.randoms(use_true_random=False),
)


@given(corpus_strategy)
@settings(max_examples=150, deadline=None)
def test_wand_equals_exhaustive_random_corpora(args):
    n_docs, n_terms, k, rng = args
    dls = [rng.randint(1, 200) for _ in range(n_docs)]
    avgdl = float(sum(dls)) / n_docs
    rows = []
    for t in range(n_terms):
        df = rng.randint(1, n_docs)
        docs = sorted(rng.sample(range(n_docs), df))
        ords = np.array(docs, dtype=np.int64)
        tfs = np.array([rng.randint(1, max(1, dls[d])) for d in docs], dtype=np.int64)
        term_dls = np.array([dls[d] for d in docs], dtype=np.int64)
        p = pack_postings(ords, tfs, term_dls, avgdl=avgdl, k1=DEFAULT_K1, b=DEFAULT_B)
        weight = rng.uniform(0.01, 5.0)
        rows.append((_row(p), weight))

    ex = _score_rows_exhaustive("q", rows, k, DEFAULT_K1, DEFAULT_B, avgdl)
    wd = _score_rows_wand("q", rows, k, DEFAULT_K1, DEFAULT_B, avgdl, use_block_max=True)
    assert wd["ord"].tolist() == ex["ord"].tolist(), (
        f"docids diverge (n={n_docs}, terms={n_terms}, k={k})"
    )
    np.testing.assert_allclose(wd["score"].to_numpy(), ex["score"].to_numpy(), rtol=0, atol=1e-12)
    # plain-WAND bound mode (safe_ub) must agree as well
    wd2 = _score_rows_wand("q", rows, k, DEFAULT_K1, DEFAULT_B, avgdl, use_block_max=False, safe_ub=True)
    assert wd2["ord"].tolist() == ex["ord"].tolist()
    # the vectorized interval-pruned kernel (round-3 hot-list path) must be
    # bit-identical too — same sorted-term accumulation order
    bm = _score_rows_block_max("q", rows, k, DEFAULT_K1, DEFAULT_B, avgdl)
    assert bm["ord"].tolist() == ex["ord"].tolist()
    np.testing.assert_array_equal(bm["score"].to_numpy(), ex["score"].to_numpy())
