import numpy as np
import pandas as pd
import pytest

from llm_rankers_spark.operators.pointwise import (
    SCORERS,
    mock_qlm_scorer,
    mock_yes_no_scorer,
    pointwise_rerank,
)


def _cands(spark, n_q=3, n_d=6):
    rows = []
    for q in range(n_q):
        for d in range(n_d):
            rows.append((f"q{q}", f"query {q}", f"d{d}", d + 1, f"text {q} {d}"))
    return spark.createDataFrame(rows, "qid string, query string, docid string, rank int, text string")


def test_yes_no_is_probability():
    q = pd.Series(["a"] * 50)
    t = pd.Series([f"t{i}" for i in range(50)])
    s = mock_yes_no_scorer(q, t)
    assert ((s > 0) & (s < 1)).all()
    # deterministic
    assert np.array_equal(s, mock_yes_no_scorer(q, t))


def test_qlm_scales_with_query_length():
    t = pd.Series(["same text"] * 2)
    s1 = mock_qlm_scorer(pd.Series(["one"]), pd.Series(["same text"]))
    s3 = mock_qlm_scorer(pd.Series(["one two three"]), pd.Series(["same text"]))
    assert s1[0] < 0 and s3[0] < 0
    assert s3[0] < s1[0]  # longer query → more negative CE sum
    assert len(s1) == 1 and len(t) == 2


@pytest.mark.parametrize("method", sorted(SCORERS))
def test_pointwise_rerank_spark(spark, method):
    out = pointwise_rerank(_cands(spark), method=method)
    rows = out.orderBy("qid", "rank").collect()
    assert len(rows) == 18
    # ranks dense 1..6 per qid, scores non-increasing
    for q in ["q0", "q1", "q2"]:
        grp = [r for r in rows if r["qid"] == q]
        assert [r["rank"] for r in grp] == list(range(1, 7))
        scores = [r["score"] for r in grp]
        assert scores == sorted(scores, reverse=True)


def test_pointwise_matches_local_scoring(spark):
    cands = _cands(spark)
    out = {(r["qid"], r["docid"]): r["score"] for r in pointwise_rerank(cands, "yes_no").collect()}
    pdf = cands.toPandas()
    want = mock_yes_no_scorer(pdf["query"], pdf["text"])
    for (qid, docid, score), w in zip(pdf[["qid", "docid"]].assign(s=want).itertuples(index=False), want):
        assert out[(qid, docid)] == pytest.approx(w)


def test_hits_cap(spark):
    out = pointwise_rerank(_cands(spark, n_d=10), method="yes_no", hits=4)
    assert out.groupBy("qid").count().agg({"count": "max"}).collect()[0][0] == 4
