"""Parity of the pure-Python XXH64 with Catalyst's xxhash64 — the bucket
pruning in operators/bm25.py computes hive-partition ids driver-side from
this implementation, so a single mismatching string would silently drop a
term's postings from a search."""

from __future__ import annotations

import random
import string

import pytest
from pyspark.sql import functions as F

from llm_rankers_spark.functions.xxh64 import spark_term_bucket, xxhash64_str


def _cases() -> list[str]:
    rng = random.Random(7)
    cases = ["", "a", "import", "def", "self", "passage_42", "helper_fn_123", "the"]
    # every length across the 32-byte stripe / 8-byte word / 4-byte tail
    # boundaries of the algorithm, over the tokenizer's output alphabet
    for n in range(0, 70):
        cases.append("".join(rng.choice(string.ascii_lowercase + string.digits + "_") for _ in range(n)))
    # terms are ASCII by construction, but the implementation must be
    # correct for arbitrary UTF-8 (multi-byte encodings shift every lane)
    cases += ["héllo", "ünïcode_tørm", "日本語テスト", "emoji🙂tail", "x" * 31, "y" * 32, "z" * 33, "w" * 100]
    return cases


def test_xxhash64_matches_catalyst(spark):
    cases = _cases()
    rows = (
        spark.createDataFrame([(c,) for c in cases], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    )
    assert rows, "no rows"
    for r in rows:
        assert r["h"] == xxhash64_str(r["s"]), r["s"]


def test_term_bucket_matches_catalyst(spark):
    cases = [c for c in _cases() if c]
    rows = (
        spark.createDataFrame([(c,) for c in cases], "s string")
        .select("s", F.pmod(F.xxhash64("s"), F.lit(64)).alias("b"))
        .collect()
    )
    for r in rows:
        assert r["b"] == spark_term_bucket(r["s"], 64), r["s"]


def test_bucket_is_nonnegative():
    for t in ("a", "zzz", "import"):
        b = spark_term_bucket(t, 64)
        assert 0 <= b < 64


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
