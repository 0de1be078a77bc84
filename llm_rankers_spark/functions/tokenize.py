"""Tokenization — the one function the engine and every oracle must share.

Rank-identity (BASELINE.json north_rule) is only achievable if the index
build, the query parser, the pure-Python pytest oracle, and (for ``simple``
mode) the DuckDB oracle SQL all tokenize identically. So the tokenizer is a
plain Python function (:func:`tokenize`) wrapped once in a ``pandas_udf``;
tests assert UDF ≡ plain-function parity.

Two modes:

- ``simple``: lowercase, split on ``[^a-z0-9]+``. Exactly expressible in
  ANSI SQL (DuckDB: ``string_split_regex(lower(x), '[^a-z0-9]+')``), which
  is what makes the driver's BM25 oracle check possible.
- ``code``: code-aware — split on non-alphanumerics, then split snake_case
  and camelCase identifiers into sub-tokens, lowercase everything. This is
  the analogue of the Lucene/Anserini analyzer the reference delegates to
  (Rank-R1/bright/index_corpus.sh:3-9); ours is defined here, in the open,
  so the pytest oracle can share it verbatim.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

SIMPLE_SPLIT_RE = re.compile(r"[^a-z0-9]+")
RAW_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
# camelCase boundaries: lower|digit → Upper, and ACRONYMWord → ACRONYM Word
CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")
MAX_TOKEN_LEN = 64


def tokenize_simple(text: str) -> list[str]:
    """Lowercase + split on non-alphanumeric. SQL-expressible."""
    if not text:
        return []
    return [t for t in SIMPLE_SPLIT_RE.split(text.lower()) if t]


@lru_cache(maxsize=1 << 16)
def _split_identifier(raw: str) -> tuple[str, ...]:
    parts: list[str] = []
    for chunk in raw.split("_"):
        if not chunk:
            continue
        for sub in CAMEL_RE.split(chunk):
            if sub:
                parts.append(sub.lower()[:MAX_TOKEN_LEN])
    return tuple(parts)


def tokenize_code(text: str) -> list[str]:
    """Code-aware: identifier extraction + snake/camel splitting, lowercased."""
    if not text:
        return []
    out: list[str] = []
    for raw in RAW_TOKEN_RE.findall(text):
        out.extend(_split_identifier(raw))
    return out


def tokenize(text: str, mode: str = "code") -> list[str]:
    if mode == "simple":
        return tokenize_simple(text)
    if mode == "code":
        return tokenize_code(text)
    raise ValueError(f"unknown tokenizer mode: {mode}")


def tokens_col(col: Column | str, mode: str = "code") -> Column:
    """Vectorized tokenizer column (pandas_udf; Arrow-batched, no per-row
    Python UDF — BASELINE.json input_hint)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        if mode == "simple":
            return s.map(lambda x: tokenize_simple(x) if x is not None else [])
        return s.map(lambda x: tokenize_code(x) if x is not None else [])

    return _tok(F.col(col) if isinstance(col, str) else col)
