"""llm_rankers_spark — a PySpark-native full-text retrieval + rerank engine.

A brand-new engine with the query/data-processing capabilities of
ielab/llm-rankers (reference at /root/reference, studied for behavior only):

- inverted-index build over an Iceberg-shaped source-code table
  ``(repo, path, commit, lang, content)`` — code-aware tokenization,
  delta+varint-compressed posting lists with block-max metadata and
  skip offsets, document-range sharding for skew (hot terms like
  ``import``/``def`` are split across every shard automatically);
- BM25 (k1=0.9, b=0.4; reference README.md:70) top-k via block-max WAND
  traversal with a bounded min-heap, plus an exhaustive DataFrame path
  used as the correctness oracle;
- the reference's Setwise / Pairwise / Listwise / Pointwise rerank loops
  re-expressed as batched Arrow-UDF passes (llmrankers/setwise.py,
  pairwise.py, listwise.py — semantics preserved loop-for-loop);
- TREC run scan/sink, run filtering, fusion, NDCG@10 eval;
- training-data pipeline extras: dedup (exact/MinHash-LSH/SimHash/
  n-gram-Jaccard), embedding similarity search, text quality stats,
  multimodal column plumbing.

Everything is expressed as DataFrame jobs: built-in pyspark.sql functions
first, vectorized pandas/Arrow UDFs where Spark lacks the primitive, no
per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"

from llm_rankers_spark.session import get_spark  # noqa: F401
