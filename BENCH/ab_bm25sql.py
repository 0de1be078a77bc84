"""A/B worker: time the bm25_sql stage (bm25_dataframe_from_index over a
keep_forward index) for the repo at argv[1]. Prints one JSON line."""
import json
import shutil
import sys
import tempfile
import time

repo = sys.argv[1]
sys.path.insert(0, repo)

VOCAB = [
    "join", "hash", "row", "batch", "scan", "column", "customer", "filter", "small", "merge",
    "slow", "order", "vector", "line", "table", "data", "agg", "value", "key", "stream",
    "window", "spark", "group", "part", "big", "sort", "query", "fast", "the", "dup",
]

from llm_rankers_spark.corpus import driver_documents
from llm_rankers_spark.operators.bm25 import bm25_dataframe_from_index
from llm_rankers_spark.operators.index_build import build_index
from llm_rankers_spark.session import get_spark
import llm_rankers_spark.operators.index_build as _ib
force_slim = len(sys.argv) > 2 and sys.argv[2] == 'slim'
if force_slim:
    _ib.DRIVER_ORDINALS_MAX = 0

spark = get_spark(master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
docs = driver_documents(spark, "/root/testdata/sf0.1")
rows = []
for i in range(64):
    terms = [VOCAB[(i * 3 + j) % len(VOCAB)] for j in range(1 + i % 4)]
    rows.append((f"b{i}", " ".join(terms)))
qs = spark.createDataFrame(rows, "qid string, query string")

idx_path = tempfile.mkdtemp(prefix="llmrs_ab_idx_")
t0 = time.perf_counter()
idx = build_index(
    docs.select("docid", "content", "content_sha256"), idx_path,
    tokenizer_mode="simple", num_shards=16, keep_forward=True,
)
build_s = time.perf_counter() - t0

out = {"repo": repo + (":slim" if force_slim else ""), "build": round(build_s, 3)}
for key in ("sql_cold", "sql_warm"):
    t0 = time.perf_counter()
    bm25_dataframe_from_index(idx, qs, k=10).count()
    out[key] = round(time.perf_counter() - t0, 3)
shutil.rmtree(idx_path, ignore_errors=True)
spark.stop()
print(json.dumps(out))
