#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline workload once on local[$SPARK_GRAFT_CPUS] over
$SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract).

--scaling: runs the same workload at local[8] and local[32] on identical
input and reports throughput at both plus scaling efficiency
(= T32 / (4 * T8)) into BENCH/BASELINE.md — the sandbox stand-in for the
north rule's N vs 4N executor criterion (no real cluster available here).

Workload (all through the real engine paths):
  build        index build over the documents table (docs/sec)
  bm25_wand    64-query batch, block-max WAND top-10 (queries/sec)
  bm25_sql     same batch through the declarative DataFrame plan
  rerank       setwise-heapsort rerank of 20 candidates x all queries
  minhash      MinHash signatures + LSH candidate pairs over documents
  cosine       exact cosine top-10, 32 query vectors over embeddings
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

VOCAB = [
    "join", "hash", "row", "batch", "scan", "column", "customer", "filter", "small", "merge",
    "slow", "order", "vector", "line", "table", "data", "agg", "value", "key", "stream",
    "window", "spark", "group", "part", "big", "sort", "query", "fast", "the", "dup",
]


def bench_queries(spark, n=64):
    rows = []
    for i in range(n):
        terms = [VOCAB[(i * 3 + j) % len(VOCAB)] for j in range(1 + i % 4)]
        rows.append((f"b{i}", " ".join(terms)))
    return spark.createDataFrame(rows, "qid string, query string")


def run_scaling_workload(master: str, n_docs: int, n_queries: int = 256) -> dict[str, float]:
    """Scaling probe on the synthetic code corpus (FIXTURES.md §1 shape):
    enough tokenization/shuffle/pack work that parallelism, not fixed
    driver costs, dominates — the honest N vs 4N comparison."""
    import tempfile

    from llm_rankers_spark.corpus import generate_corpus, with_docid
    from llm_rankers_spark.operators.bm25 import search
    from llm_rankers_spark.operators.index_build import build_index
    from llm_rankers_spark.session import get_spark

    spark = get_spark(app_name=f"bench_scale_{master}", master=master)
    try:
        docs = with_docid(generate_corpus(spark, n_docs, seed=42, partitions=64)).persist()
        docs.count()  # materialize generation outside the timed section
        times: dict[str, float] = {"n_docs": float(n_docs), "n_queries": float(n_queries)}

        idx_path = tempfile.mkdtemp(prefix="llmrs_scale_idx_")
        t0 = time.perf_counter()
        idx = build_index(
            docs.select("docid", "content", "content_sha256"), idx_path, tokenizer_mode="code", num_shards=32
        )
        times["build"] = time.perf_counter() - t0

        qrows = []
        pool = ["parse", "query", "import", "def", "return", "self", "request", "handler",
                "stream", "batch", "merge", "index", "block", "shard", "posting", "helper"]
        for i in range(n_queries):
            terms = [pool[(i * 5 + j) % len(pool)] for j in range(1 + i % 4)]
            qrows.append((f"s{i}", " ".join(terms)))
        qs = spark.createDataFrame(qrows, "qid string, query string")
        t0 = time.perf_counter()
        search(idx, qs, k=10, method="wand").count()
        times["bm25_wand"] = time.perf_counter() - t0

        shutil.rmtree(idx_path, ignore_errors=True)
        docs.unpersist()
        return times
    finally:
        spark.stop()


def run_workload(master: str, sf_dir: str, scale_only: bool = False) -> dict[str, float]:
    from pyspark.sql import functions as F

    from llm_rankers_spark.corpus import driver_documents
    from llm_rankers_spark.operators.bm25 import bm25_dataframe, search
    from llm_rankers_spark.operators.dedup import minhash_lsh_candidates, minhash_signatures
    from llm_rankers_spark.operators.index_build import build_index
    from llm_rankers_spark.operators.rerank import MockComparator, rerank
    from llm_rankers_spark.operators.runs import attach_text
    from llm_rankers_spark.operators.similarity import cosine_topk
    from llm_rankers_spark.session import get_spark

    spark = get_spark(app_name=f"bench_{master}", master=master)
    try:
        docs = driver_documents(spark, sf_dir)
        n_docs = docs.count()
        qs = bench_queries(spark)
        n_queries = qs.count()
        times: dict[str, float] = {"n_docs": float(n_docs), "n_queries": float(n_queries)}

        idx_path = tempfile.mkdtemp(prefix="llmrs_bench_idx_")
        t0 = time.perf_counter()
        idx = build_index(
            docs.select("docid", "content", "content_sha256"),
            idx_path,
            tokenizer_mode="simple",
            num_shards=16,
        )
        times["build"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        search(idx, qs, k=10, method="wand").count()
        times["bm25_wand"] = time.perf_counter() - t0

        if not scale_only:
            t0 = time.perf_counter()
            bm25_dataframe(docs, qs, k=10, mode="simple").count()
            times["bm25_sql"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            first = search(idx, qs, k=20, method="wand")
            cands = attach_text(first, docs).join(qs, "qid").select("qid", "query", "docid", "rank", "text")
            rerank(cands, method="setwise.heapsort", comparator=MockComparator(), k=10, num_child=2).count()
            times["rerank"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            sigs = minhash_signatures(docs, id_col="docid", num_hashes=32, shingle_k=3)
            minhash_lsh_candidates(sigs, num_hashes=32, bands=16).count()
            times["minhash"] = time.perf_counter() - t0

            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
                "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding")
            )
            qv = emb.limit(32).select(
                F.concat(F.lit("v"), F.col("vec_id").cast("string")).alias("qid"),
                F.col("embedding").alias("qvec"),
            )
            t0 = time.perf_counter()
            cosine_topk(emb, qv, k=10).count()
            times["cosine"] = time.perf_counter() - t0

        shutil.rmtree(idx_path, ignore_errors=True)
        return times
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true", help="two-point local[8] vs local[32] run → BENCH/BASELINE.md")
    ap.add_argument("--scale-worker", default=None, help="internal: run one scaling measurement in this master")
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()

    if args.scale_worker:
        n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "100000"))
        print(json.dumps(run_scaling_workload(args.scale_worker, n_docs)))
        return

    if args.scaling:
        # Sized so parallel work dominates per-session fixed costs (worker
        # startup, job scheduling) — below ~60k docs the 32-core run is
        # overhead-bound and the comparison measures the harness, not the
        # engine. Each measurement runs in a FRESH subprocess, alternating
        # configs, best-of-2, to cancel JVM/page-cache/load drift.
        import subprocess

        def measure(master: str) -> dict[str, float]:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--scale-worker", master],
                capture_output=True, text=True, check=True,
            )
            return json.loads(out.stdout.strip().splitlines()[-1])

        runs = {"local[8]": [], "local[32]": []}
        for _ in range(2):
            for master in ("local[8]", "local[32]"):
                runs[master].append(measure(master))

        def best(master: str) -> dict[str, float]:
            return {
                k: min(r[k] for r in runs[master]) if k not in ("n_docs", "n_queries") else runs[master][0][k]
                for k in runs[master][0]
            }

        lo, hi = best("local[8]"), best("local[32]")
        rows = []
        for key, unit_count in [("build", lo["n_docs"]), ("bm25_wand", lo["n_queries"])]:
            thr_lo = unit_count / lo[key]
            thr_hi = unit_count / hi[key]
            eff = thr_hi / (4.0 * thr_lo)
            rows.append((key, thr_lo, thr_hi, eff))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/BASELINE.md", "w") as f:
            f.write("# BENCH — two-point scaling evidence (local[8] vs local[32])\n\n")
            f.write(f"Input: synthetic code corpus, {int(lo['n_docs'])} docs (seed=42), {int(lo['n_queries'])} BM25 queries; ")
            f.write("identical workload at both parallelism levels — sandbox stand-in for N vs 4N executors.\n\n")
            f.write("| stage | unit | throughput @8 | throughput @32 | efficiency (thr32 / 4·thr8) |\n")
            f.write("|---|---|---|---|---|\n")
            units = {"build": "docs/s", "bm25_wand": "queries/s"}
            for key, tl, th, eff in rows:
                f.write(f"| {key} | {units[key]} | {tl:.1f} | {th:.1f} | {eff:.3f} |\n")
            f.write(
                "\nNote: local-mode runs share one JVM; fixed driver-side costs "
                "(job scheduling, Arrow setup, query planning) are NOT amortized by more cores, "
                "so these efficiencies are a conservative floor for a real multi-executor cluster "
                "where the per-node fixed costs replicate.\n"
            )
        print(json.dumps({"scaling": [{"stage": k, "thr8": a, "thr32": b, "eff": e} for k, a, b, e in rows]}))
        return

    times = run_workload(f"local[{CPUS}]", args.sf_dir)
    n_docs = times.pop("n_docs")
    n_queries = times.pop("n_queries")
    total = sum(times.values())
    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "e2e_headline_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in times.items()},
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "docs_per_sec_build": round(n_docs / times["build"], 1),
                "queries_per_sec_bm25": round(n_queries / times["bm25_wand"], 1),
            }
        )
    )


if __name__ == "__main__":
    main()
