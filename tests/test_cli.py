"""CLI smoke tests — the reference's run.py driver surface (run.py:20-38)
as ``python -m llm_rankers_spark``. End-to-end on sf0.001 testdata."""

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run_cli(*args: str) -> str:
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    out = subprocess.run(
        [sys.executable, "-m", "llm_rankers_spark", *args],
        capture_output=True, text=True, env=env, cwd="/tmp", timeout=420,
    )
    assert out.returncode == 0, f"CLI failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    # the JSON result is the last stdout line
    return out.stdout.strip().splitlines()[-1]


def test_cli_index_then_search(spark, tmp_path):
    idx_dir = str(tmp_path / "cliidx")
    res = json.loads(_run_cli("index", "--docs", f"{SF}/documents.parquet",
                              "--out", idx_dir, "--num-shards", "2"))
    assert res["n_docs"] == 500

    qpath = str(tmp_path / "queries.parquet")
    spark.createDataFrame(
        [("q1", "spark query join"), ("q2", "hash scan")], "qid string, query string"
    ).write.parquet(qpath)
    run_dir = str(tmp_path / "clirun")
    json.loads(_run_cli("search", "--index", idx_dir, "--queries", qpath,
                        "--out", run_dir, "--hits", "5"))
    lines = []
    for p in sorted(glob.glob(os.path.join(run_dir, "part-*"))):
        with open(p) as f:
            lines.extend(f.readlines())
    assert lines and all(len(ln.split("\t")) == 6 for ln in lines)
    assert {ln.split("\t")[0] for ln in lines} == {"q1", "q2"}


def test_cli_index_build_knobs_roundtrip(spark, tmp_path):
    # round-4 verdict #9: build-tuning knobs reachable from the CLI, and the
    # chosen bucket count survives the meta roundtrip into search
    idx_dir = str(tmp_path / "cliidx_knobs")
    res = json.loads(_run_cli(
        "index", "--docs", f"{SF}/documents.parquet", "--out", idx_dir,
        "--num-shards", "2", "--num-buckets", "8", "--pack-group", "shard_bucket",
    ))
    assert res["num_buckets"] == 8

    from llm_rankers_spark.operators.bm25 import search
    from llm_rankers_spark.operators.index_build import load_index

    idx = load_index(spark, idx_dir)
    assert idx.meta.num_buckets == 8
    qs = spark.createDataFrame([("q1", "spark query join")], "qid string, query string")
    assert search(idx, qs, k=5, method="wand").count() == 5


def test_cli_full_run(spark, tmp_path):
    qpath = str(tmp_path / "q.parquet")
    spark.createDataFrame([("q1", "spark query")], "qid string, query string").write.parquet(qpath)
    res = json.loads(_run_cli(
        "run", "--docs", f"{SF}/documents.parquet", "--queries", qpath,
        "--work-dir", str(tmp_path / "wd"), "--method", "setwise.heapsort",
        "--hits", "10", "--k", "3", "--num-shards", "2",
    ))
    assert os.path.isdir(res["trec_path"])
    assert "rerank_sec" in res["metrics"]


def test_cli_fuse_matches_library(spark, tmp_path):
    # round-4 verdict #5: M4's CLI face (reference hybrid.py:54-80) — fuse
    # two runs through the subprocess CLI and compare against the library
    # call on the same inputs
    from llm_rankers_spark.operators.runs import fuse_runs_many, read_trec_run, write_trec_run

    rows_a = [("q1", "d1", 1, 9.0), ("q1", "d2", 2, 5.0), ("q2", "d3", 1, 3.0)]
    rows_b = [("q1", "d2", 1, 7.0), ("q1", "d4", 2, 6.5), ("q2", "d3", 1, 1.0)]
    dirs = []
    for name, rows in (("a", rows_a), ("b", rows_b)):
        df = spark.createDataFrame(rows, "qid string, docid string, rank int, score double")
        d = str(tmp_path / f"run_{name}")
        write_trec_run(df.withColumn("tag", df.qid.substr(0, 0)), d, tag=name)
        dirs.append(d)

    out_dir = str(tmp_path / "fused")
    res = json.loads(_run_cli(
        "fuse", "--runs", dirs[0], dirs[1], "--weights", "0.7", "0.3",
        "--out", out_dir, "--tag", "hyb",
    ))
    assert res["n_runs"] == 2 and res["weights"] == [0.7, 0.3]

    got = read_trec_run(spark, os.path.join(out_dir, "part-*"))
    want = fuse_runs_many(
        [read_trec_run(spark, os.path.join(d, "part-*")) for d in dirs], [0.7, 0.3]
    )
    g = [(r["qid"], r["docid"], r["rank"]) for r in got.orderBy("qid", "rank").collect()]
    w = [(r["qid"], r["docid"], r["rank"]) for r in want.orderBy("qid", "rank").collect()]
    assert g == w and len(g) == 4  # q1: {d1,d2,d4}, q2: {d3}
    assert all(r["tag"] == "hyb" for r in got.collect())


def test_cli_compact_segments(spark, tmp_path):
    # streaming-segment compaction through the CLI: two segments fold into
    # one and search results stay rank-identical (library equivalence is
    # pinned in test_streaming; here the subprocess face)
    from pyspark.sql import functions as F

    from llm_rankers_spark.corpus import generate_corpus, with_docid
    from llm_rankers_spark.operators.bm25 import search
    from llm_rankers_spark.operators.index_build import load_index
    from llm_rankers_spark.streaming.index_stream import list_segments, start_index_stream

    base, root = str(tmp_path / "in"), str(tmp_path / "segroot")
    docs = with_docid(generate_corpus(spark, 80, seed=7)).select("docid", "content")
    docs.filter(F.pmod(F.crc32("docid"), F.lit(2)) == 0).write.parquet(os.path.join(base, "d1"))
    q = start_index_stream(spark, os.path.join(base, "*"), root, num_shards=2)
    q.awaitTermination(120)
    docs.filter(F.pmod(F.crc32("docid"), F.lit(2)) == 1).write.parquet(os.path.join(base, "d2"))
    q2 = start_index_stream(spark, os.path.join(base, "*"), root, num_shards=2)
    q2.awaitTermination(120)
    assert len(list_segments(root)) == 2

    res = json.loads(_run_cli("compact", "--root", root, "--num-shards", "2"))
    assert res["segments"] == ["segment_compacted"]
    assert res["compacted"] is True and res["n_before"] == 2
    idx = load_index(spark, os.path.join(root, "segment_compacted"))
    qs = spark.createDataFrame([("q1", "parse query")], "qid string, query string")
    assert search(idx, qs, k=5).count() == 5

    # a bad root must not exit 0 with plausible JSON (round-5 review finding)
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_CPUS="8")
    out = subprocess.run(
        [sys.executable, "-m", "llm_rankers_spark", "compact", "--root", str(tmp_path / "nope")],
        capture_output=True, text=True, env=env, cwd="/tmp", timeout=420,
    )
    assert out.returncode == 2 and "no segment manifest" in out.stdout


def test_cli_prep(tmp_path):
    res = json.loads(_run_cli(
        "prep", "--docs", f"{SF}/documents.parquet", "--work-dir", str(tmp_path / "prep"),
        "--min-words", "20",
    ))
    c = res["counts"]
    assert c["filtered"] >= c["exact"] >= c["clean"] > 0
    assert os.path.exists(os.path.join(res["clean_path"], "_SUCCESS"))
