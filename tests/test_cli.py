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


def test_cli_prep(tmp_path):
    res = json.loads(_run_cli(
        "prep", "--docs", f"{SF}/documents.parquet", "--work-dir", str(tmp_path / "prep"),
        "--min-words", "20",
    ))
    c = res["counts"]
    assert c["filtered"] >= c["exact"] >= c["clean"] > 0
    assert os.path.exists(os.path.join(res["clean_path"], "_SUCCESS"))
