"""Engine-free control at the EXACT executor-emulation protocol.

The host-control rows in BENCH/BASELINE.md run one JVM at two thread
counts; this script runs the same minimal pandas-UDF job (str.split().len()
+ sum — just the Arrow worker channel, none of the engine) as 1 vs 4
barrier-started, CPU-pinned 2-core JVMs over hash slices of the same
corpus, exactly like `bench.run_emulation`. Its efficiency is the ceiling
the multi-JVM protocol itself permits on this box.

Usage: python BENCH/control_emu.py [n_passes] [input_parquet]
Worker mode (internal): python BENCH/control_emu.py --worker i:n:input:sync
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def worker(i: int, n: int, input_path: str, sync_dir: str) -> None:
    from pyspark.sql import SparkSession, functions as F
    from pyspark.sql.functions import pandas_udf

    # core width from the SAME env the engine's unsat pairs honor
    # (round-5 ADVICE: hardcoding 2 silently diverged from the protocol
    # when LLMRS_EMU_CORES_UNSAT was overridden)
    cores = os.environ.get("LLMRS_EMU_CORES_UNSAT", "2")
    spark = (
        SparkSession.builder.master(f"local[{cores}]").appName(f"control_emu_{i}")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    @pandas_udf("long")
    def ntok(s):
        return s.str.split().str.len().astype("int64")

    docs = spark.read.parquet(input_path)
    if n > 1:
        docs = docs.filter(F.pmod(F.xxhash64("docid"), F.lit(n)) == i)
    docs = docs.persist()
    n_rows = docs.count()
    docs.limit(1000).select(ntok("content").alias("t")).agg(F.sum("t")).collect()  # warm

    open(os.path.join(sync_dir, f"ready_{i}"), "w").close()
    while not os.path.exists(os.path.join(sync_dir, "go")):
        time.sleep(0.05)
    t0 = time.perf_counter()
    docs.select(ntok("content").alias("t")).agg(F.sum("t")).collect()
    wall = time.perf_counter() - t0
    json.dump({"rows": n_rows, "wall": wall}, open(os.path.join(sync_dir, f"out_{i}.json"), "w"))
    spark.stop()


def run_point(n: int, input_path: str) -> tuple[float, float, float]:
    import bench

    bench.prime_page_cache(input_path)
    sync_dir = tempfile.mkdtemp(prefix="control_emu_")
    procs = []
    saved = os.environ.get("LLMRS_EMU_CORES")
    os.environ["LLMRS_EMU_CORES"] = os.environ.get("LLMRS_EMU_CORES_UNSAT", "2")
    try:
        for i in range(n):
            procs.append(subprocess.Popen(
                bench._emu_pin_prefix(i)
                + [sys.executable, os.path.abspath(__file__), "--worker",
                   f"{i}:{n}:{input_path}:{sync_dir}"],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            ))
        while sum(os.path.exists(os.path.join(sync_dir, f"ready_{i}")) for i in range(n)) < n:
            time.sleep(0.2)
            if any(p.poll() not in (None, 0) for p in procs):
                raise RuntimeError("control worker died before barrier")
        c0 = bench._cpu_ticks()
        open(os.path.join(sync_dir, "go"), "w").close()
        for p in procs:
            p.wait()
        d = [b - a for a, b in zip(c0, bench._cpu_ticks())]
        # descriptive failure instead of a FileNotFoundError on out_i.json
        # when a worker died mid-measurement (round-5 ADVICE)
        dead = [i for i, p in enumerate(procs) if p.returncode != 0]
        if dead:
            raise RuntimeError(f"control worker(s) {dead} exited non-zero after the barrier")
        outs = [json.load(open(os.path.join(sync_dir, f"out_{i}.json"))) for i in range(n)]
        rows = sum(o["rows"] for o in outs)
        wall = max(o["wall"] for o in outs)
        return rows, wall, round(100.0 * d[7] / max(sum(d), 1), 1)
    finally:
        if saved is None:
            os.environ.pop("LLMRS_EMU_CORES", None)
        else:
            os.environ["LLMRS_EMU_CORES"] = saved
        for p in procs:
            if p.poll() is None:
                p.kill()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        i, n, input_path, sync_dir = sys.argv[2].split(":", 3)
        worker(int(i), int(n), input_path, sync_dir)
        return
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    input_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/llmrs_emu_input_200000"
    for p in range(passes):
        r1, w1, s1 = run_point(1, input_path)
        r4, w4, s4 = run_point(4, input_path)
        eff = (r4 / w4) / (4.0 * r1 / w1)
        print(json.dumps({
            "pass": p + 1,
            "thr1": round(r1 / w1, 1), "wall1": round(w1, 2), "steal1": s1,
            "thr4": round(r4 / w4, 1), "wall4": round(w4, 2), "steal4": s4,
            "eff": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
