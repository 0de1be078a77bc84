"""Corpus-prep pipeline: quality -> exact dedup -> near-dup clusters, resumable."""

import os

from pyspark.sql import functions as F

from llm_rankers_spark.plans.prep import run_prep_pipeline


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again in the yard"
    rows = [
        ("d01", base),
        ("d02", base),                               # exact dup of d01
        ("d03", base + " extra tail words here"),    # near-dup of d01
        ("d04", "completely different content about spark query engines and shuffles"),
        ("d05", "x"),                                # too short -> quality-filtered
        ("d06", "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) @@@ ~~~"),  # low alpha
    ]
    return spark.createDataFrame(rows, "docid string, content string")


def test_prep_pipeline_stages_and_resume(spark, tmp_path):
    wd = str(tmp_path / "prep")
    docs = _corpus(spark)
    cfg = dict(min_words=3, minhash_bands=16)
    counts = run_prep_pipeline(spark, docs, wd, **cfg)
    # d05 (short) + d06 (low alpha) gone at quality; d02 at exact; d03 at near-dup
    assert counts["filtered"] == 4
    assert counts["exact"] == 3
    assert counts["clean"] == 2
    kept = {r["docid"] for r in spark.read.parquet(os.path.join(wd, "clean")).collect()}
    assert kept == {"d01", "d04"}  # min-id keepers, deterministic

    # resume: stage outputs untouched (mtime equality on the parquet dirs)
    mt = {s: os.path.getmtime(os.path.join(wd, s)) for s in ("filtered", "exact", "clean")}
    counts2 = run_prep_pipeline(spark, docs, wd, **cfg)
    assert counts2 == counts
    assert {s: os.path.getmtime(os.path.join(wd, s)) for s in ("filtered", "exact", "clean")} == mt

    # a config change also invalidates (fingerprint covers the knobs)
    counts_cfg = run_prep_pipeline(spark, docs, wd, min_words=4, minhash_bands=16)
    assert counts_cfg == counts  # same survivors at this threshold, but recomputed
    assert os.path.getmtime(os.path.join(wd, "filtered")) != mt["filtered"]

    # changed input invalidates: add a doc, all stages rerun
    docs2 = docs.union(spark.createDataFrame(
        [("d07", "yet another unique document discussing posting lists and codecs")],
        "docid string, content string"))
    counts3 = run_prep_pipeline(spark, docs2, wd, **cfg)
    assert counts3["clean"] == 3


def test_prep_decontamination_stage(spark, tmp_path):
    # round-4 verdict #4: a benchmark adds a decontamination stage after
    # near-dup dedup; the final corpus still lands at <work_dir>/clean
    wd = str(tmp_path / "prep_decon")
    docs = _corpus(spark)
    cfg = dict(min_words=3, minhash_bands=16)
    # eval item = d04's text verbatim -> d04 is 100% contaminated
    bench = spark.createDataFrame(
        [("b1", "completely different content about spark query engines and shuffles")],
        "bench_id string, text string",
    )
    counts = run_prep_pipeline(
        spark, docs, wd, benchmark=bench, contamination_shingle_k=5, **cfg
    )
    assert counts["neardup"] == 2  # same survivors as the no-benchmark clean
    assert counts["clean"] == 1
    kept = {r["docid"] for r in spark.read.parquet(os.path.join(wd, "clean")).collect()}
    assert kept == {"d01"}

    # resume: nothing recomputed with identical benchmark + knobs
    mt = {s: os.path.getmtime(os.path.join(wd, s)) for s in ("filtered", "exact", "neardup", "clean")}
    counts2 = run_prep_pipeline(
        spark, docs, wd, benchmark=bench, contamination_shingle_k=5, **cfg
    )
    assert counts2 == counts
    assert {s: os.path.getmtime(os.path.join(wd, s)) for s in ("filtered", "exact", "neardup", "clean")} == mt

    # a changed eval set invalidates ONLY the decontamination stage — the
    # upstream dedup stages stay cached
    bench2 = spark.createDataFrame(
        [("b1", "the quick brown fox jumps over the lazy dog again and again in the yard")],
        "bench_id string, text string",
    )
    counts3 = run_prep_pipeline(
        spark, docs, wd, benchmark=bench2, contamination_shingle_k=5, **cfg
    )
    assert counts3["clean"] == 1
    kept3 = {r["docid"] for r in spark.read.parquet(os.path.join(wd, "clean")).collect()}
    assert kept3 == {"d04"}
    now = {s: os.path.getmtime(os.path.join(wd, s)) for s in ("filtered", "exact", "neardup")}
    assert now == {s: mt[s] for s in ("filtered", "exact", "neardup")}
    assert os.path.getmtime(os.path.join(wd, "clean")) != mt["clean"]

    # threshold is config too: 1.01 can never be reached -> nothing dropped
    counts4 = run_prep_pipeline(
        spark, docs, wd, benchmark=bench2, contamination_shingle_k=5,
        contamination_threshold=1.01, **cfg
    )
    assert counts4["clean"] == 2


def test_prep_resume_sees_in_place_content_change(spark, tmp_path):
    # round-3 ADVICE (medium): same docids, different content must
    # invalidate the cached stages — the fingerprint covers content_sha256,
    # not just docid
    wd = str(tmp_path / "prep_content")
    docs = _corpus(spark)
    cfg = dict(min_words=3, minhash_bands=16)
    counts = run_prep_pipeline(spark, docs, wd, **cfg)
    assert counts["clean"] == 2

    # d04 becomes an exact copy of d01: same docid set, new content
    changed = docs.withColumn(
        "content",
        F.when(F.col("docid") == "d04", F.lit(
            "the quick brown fox jumps over the lazy dog again and again in the yard"
        )).otherwise(F.col("content")),
    )
    counts2 = run_prep_pipeline(spark, changed, wd, **cfg)
    assert counts2["exact"] == 2   # d02 AND d04 now drop at exact dedup
    assert counts2["clean"] == 1
    kept = {r["docid"] for r in spark.read.parquet(os.path.join(wd, "clean")).collect()}
    assert kept == {"d01"}
