"""End-to-end index build + BM25 correctness vs the pure-Python oracle.

North-rule checks (BASELINE.md): rank-identical top-k docids, scores within
1e-6 (in practice exact), WAND ≡ exhaustive, sha256 invariant, known-item
smoke, resume idempotence.
"""

import os

import pytest
from pyspark.sql import functions as F

from llm_rankers_spark.corpus import generate_corpus, generate_queries, with_docid
from llm_rankers_spark.operators.bm25 import bm25_dataframe, search, search_distributed
from llm_rankers_spark.operators.index_build import build_index, load_index, verify_index

from .oracle_bm25 import bm25_oracle

N_DOCS = 300


@pytest.fixture(scope="module")
def corpus(spark):
    return with_docid(generate_corpus(spark, N_DOCS, seed=42)).persist()


@pytest.fixture(scope="module")
def queries(spark):
    vocab = ["parse", "query", "import", "def", "return", "self", "helper", "fn", "request", "handler"]
    return generate_queries(spark, vocab, n_queries=24, seed=42)


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idx"))
    return build_index(corpus.select("docid", "content", "content_sha256"), path, num_shards=4)


@pytest.fixture(scope="module")
def oracle(corpus, queries):
    docs = [(r["docid"], r["content"]) for r in corpus.select("docid", "content").collect()]
    qs = [(r["qid"], r["query"]) for r in queries.collect()]
    return bm25_oracle(docs, qs, k=10)


def _collect_runs(df):
    out = {}
    for r in df.orderBy("qid", "rank").collect():
        out.setdefault(r["qid"], []).append((r["docid"], r["score"]))
    return out


@pytest.mark.parametrize("method", ["exhaustive", "wand", "auto", "wand_dat"])
def test_rank_identical_to_oracle(index, queries, oracle, method):
    got = _collect_runs(search(index, queries, k=10, method=method))
    qids_with_hits = {q for q, hits in oracle.items() if hits}
    assert set(got.keys()) == qids_with_hits
    for qid in qids_with_hits:
        g, w = got[qid], oracle[qid]
        assert [d for d, _ in g] == [d for d, _ in w], f"docid mismatch for {qid}"
        for (_, gs), (_, ws) in zip(g, w):
            assert gs == pytest.approx(ws, abs=1e-6)


@pytest.mark.parametrize("method", ["exhaustive", "wand"])
def test_search_distributed_equals_driver_planned(index, queries, oracle, method):
    # the fully-distributed batch path (no queries.collect, cogrouped query
    # plan) must be result-identical to the driver-planned path and the oracle
    got = _collect_runs(search_distributed(index, queries, k=10, method=method))
    qids_with_hits = {q for q, hits in oracle.items() if hits}
    assert set(got.keys()) == qids_with_hits
    for qid in qids_with_hits:
        g, w = got[qid], oracle[qid]
        assert [d for d, _ in g] == [d for d, _ in w], f"docid mismatch for {qid}"
        for (_, gs), (_, ws) in zip(g, w):
            assert gs == pytest.approx(ws, abs=1e-6)


def test_shard_subset_union_equals_full_search(spark, index, queries):
    # shard-parallel serving: per-subset top-k's union + re-rank == global
    # top-k (disjoint doc ranges per shard)
    from pyspark.sql import Window

    full = _collect_runs(search(index, queries, k=10, method="wand"))
    parts = [search(index, queries, k=10, method="wand", shards=[0, 2]),
             search(index, queries, k=10, method="wand", shards=[1, 3])]
    u = parts[0].unionByName(parts[1])
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    merged = (
        u.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10)
    )
    got = _collect_runs(merged)
    assert got == full


def test_search_distributed_chunked_equals_unchunked(index, queries):
    a = _collect_runs(search_distributed(index, queries, k=10, method="exhaustive"))
    b = _collect_runs(search_distributed(index, queries, k=10, method="exhaustive", query_chunks=3))
    assert a == b


def test_auto_dispatch_small_batch_takes_driver_plan(index, queries):
    # one entry point (round-4 verdict #3): a reranking-sized batch routes to
    # the driver-planned path and all three plan values are rank-identical
    out = {}
    a = _collect_runs(search(index, queries, k=10, plan="auto", plan_out=out))
    assert out["plan"] == "driver" and out["probe_n"] == 24
    b = _collect_runs(search(index, queries, k=10, plan="driver"))
    c = _collect_runs(search(index, queries, k=10, plan="distributed"))
    assert a == b == c


def test_auto_dispatch_large_batch_takes_distributed_plan(spark, index):
    from llm_rankers_spark.operators.bm25 import DRIVER_QUERY_PLAN_MAX

    # 10^4-query batch built distributedly — never collected by the
    # dispatcher: the probe is limit(N+1).count(), so probe_n is capped at
    # N+1 regardless of the true batch size (no full count, no collect)
    big = spark.range(10_000).select(
        F.concat(F.lit("q"), F.col("id").cast("string")).alias("qid"),
        F.lit("parse query").alias("query"),
    )
    out = {}
    df = search(index, big, k=10, plan="auto", plan_out=out)
    assert out["plan"] == "distributed"
    assert out["probe_n"] == DRIVER_QUERY_PLAN_MAX + 1  # bounded probe, short-circuited
    # the distributed plan contains the cogroup (FlatMapCoGroupsInPandas),
    # which the driver-planned path never produces
    assert "FlatMapCoGroupsInPandas" in df._jdf.queryExecution().optimizedPlan().toString()

    # just above the cutoff: execute end-to-end through the same entry point
    # and check it equals the forced driver plan
    mid = spark.range(DRIVER_QUERY_PLAN_MAX + 8).select(
        F.concat(F.lit("q"), F.col("id").cast("string")).alias("qid"),
        F.lit("parse query").alias("query"),
    )
    out2 = {}
    got = _collect_runs(search(index, mid, k=5, plan="auto", plan_out=out2))
    assert out2["plan"] == "distributed"
    want = _collect_runs(search(index, mid, k=5, plan="driver"))
    assert got == want


def test_auto_dispatch_shards_imply_driver_plan(index, queries):
    out = {}
    search(index, queries, k=10, shards=[0, 1], plan="auto", plan_out=out)
    assert out["plan"] == "driver" and out["probe_n"] is None
    with pytest.raises(ValueError, match="shards"):
        search(index, queries, k=10, shards=[0], plan="distributed")


def test_driver_ordinals_equal_distributed(spark, corpus, queries, index, tmp_path_factory, monkeypatch):
    # the adaptive driver-side ordinal path (small corpora) must produce a
    # rank-identical index to the distributed range-sort path
    from llm_rankers_spark.operators import index_build as ib

    monkeypatch.setattr(ib, "DRIVER_ORDINALS_MAX", 0)  # force the slim path
    path = str(tmp_path_factory.mktemp("idx_slimpath"))
    idx_slim = build_index(corpus.select("docid", "content", "content_sha256"), path, num_shards=4)
    a = _collect_runs(search(index, queries, k=10, method="wand"))  # driver path (fixture)
    b = _collect_runs(search(idx_slim, queries, k=10, method="wand"))
    assert a == b


def test_ordinals_auto_duplicate_docids_fall_back(spark):
    from llm_rankers_spark.operators.index_build import _ordinals_auto

    df = spark.createDataFrame([("d1",), ("d2",), ("d1",)], "docid string")
    ords, n, slim = _ordinals_auto(df)
    assert n == 3 and slim is not None  # distributed path (handle returned)
    got = sorted((r["docid"], r["ord"]) for r in ords.collect())
    assert [o for _, o in got] == [0, 1, 2]  # every row still gets a unique ordinal
    slim.unpersist()


def test_pack_group_modes_rank_identical(spark, corpus, queries, index, tmp_path_factory):
    # pack_group='shard_bucket' bounds pack-task memory under hot-term skew
    # (a task never holds a whole hot posting list); results must equal the
    # default bucket-grouped build exactly
    path = str(tmp_path_factory.mktemp("idx_sb"))
    idx_sb = build_index(
        corpus.select("docid", "content", "content_sha256"), path,
        num_shards=4, pack_group="shard_bucket",
    )
    assert idx_sb.meta.layout_version == 3  # df baked via slim agg + broadcast
    a = _collect_runs(search(index, queries, k=10, method="wand"))
    b = _collect_runs(search(idx_sb, queries, k=10, method="wand"))
    assert a == b
    with pytest.raises(ValueError):
        build_index(
            corpus.select("docid", "content", "content_sha256"),
            str(tmp_path_factory.mktemp("idx_bad")), num_shards=4, pack_group="nope",
        )


def test_pack_group_auto_resolves_by_scale(spark, corpus, queries, tmp_path_factory, monkeypatch):
    # 'auto' picks the pack grouping from the rows-per-bucket estimate
    # (n_docs x avgdl / num_buckets vs the measured cutover): the 300-doc
    # fixture stays in bucket mode; shrinking the budget to zero must flip
    # the same build to shard_bucket — and both remain rank-identical
    from llm_rankers_spark.operators import index_build as ib

    eo_small, eo_big = {}, {}
    p1 = str(tmp_path_factory.mktemp("idx_auto_small"))
    idx_small = build_index(
        corpus.select("docid", "content", "content_sha256"), p1, num_shards=4,
        pack_group="auto", explain_out=eo_small,
    )
    # bucket mode: df counted in-group, so the pack plan has no broadcast
    # df join
    assert "BroadcastHashJoin" not in eo_small["pack_plan"]

    monkeypatch.setattr(ib, "PACK_BUCKET_MAX_GROUP_ROWS", 0)
    p2 = str(tmp_path_factory.mktemp("idx_auto_big"))
    idx_big = build_index(
        corpus.select("docid", "content", "content_sha256"), p2, num_shards=4,
        pack_group="auto", explain_out=eo_big,
    )
    # shard_bucket mode: the slim df count arrives via the broadcast join
    assert "BroadcastHashJoin" in eo_big["pack_plan"]
    a = _collect_runs(search(idx_small, queries, k=10, method="wand"))
    b = _collect_runs(search(idx_big, queries, k=10, method="wand"))
    assert a == b and len(a) > 0


def test_pack_auto_uses_exact_postings_rows(spark, corpus, tmp_path_factory, monkeypatch):
    # round-5 verdict #5: the 'auto' cutover input is the EXACT postings-row
    # count observed on the checkpoint write (not the n_docs x avgdl
    # estimate, which overshoots by the corpus tf ratio) — assert the value
    # handed to _pack_and_write equals the rows actually packed
    from pyspark.sql import functions as F

    from llm_rankers_spark.operators import index_build as ib

    seen = {}
    orig = ib._pack_and_write

    def spy(*args, **kw):
        seen["postings_rows"] = kw.get("postings_rows")
        return orig(*args, **kw)

    monkeypatch.setattr(ib, "_pack_and_write", spy)
    p = str(tmp_path_factory.mktemp("idx_exactrows"))
    idx = build_index(corpus.select("docid", "content", "content_sha256"), p, num_shards=4)
    actual = idx.postings.agg(F.sum("n")).collect()[0][0]
    assert seen["postings_rows"] == actual and actual > 0


def test_merge_auto_resolves_by_shard_count(spark, corpus, queries, index, tmp_path_factory):
    # merge='auto' (now the default): <=32 shards -> single window; >32
    # shards -> fanin-8 tree (extra fold level visible as a second Window),
    # results identical to the explicit window merge either way
    def n_windows(df):
        return df._jdf.queryExecution().optimizedPlan().toString().count("Window [row_number()")

    small = search_distributed(index, queries, k=5, merge="auto")  # 4 shards
    assert n_windows(small) == 1

    path = str(tmp_path_factory.mktemp("idx64"))
    idx64 = build_index(corpus.select("docid", "content", "content_sha256"), path, num_shards=64)
    big = search_distributed(idx64, queries, k=5, merge="auto")
    assert n_windows(big) == 2  # 64 shards -> one fanin-8 fold + final rank
    a = sorted(map(tuple, big.collect()))
    b = sorted(map(tuple, search_distributed(idx64, queries, k=5, merge="window").collect()))
    assert a == b and len(a) > 0


def test_tree_merge_equals_single_window(spark, corpus, queries, tmp_path_factory):
    # round-3 verdict #8: the fanin-ary tree merge (the 10^5-shard serving
    # path) must be result-identical to the one-window merge. 16 shards
    # with fanin=4 exercises a real 2-level fold (16 -> 4 -> final).
    path = str(tmp_path_factory.mktemp("idx_tree"))
    idx16 = build_index(corpus.select("docid", "content", "content_sha256"), path, num_shards=16)
    a = _collect_runs(search_distributed(idx16, queries, k=10, method="auto"))
    b = _collect_runs(
        search_distributed(idx16, queries, k=10, method="auto", merge="tree", merge_fanin=4)
    )
    assert a == b
    # degenerate case: fanin >= num_shards is exactly the single window
    c = _collect_runs(
        search_distributed(idx16, queries, k=10, method="auto", merge="tree", merge_fanin=64)
    )
    assert a == c
    with pytest.raises(ValueError):
        search_distributed(idx16, queries, k=10, merge="nope")


def test_wand_equals_exhaustive_large_k(index, queries):
    a = _collect_runs(search(index, queries, k=50, method="exhaustive"))
    b = _collect_runs(search(index, queries, k=50, method="wand"))
    assert a == b


def test_known_item_smoke(spark, index):
    # FIXTURES.md §7 / reference README.md:42-53: query "passage_34" → that
    # doc at rank 1 (every doc embeds a unique marker).
    q = spark.createDataFrame([("known", "passage_34")], "qid string, query string")
    top = search(index, q, k=5, method="wand").orderBy("rank").collect()
    assert top, "no hits for known-item query"
    assert "passage" in top[0]["docid"] or top[0]["rank"] == 1
    # the marker doc is the only one containing token passage_34 → rank 1
    doc_row = top[0]
    assert doc_row["rank"] == 1


def test_sha256_invariant(corpus, index):
    # content sha256 carried through the build must equal a fresh computation
    dm = index.doc_map.select("docid", "content_sha256")
    fresh = corpus.select("docid", F.sha2("content", 256).alias("expected"))
    diff = dm.join(fresh, "docid").filter(F.col("content_sha256") != F.col("expected")).count()
    assert diff == 0
    assert dm.count() == N_DOCS


def test_ordinals_are_docid_ordered(index):
    rows = index.doc_map.select("ord", "docid").orderBy("ord").collect()
    docids = [r["docid"] for r in rows]
    assert docids == sorted(docids)
    assert [r["ord"] for r in rows] == list(range(len(rows)))


def test_resume_skips_rebuild(spark, corpus, index):
    manifest = os.path.join(index.path, "_manifest.json")
    mtime = os.path.getmtime(manifest)
    idx2 = build_index(
        corpus.select("docid", "content", "content_sha256"), index.path, num_shards=4, resume=True
    )
    assert os.path.getmtime(manifest) == mtime  # untouched → skipped
    assert idx2.meta.n_docs == index.meta.n_docs


def test_hot_term_spreads_across_all_shards(spark, tmp_path):
    # skew mitigation is structural: a term present in EVERY doc (the
    # 'import'/'def' case) must shard by doc range, one sub-list per shard,
    # so no task ever owns the whole hot posting list — and scoring over the
    # sharded list stays oracle-exact
    rows = [
        (f"d{i:04d}", "common filler " + f"unique{i} token{i % 7}") for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "docid string, content string")
    idx = build_index(docs, str(tmp_path / "hotidx"), tokenizer_mode="simple", num_shards=8)
    hot = idx.postings.filter(F.col("term") == "common")
    per_shard = {r["shard"]: r["n"] for r in hot.select("shard", "n").collect()}
    assert len(per_shard) == 8, f"hot term not spread: {per_shard}"
    assert max(per_shard.values()) <= 25  # 200 docs / 8 shards
    assert sum(per_shard.values()) == 200  # df preserved across sub-lists
    # correctness on the hot+rare mix
    qs = spark.createDataFrame([("h1", "common unique42")], "qid string, query string")
    from .oracle_bm25 import bm25_oracle

    want = bm25_oracle(rows, [("h1", "common unique42")], k=5)
    got = _collect_runs(search(idx, qs, k=5, method="wand"))
    assert [d for d, _ in got["h1"]] == [d for d, _ in want["h1"]]
    for (_, gs), (_, ws) in zip(got["h1"], want["h1"]):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_verify_index_lineage(spark, index, tmp_path):
    assert verify_index(index)["ok"]
    # build metrics ride the lineage manifest (phase walls + throughput)
    import json as _json

    with open(os.path.join(index.path, "_manifest.json")) as f:
        m = _json.load(f)["build_metrics"]
    assert set(m["phase_seconds"]) == {"slim_ordinals", "doc_map_write_stats", "pack_write"}
    assert m["wall_seconds"] > 0 and m["docs_per_sec"] > 0
    # corrupt: drop one postings parquet file -> the audit must flag it
    import glob as _glob
    import shutil as _shutil

    broken = str(tmp_path / "broken_idx")
    _shutil.copytree(index.path, broken)
    victim = sorted(_glob.glob(os.path.join(broken, "postings", "bucket=*", "*.parquet")))[0]
    os.remove(victim)
    res = verify_index(load_index(spark, broken))
    assert not res["ok"] and res["mismatches"]


def test_load_index_roundtrip(spark, index):
    idx = load_index(spark, index.path)
    assert idx.meta.avgdl == index.meta.avgdl
    assert idx.postings.count() > 0


def test_bm25_dataframe_counts_tokenless_docs(spark, tmp_path):
    # N/avgdl must cover ALL docs (token-less ones with dl=0), matching the
    # packed-index statistics — the two engine paths must agree on a corpus
    # containing empty documents (round-1 advice: bm25.py derived stats from
    # the dl table, silently dropping empty docs).
    rows = [
        ("d1", "alpha beta gamma alpha"),
        ("d2", "alpha delta"),
        ("d3", ""),  # token-less: counts toward N, dl=0
        ("d4", "beta beta gamma"),
    ]
    docs = spark.createDataFrame(rows, "docid string, content string").withColumn(
        "content_sha256", F.sha2("content", 256)
    )
    qs = spark.createDataFrame([("q1", "alpha beta")], "qid string, query string")
    idx = build_index(docs, str(tmp_path / "idx_empty"), num_shards=2)
    assert idx.meta.n_docs == 4
    a = _collect_runs(search(idx, qs, k=4, method="exhaustive"))
    b = _collect_runs(
        bm25_dataframe(docs.select("docid", "content"), qs, k=4, mode="code").withColumn(
            "tag", F.lit("x")
        )
    )
    assert set(a) == set(b)
    for qid in a:
        assert [d for d, _ in a[qid]] == [d for d, _ in b[qid]]
        for (_, sa), (_, sb) in zip(a[qid], b[qid]):
            assert sa == pytest.approx(sb, abs=1e-9)


def test_bm25_dataframe_matches_index_path(spark, corpus, queries, index):
    # the Catalyst-native plan and the packed-index plan agree
    df_path = bm25_dataframe(
        corpus.select("docid", "content"), queries, k=10, mode="code"
    )
    got = _collect_runs(df_path.withColumn("tag", F.lit("x")))
    idx_path = _collect_runs(search(index, queries, k=10, method="wand"))
    assert set(got) == set(idx_path)
    for qid in got:
        assert [d for d, _ in got[qid]] == [d for d, _ in idx_path[qid]]
        for (_, a), (_, b) in zip(got[qid], idx_path[qid]):
            assert a == pytest.approx(b, abs=1e-6)


def test_bm25_dataframe_forward_reuse_identical(spark, corpus, queries, tmp_path):
    # round-2 verdict #5: the forward-table path (no corpus re-tokenize)
    # must equal the from-corpus path exactly — same docids, same scores
    from llm_rankers_spark.operators.bm25 import bm25_dataframe_from_index

    idx = build_index(
        corpus.select("docid", "content", "content_sha256"),
        str(tmp_path / "fwd_idx"), num_shards=4, keep_forward=True,
    )
    plain = _collect_runs(
        bm25_dataframe(corpus.select("docid", "content"), queries, k=10, mode="code")
        .withColumn("tag", F.lit("x"))
    )
    fwd = _collect_runs(bm25_dataframe_from_index(idx, queries, k=10).withColumn("tag", F.lit("x")))
    # same stats and contrib expression; the per-(qid,docid) sum order can
    # differ between the two physical plans, so scores match to float-sum
    # reassociation (last ulp), not bit-exactly
    assert set(plain) == set(fwd)
    for qid in plain:
        assert [d for d, _ in plain[qid]] == [d for d, _ in fwd[qid]]
        for (_, a), (_, b) in zip(plain[qid], fwd[qid]):
            assert a == pytest.approx(b, abs=1e-12)


def test_bake_df_false_layout_v2_searches_equal(spark, corpus, queries, tmp_path):
    # bake_df=False writes layout v2 (no per-row df); search falls back to
    # the per-batch df job and must produce identical rankings
    idx2 = build_index(
        corpus.select("docid", "content", "content_sha256"),
        str(tmp_path / "v2_idx"), num_shards=4, bake_df=False,
    )
    assert idx2.meta.layout_version == 2
    assert "df" not in idx2.postings.columns
    got = _collect_runs(search(idx2, queries, k=10, method="wand"))
    idx3 = build_index(
        corpus.select("docid", "content", "content_sha256"),
        str(tmp_path / "v3_idx"), num_shards=4,
    )
    want = _collect_runs(search(idx3, queries, k=10, method="wand"))
    assert set(got) == set(want)
    for qid in got:
        assert [d for d, _ in got[qid]] == [d for d, _ in want[qid]]
        for (_, a), (_, b) in zip(got[qid], want[qid]):
            assert a == pytest.approx(b, abs=1e-9)
