"""Connected-components clustering over duplicate pairs."""

from pyspark.sql import functions as F

from llm_rankers_spark.operators.dedup import connected_components


def test_cc_chain_and_star(spark):
    # chain a-b-c-d (diameter 3) + star e-{f,g,h} + isolated pair (i,j)
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f"), ("e", "g"), ("e", "h"), ("i", "j")],
        "id_a string, id_b string",
    )
    got = {(r["id"], r["root"]) for r in connected_components(pairs).collect()}
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
        ("e", "e"), ("f", "e"), ("g", "e"), ("h", "e"),
        ("i", "i"), ("j", "i"),
    }


def test_cc_long_path_converges(spark):
    # worst-case diameter: a pure path of 12 nodes; min label must walk it
    n = 12
    ids = [f"n{i:02d}" for i in range(n)]
    pairs = spark.createDataFrame(
        list(zip(ids[:-1], ids[1:])), "id_a string, id_b string"
    )
    out = connected_components(pairs, max_iter=n)
    roots = {r["root"] for r in out.collect()}
    assert roots == {"n00"} and out.count() == n


def test_contamination_overlap_flags_planted_eval_text(spark):
    from llm_rankers_spark.operators.dedup import contamination_overlap

    docs = spark.createDataFrame(
        [
            ("d1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            ("d2", "totally unrelated words about spark shuffles and joins here"),
            ("d3", "prefix words then alpha beta gamma delta epsilon zeta suffix"),
        ],
        "docid string, content string",
    )
    bench = spark.createDataFrame(
        [("b1", "alpha beta gamma delta epsilon zeta")],
        "bench_id string, text string",
    )
    out = contamination_overlap(docs, bench, shingle_k=3, threshold=0.5)
    rows = {(r["bench_id"], r["docid"]): r for r in out.collect()}
    # b1 has 4 3-gram shingles; d1 and d3 contain all 4, d2 none
    assert set(rows) == {("b1", "d1"), ("b1", "d3")}
    for r in rows.values():
        assert r["bench_shingles"] == 4
        assert r["matched"] == 4
        assert r["overlap"] == 1.0
    # threshold gates partial overlaps
    partial = contamination_overlap(
        docs.filter("docid = 'd2'"), bench, shingle_k=3, threshold=0.01
    )
    assert partial.count() == 0
    # the benchmark side broadcasts: no corpus-side Exchange before the
    # matched aggregate
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
