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
