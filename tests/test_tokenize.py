from llm_rankers_spark.functions.tokenize import (
    tokenize_code,
    tokenize_simple,
    tokens_col,
)


def test_simple_mode():
    assert tokenize_simple("Hello, World-42!") == ["hello", "world", "42"]
    assert tokenize_simple("") == []
    assert tokenize_simple("___") == []


def test_code_mode_snake_camel():
    assert tokenize_code("parse_query") == ["parse", "query"]
    assert tokenize_code("RequestHandler") == ["request", "handler"]
    assert tokenize_code("HTTPServer2") == ["http", "server2"]
    assert tokenize_code("def foo_barBaz(x):") == ["def", "foo", "bar", "baz", "x"]
    assert tokenize_code("") == []


def test_code_mode_keeps_digits_and_markers():
    assert tokenize_code("marker = 'passage_34'") == ["marker", "passage", "34"]


def test_udf_matches_plain_function(spark):
    texts = [
        "def parse_query(q): return q.lower()",
        "import RequestHandler",
        "",
        "UPPER lower 123 mixed_caseCamel",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "content string")
    for mode in ("simple", "code"):
        got = [r[0] for r in df.select(tokens_col("content", mode=mode)).collect()]
        want = [tokenize_simple(t) if mode == "simple" else tokenize_code(t) for t in texts]
        assert got == want
