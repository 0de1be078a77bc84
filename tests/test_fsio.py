"""fsio: metadata IO that works on cluster filesystems (round-2 verdict
"What's wrong" #3). The ``file://`` scheme exercises the REAL Hadoop
FileSystem branch (same JVM gateway code path hdfs:///s3a:// take); plain
paths exercise the local fast path."""

import os

import pytest

from llm_rankers_spark import fsio


def test_scheme_detection():
    assert fsio.has_scheme("hdfs://nn/x/y")
    assert fsio.has_scheme("s3a://bucket/key")
    assert fsio.has_scheme("file:///tmp/x")
    assert not fsio.has_scheme("/tmp/x")
    assert not fsio.has_scheme("relative/path")


def test_local_roundtrip(tmp_path):
    p = str(tmp_path / "sub" / "meta.json")
    fsio.write_json(p, {"a": 1, "b": [2, 3]})
    assert fsio.exists(p)
    assert fsio.read_json(p) == {"a": 1, "b": [2, 3]}
    fsio.append_text(p, "\nx")
    assert fsio.read_text(p).endswith("\nx")
    fsio.delete(p)
    assert not fsio.exists(p)


def test_hadoop_branch_roundtrip(spark, tmp_path):
    base = f"file://{tmp_path}/hd"
    p = f"{base}/nested/meta.json"
    fsio.makedirs(f"{base}/nested")
    fsio.write_json(p, {"segments": ["s0"], "epochs": [0]})
    assert fsio.exists(p)
    assert fsio.read_json(p) == {"segments": ["s0"], "epochs": [0]}
    # overwrite contract (open(..., 'w') semantics)
    fsio.write_text(p, "replaced\n")
    assert fsio.read_text(p) == "replaced\n"
    # rename + delete + glob
    p2 = f"{base}/nested/meta2.json"
    fsio.rename(p, p2)
    assert fsio.exists(p2) and not fsio.exists(p)
    listed = fsio.list_files(f"{base}/nested/meta*.json")
    # Hadoop normalizes file:///x to file:/x — compare by path suffix
    assert len(listed) == 1 and listed[0].endswith("/nested/meta2.json")
    fsio.delete(p2)
    assert not fsio.exists(p2)
    # the local dir really was written through the connector
    assert os.path.isdir(str(tmp_path / "hd" / "nested"))


def test_scheme_read_is_byte_faithful(spark, tmp_path):
    # round-3 ADVICE: the readLine-based scheme read normalized CRLF and
    # force-appended a trailing newline — scheme reads must equal the local
    # open().read() branch byte for byte
    cases = ["no trailing newline", "crlf\r\nlines\r\n", "mid\rcarriage", "", "a\n\n\nb"]
    for i, content in enumerate(cases):
        local = str(tmp_path / f"bf{i}.txt")
        with open(local, "w", newline="") as f:
            f.write(content)
        assert fsio.read_text(f"file://{local}") == fsio.read_text(local) == content, repr(content)


def test_unknown_scheme_raises(spark):
    with pytest.raises(Exception):
        fsio.read_text("nosuchscheme://x/y")


def test_index_build_through_scheme_path(spark, tmp_path):
    # end-to-end: an index built at a file:// URI writes its meta/manifest
    # through the Hadoop branch and resumes from it
    from llm_rankers_spark.corpus import generate_corpus, with_docid
    from llm_rankers_spark.operators.index_build import build_index, load_index

    docs = with_docid(generate_corpus(spark, 50, seed=7)).select(
        "docid", "content", "content_sha256"
    )
    path = f"file://{tmp_path}/scheme_idx"
    idx = build_index(docs, path, num_shards=2, resume=True)
    assert fsio.exists(os.path.join(path, "_index_meta.json"))
    again = build_index(docs, path, num_shards=2, resume=True)  # manifest resume
    assert again.meta.input_fingerprint == idx.meta.input_fingerprint
    assert load_index(spark, path).meta.n_docs == 50
