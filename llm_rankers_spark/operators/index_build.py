"""Inverted-index build — the native replacement for the reference's Lucene
indexing step (Rank-R1/bright/index_corpus.sh:3-9, invoked opaquely there;
reimplemented here as DataFrame jobs per the north rule).

Design for 10^12 files:

- **Document-range sharding.** Every posting list is split by doc-ordinal
  range into ``num_shards`` shards. A hot term (``import``, df ≈ corpus
  size) is therefore spread across *all* shards automatically — this is the
  salting strategy: the salt is the doc range, so at query time the
  per-shard sub-lists are mutually disjoint and term-aligned, making each
  (query, shard) an independent WAND traversal followed by a trivial
  disjoint top-k merge. No single task ever owns a whole hot posting list.
- **Dense docid ordinals** assigned by global docid sort (range partition +
  partition-offset pass) — deterministic, and ordinal order == docid order,
  so the BM25 tie-break (score desc, docid asc) is an integer compare.
- **dl stored inline in the postings** (like Lucene norms): scoring is a
  sequential columnar read, never a join against a doc-length table.
- **Per-shard manifest** (rows, terms, checksum) written after the build:
  resume = skip the build when the manifest matches the input fingerprint
  (count + docid checksum) — per-partition lineage per the north rule.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llm_rankers_spark.functions import codec
from llm_rankers_spark.functions.tokenize import tokens_col

POSTINGS_SCHEMA = (
    "term string, shard int, n long, docs_blob binary, tfs_blob binary, dls_blob binary, "
    "block_last array<long>, block_max_tfn array<double>, "
    "doc_offs array<long>, tf_offs array<long>, dl_offs array<long>"
)


@dataclass
class IndexMeta:
    n_docs: int
    avgdl: float
    num_shards: int
    shard_size: int
    tokenizer_mode: str
    k1: float
    b: float
    input_fingerprint: str


class InvertedIndex:
    """Handle over the on-disk index (postings / doc_map / term_stats / meta)."""

    def __init__(self, spark: SparkSession, path: str, meta: IndexMeta):
        self.spark = spark
        self.path = path
        self.meta = meta

    @property
    def postings(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "postings"))

    @property
    def doc_map(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "doc_map"))

    @property
    def term_stats(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "term_stats"))


def _meta_path(path: str) -> str:
    return os.path.join(path, "_index_meta.json")


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_manifest.json")


def input_fingerprint(docs: DataFrame) -> str:
    """Cheap deterministic fingerprint of the input (count + docid crc sum)."""
    row = docs.agg(
        F.count("*").alias("n"),
        F.sum(F.crc32(F.col("docid"))).alias("crc"),
    ).collect()[0]
    return f"{row['n']}:{row['crc']}"


def load_index(spark: SparkSession, path: str) -> InvertedIndex:
    with open(_meta_path(path)) as f:
        meta = IndexMeta(**json.load(f))
    return InvertedIndex(spark, path, meta)


def build_index(
    docs: DataFrame,
    path: str,
    tokenizer_mode: str = "code",
    num_shards: int = 8,
    k1: float = codec.DEFAULT_K1,
    b: float = codec.DEFAULT_B,
    resume: bool = False,
) -> InvertedIndex:
    """Build the index from ``docs(docid, content[, content_sha256])``.

    Plan shape (all shuffles are on keys we immediately exploit):
      tokenize (Arrow UDF) → ordinal assignment (range shuffle on docid)
      → explode → partial-agg tf per (term, ord) (map-side combine)
      → shard by ord range → pack per (term, shard) (applyInPandas)
      → write parquet partitioned by shard.
    """
    spark = docs.sparkSession

    if resume and os.path.exists(_meta_path(path)) and os.path.exists(_manifest_path(path)):
        meta = load_index(spark, path).meta
        if meta.input_fingerprint == input_fingerprint(docs) and meta.tokenizer_mode == tokenizer_mode:
            return InvertedIndex(spark, path, meta)

    if "content_sha256" not in docs.columns:
        docs = docs.withColumn("content_sha256", F.sha2(F.col("content"), 256))

    fp = input_fingerprint(docs)

    tokened = docs.select(
        "docid",
        "content_sha256",
        tokens_col("content", mode=tokenizer_mode).alias("tokens"),
    ).withColumn("dl", F.size("tokens"))

    # --- dense ordinals by docid order (deterministic, distributed) -------
    # range-partition + sort, then number with per-partition offsets; this is
    # the scalable idiom for a global dense rank (no single-partition window).
    n_part = max(docs.sparkSession.sparkContext.defaultParallelism, 4)
    sorted_docs = tokened.repartitionByRange(n_part, "docid").sortWithinPartitions("docid")
    with_ord = (
        sorted_docs.rdd.zipWithIndex()
        .map(lambda t: (t[0]["docid"], t[0]["content_sha256"], t[0]["tokens"], t[0]["dl"], t[1]))
        .toDF(["docid", "content_sha256", "tokens", "dl", "ord"])
    )
    with_ord = with_ord.persist()

    n_docs = with_ord.count()
    shard_size = max(1, -(-n_docs // num_shards))
    avgdl = with_ord.agg(F.avg("dl")).collect()[0][0] or 0.0

    doc_map = with_ord.select("ord", "docid", "dl", "content_sha256")
    doc_map.repartitionByRange(num_shards, "ord").write.mode("overwrite").parquet(os.path.join(path, "doc_map"))

    # --- term/doc frequencies (partial agg combines map-side) -------------
    td = (
        with_ord.select("ord", "dl", F.explode("tokens").alias("term"))
        .groupBy("term", "ord", "dl")
        .agg(F.count("*").alias("tf"))
        .withColumn("shard", (F.col("ord") / F.lit(shard_size)).cast("int"))
    )

    term_stats = td.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
    )
    term_stats.write.mode("overwrite").parquet(os.path.join(path, "term_stats"))

    # --- pack posting lists per (term, shard) ------------------------------
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ord")
        p = codec.pack_postings(
            pdf["ord"].to_numpy(np.int64),
            pdf["tf"].to_numpy(np.int64),
            pdf["dl"].to_numpy(np.int64),
            avgdl=avgdl,
            k1=k1,
            b=b,
        )
        return pd.DataFrame(
            {
                "term": [pdf["term"].iloc[0]],
                "shard": [int(pdf["shard"].iloc[0])],
                "n": [p.n],
                "docs_blob": [p.docs_blob],
                "tfs_blob": [p.tfs_blob],
                "dls_blob": [p.dls_blob],
                "block_last": [p.block_last.tolist()],
                "block_max_tfn": [p.block_max_tfn.tolist()],
                "doc_offs": [p.doc_offs.tolist()],
                "tf_offs": [p.tf_offs.tolist()],
                "dl_offs": [p.dl_offs.tolist()],
            }
        )

    postings = td.groupBy("term", "shard").applyInPandas(pack, schema=POSTINGS_SCHEMA)
    postings.write.mode("overwrite").partitionBy("shard").parquet(os.path.join(path, "postings"))

    # --- lineage manifest (per-shard row/posting counts + checksum) --------
    shard_stats = (
        spark.read.parquet(os.path.join(path, "postings"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("lists"),
            F.sum("n").alias("postings"),
            F.sum(F.crc32(F.col("term"))).alias("term_crc"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = {
        "shards": [
            {"shard": r["shard"], "lists": r["lists"], "postings": r["postings"], "term_crc": r["term_crc"]}
            for r in shard_stats
        ],
        "input_fingerprint": fp,
    }
    with open(_manifest_path(path), "w") as f:
        json.dump(manifest, f, indent=1)

    meta = IndexMeta(
        n_docs=n_docs,
        avgdl=float(avgdl),
        num_shards=num_shards,
        shard_size=shard_size,
        tokenizer_mode=tokenizer_mode,
        k1=k1,
        b=b,
        input_fingerprint=fp,
    )
    with open(_meta_path(path), "w") as f:
        json.dump(meta.__dict__, f, indent=1)

    with_ord.unpersist()
    return InvertedIndex(spark, path, meta)
