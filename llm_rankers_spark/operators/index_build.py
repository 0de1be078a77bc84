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

    tokened = docs.select(
        "docid",
        "content_sha256",
        tokens_col("content", mode=tokenizer_mode).alias("tokens"),
    ).withColumn("dl", F.size("tokens"))

    # --- dense ordinals by docid order (deterministic, distributed) -------
    # Two-pass Arrow-native dense rank: range-partition + sort by docid,
    # count rows per partition, then assign ordinal = partition offset +
    # local position inside a mapInPandas. No Python-RDD round trip (the
    # zipWithIndex variant pickles every token array and anti-scales).
    n_part = max(docs.sparkSession.sparkContext.defaultParallelism, 4)
    sorted_docs = (
        tokened.repartitionByRange(n_part, "docid")
        .sortWithinPartitions("docid")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    pid_counts = {r["pid"]: r["cnt"] for r in sorted_docs.groupBy("pid").agg(F.count("*").alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(pid_counts):
        offsets[pid] = acc
        acc += pid_counts[pid]

    def assign_ord(batches):
        local = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if local is None:
                local = offsets[int(pdf["pid"].iloc[0])]
            pdf = pdf.copy()
            pdf["ord"] = range(local, local + len(pdf))
            local += len(pdf)
            yield pdf.drop(columns=["pid"])

    # with_ord is NOT persisted: it recomputes cheaply from the persisted
    # sorted_docs, and caching a second copy of every token array doubles
    # memory pressure (measured: the 32-core build GC-thrashed into being
    # slower than the 8-core one).
    with_ord = sorted_docs.mapInPandas(
        assign_ord,
        schema="docid string, content_sha256 string, tokens array<string>, dl int, ord long",
    )

    n_docs = sum(pid_counts.values())
    shard_size = max(1, -(-n_docs // num_shards))

    # doc_map rides the existing docid-range partitioning — no extra shuffle;
    # the same pass provides avgdl + the input fingerprint
    with_ord.select("ord", "docid", "dl", "content_sha256").write.mode("overwrite").parquet(
        os.path.join(path, "doc_map")
    )
    doc_map_df = spark.read.parquet(os.path.join(path, "doc_map"))
    stats_row = doc_map_df.agg(
        F.avg("dl").alias("avgdl"), F.sum(F.crc32(F.col("docid"))).alias("crc")
    ).collect()[0]
    avgdl = float(stats_row["avgdl"] or 0.0)
    fp = f"{n_docs}:{stats_row['crc']}"

    # --- term/doc frequencies (partial agg combines map-side) -------------
    # persisted slim (no token arrays) because both term_stats and the pack
    # stage consume it
    td = (
        with_ord.select("ord", "dl", F.explode("tokens").alias("term"))
        .groupBy("term", "ord", "dl")
        .agg(F.count("*").alias("tf"))
        .withColumn("shard", (F.col("ord") / F.lit(shard_size)).cast("int"))
        .persist()
    )

    term_stats = td.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
    )
    term_stats.write.mode("overwrite").parquet(os.path.join(path, "term_stats"))
    sorted_docs.unpersist()

    # --- pack posting lists per (term, shard) ------------------------------
    # grouped by (shard, term_bucket) rather than (shard, term): a code
    # corpus has millions of rare identifier terms, and per-group Arrow
    # overhead on millions of tiny groups dominates; bucketing amortizes it
    # while each term still packs independently inside the group.
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["term", "ord"])
        out = {c: [] for c in (
            "term", "shard", "n", "docs_blob", "tfs_blob", "dls_blob",
            "block_last", "block_max_tfn", "doc_offs", "tf_offs", "dl_offs",
        )}
        shard = int(pdf["shard"].iloc[0])
        for term, g in pdf.groupby("term", sort=False):
            p = codec.pack_postings(
                g["ord"].to_numpy(np.int64),
                g["tf"].to_numpy(np.int64),
                g["dl"].to_numpy(np.int64),
                avgdl=avgdl,
                k1=k1,
                b=b,
            )
            out["term"].append(term)
            out["shard"].append(shard)
            out["n"].append(p.n)
            out["docs_blob"].append(p.docs_blob)
            out["tfs_blob"].append(p.tfs_blob)
            out["dls_blob"].append(p.dls_blob)
            out["block_last"].append(p.block_last.tolist())
            out["block_max_tfn"].append(p.block_max_tfn.tolist())
            out["doc_offs"].append(p.doc_offs.tolist())
            out["tf_offs"].append(p.tf_offs.tolist())
            out["dl_offs"].append(p.dl_offs.tolist())
        return pd.DataFrame(out)

    td_b = td.withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(64)))
    postings = td_b.groupBy("shard", "bucket").applyInPandas(
        lambda key, pdf: pack(pdf.drop(columns=["bucket"])), schema=POSTINGS_SCHEMA
    )
    # plain parquet with `shard` as a column: query-time grouping shuffles on
    # shard anyway, and hive-partitionBy here would fan each pack task out
    # into one file per shard (file-commit overhead). A production deployment
    # would bucketBy(shard).sortBy(term) into a table so the query-time
    # groupBy(shard) is shuffle-free.
    postings.write.mode("overwrite").parquet(os.path.join(path, "postings"))

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

    td.unpersist()
    return InvertedIndex(spark, path, meta)
