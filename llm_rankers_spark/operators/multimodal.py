"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels (PIL/librosa/ffmpeg) are NOT in this container, so the
codec step is stubbed behind ``decoder=`` — either a clearly-marked
``NotImplementedError`` (default) or a deterministic fake for tests. The
Spark-side plumbing is real and tested: schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — swapping in a real decoder
changes one function, not the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, width int, height int, duration_ms int"
)
FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, sha256 string, feature array<float>"


def real_decoder(payload: bytes, kind: str) -> np.ndarray:  # pragma: no cover
    """Placeholder for the real decode kernel (image/audio libs absent in
    this environment)."""
    raise NotImplementedError(
        "media decode requires PIL/librosa/ffmpeg which are not installed; "
        "pass decoder=fake_decoder for deterministic plumbing tests"
    )


def fake_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in: 8 floats derived from the payload digest."""
    d = hashlib.sha256(payload or b"").digest()
    return (np.frombuffer(d[:32], dtype=np.uint8).reshape(8, 4).sum(axis=1) / 255.0).astype(np.float32)


def _maybe_rebalance(media: DataFrame, rebalance: bool) -> DataFrame:
    """Map-only media operators must not pay a full corpus shuffle by
    default (round-3 verdict #3: at 100 TB of payload bytes an unconditional
    ``repartition`` is a network copy of the corpus bought for batch
    balance). Memory per task is already bounded by the mapInPandas
    iterator contract (one Arrow batch in flight), so rebalance is an
    OPT-IN for inputs with pathological partition skew."""
    return media.repartition("media_id") if rebalance else media


def extract_features(
    media: DataFrame, decoder=real_decoder, batch_hint: int = 256, rebalance: bool = False
) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas``.

    Shuffle-free by default: the Arrow-batch iterator bounds memory per
    task regardless of partition size. ``rebalance=True`` restores the
    blob-spreading shuffle for skewed inputs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p, k).tolist() for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "sha256": [hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return _maybe_rebalance(media, rebalance).mapInPandas(run, schema=FEATURE_SCHEMA)


def real_resizer(payload: bytes, mime: str, w: int, h: int, tw: int, th: int) -> bytes:  # pragma: no cover
    """Placeholder for the real resize kernel (PIL absent in this
    environment)."""
    raise NotImplementedError(
        "image resize requires PIL which is not installed; "
        "pass resizer=fake_resizer for deterministic plumbing tests"
    )


def fake_resizer(payload: bytes, mime: str, w: int, h: int, tw: int, th: int) -> bytes:
    """Deterministic stand-in: output bytes derived from (payload, target
    dims), sized proportionally to the target area."""
    d = hashlib.sha256((payload or b"") + f":{tw}x{th}".encode()).digest()
    need = max(1, (tw * th) // 64)
    return (d * (need // len(d) + 1))[:need]


def resize_media(
    media: DataFrame,
    target_w: int,
    target_h: int,
    resizer=real_resizer,
    kinds: tuple[str, ...] = ("image",),
    rebalance: bool = False,
) -> DataFrame:
    """Resize media payloads via ``mapInPandas`` — the batch-transform twin
    of :func:`extract_features`: rows of the selected ``kinds`` get a new
    payload + updated (width, height); other kinds pass through untouched,
    so the operator composes in a mixed-media pipeline without a split/
    union. Output schema == input schema (MEDIA_SCHEMA), which is what
    lets resize chain before decode/feature-extract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            mask = out["kind"].isin(kinds)
            if mask.any():
                out.loc[mask, "payload"] = [
                    resizer(p, m, w, h, target_w, target_h)
                    for p, m, w, h in zip(
                        out.loc[mask, "payload"], out.loc[mask, "mime"],
                        out.loc[mask, "width"], out.loc[mask, "height"],
                    )
                ]
                out.loc[mask, "width"] = target_w
                out.loc[mask, "height"] = target_h
            yield out

    return _maybe_rebalance(media, rebalance).mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts). The
    timestamps come from metadata (no decode needed); the actual frame
    extraction would run inside extract_features on (payload, ts) pairs."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))).alias(
            "frame_ts"
        ),
    )


def synth_media(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (f"m{i}", kind, bytearray(payload), f"{kind}/x-fake", 64 + i, 48 + i, 1000 * (1 + i % 7))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
