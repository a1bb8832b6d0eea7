"""Multimodal column handling (SURVEY X41 + north-star): image/audio/video
as opaque ``binary`` columns with typed metadata; decode / feature-extract
as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio libraries, so the decode step is STUBBED
(``decode_media`` raises NotImplementedError unless the deterministic fake
is requested) — but the Spark-side plumbing is real and tested: schemas,
binary hashing for dedup keys, batch iteration shape, and the
feature-extraction pipeline over ``mapInPandas`` (byte-histogram features
as the deterministic stand-in for a real encoder).
"""

from __future__ import annotations

import hashlib

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

#: Schema of the media-asset frame produced by attach_media.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("content_sha256", T.StringType()),
    ]
)


def attach_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a binary media column from document text (deterministic
    stand-in for real image/audio payloads) with typed metadata + content
    hashes — the dedup key for binary assets is the hash, never the blob."""
    content = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("asset_id"),
        (
            F.when(F.col(id_col) % 3 == 0, "image/png")
            .when(F.col(id_col) % 3 == 1, "audio/wav")
            .otherwise("video/mp4")
        ).alias("media_type"),
        content.alias("content"),
        F.octet_length(content).alias("n_bytes"),
        F.md5(content).alias("content_md5"),
        F.sha2(content, 256).alias("content_sha256"),
    )


def decode_media(content: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """Decode a media payload to a raw array. Real decoders (PIL/ffmpeg/
    torchaudio) are unavailable in this container — STUB per environment
    contract; ``fake=True`` yields a deterministic byte-view instead."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this environment; pass fake=True for the deterministic stub"
        )
    return np.frombuffer(content, dtype=np.uint8)


FEATURE_DIM = 32

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(assets: DataFrame) -> DataFrame:
    """Feature extraction over ``mapInPandas`` — Arrow batches in, one
    feature vector per asset out. The featurizer here is a normalized
    byte histogram (deterministic fake); a real encoder slots into
    ``_featurize_batch`` unchanged (same schema/batch shape)."""

    def _featurize_batch(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                arr = decode_media(bytes(content), "", fake=True)
                hist, _ = np.histogram(
                    arr, bins=FEATURE_DIM, range=(0, 256), density=False
                )
                total = max(int(hist.sum()), 1)
                feats.append((hist / total).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return assets.select("asset_id", "media_type", "content").mapInPandas(
        _featurize_batch, schema=_FEATURE_SCHEMA
    )


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video assets: emits (asset_id, frame_no)
    rows for frames 0, n, 2n … — the real frame decode is the stubbed
    step; the explode/partition shape is what matters at scale."""
    n_frames = (F.col("n_bytes") / 100).cast("int")  # fake: 1 frame / 100 B
    frames = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        assets.filter(F.col("media_type") == "video/mp4")
        .select("asset_id", F.explode(frames).alias("frame_no"))
    )


def python_hash_media(content: pd.Series) -> pd.Series:
    """Reference hasher for tests (hashlib mirrors Spark's md5)."""
    return content.map(lambda b: hashlib.md5(bytes(b)).hexdigest())

# Executors must not need this repo on their PYTHONPATH: register this
# module for pickle-by-value so UDFs/closures ship inside the task
# (the driver contract imports __spark_entry__.py by path, not site-packages).
import sys as _sys
from pyspark import cloudpickle as _cloudpickle
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
