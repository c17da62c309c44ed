"""Multimodal columns: opaque ``binary`` media + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as binary
columns with metadata, and runs decode / feature-extract / resize /
frame-sample as Arrow-batched UDFs. The decode libraries (PIL,
ffmpeg, torchaudio) are NOT in this container, so the decode step is
a clearly-marked stub behind :func:`register_decoder` — everything
Spark-side (schema, batching, partition balancing, UDF signatures) is
real and tested with the deterministic built-in featurizer.

Conventions:
  media table: (media_id:long, media:binary, media_type:string,
                meta:map<string,string>)
  features:    (media_id:long, n_bytes:long, features:array<double>)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

# media_type -> decoder(bytes) -> np.ndarray features
_DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {}


def register_decoder(media_type: str, fn: Callable[[bytes], np.ndarray]) -> None:
    """Plug a real decoder (e.g. PIL image → pixel stats) in deployments
    that have the codec libraries installed."""
    _DECODERS[media_type] = fn


def byte_histogram(data: bytes, bins: int = 16) -> np.ndarray:
    """Deterministic stand-in featurizer: normalized byte-value
    histogram. NOT a real image/audio feature — it exists so the
    Spark plumbing is exercised end-to-end without codec libraries."""
    if not data:
        return np.zeros(bins)
    arr = np.frombuffer(data, dtype=np.uint8)
    hist = np.bincount(arr >> int(8 - np.log2(bins)), minlength=bins)
    return hist / arr.size


def extract_features(
    media: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    type_col: str = "media_type",
    bins: int = 16,
) -> DataFrame:
    """mapInPandas feature extraction over binary media.

    Unknown media types raise NotImplementedError naming the missing
    decoder — the stub boundary fails loudly, never silently."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for mt, blob in zip(pdf[type_col], pdf[media_col]):
                data = bytes(blob) if blob is not None else b""
                dec = _DECODERS.get(mt)
                if dec is not None:
                    feats.append(dec(data).astype(float).tolist())
                elif mt == "bytes":
                    feats.append(byte_histogram(data, bins).tolist())
                else:
                    raise NotImplementedError(
                        f"no decoder registered for media_type={mt!r}; "
                        "codec libraries are not in this container — "
                        "register one via register_decoder()"
                    )
                sizes.append(len(data))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "features": feats,
                }
            )

    cols = media.select(
        F.col(id_col), F.col(media_col), F.col(type_col)
    )
    return cols.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame,
    n_frames: int = 4,
    frame_bytes: int = 64,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Deterministic 'frame sampling' stub: n evenly-spaced byte slices
    per blob (stands in for ffmpeg keyframe extraction; the Spark
    shape — one row per (media, frame) — is the real contract)."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_id", LongType()),
            StructField("offset", LongType()),
            StructField("frame", __import__("pyspark.sql.types", fromlist=["BinaryType"]).BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                data = bytes(blob) if blob is not None else b""
                if not data:
                    continue
                step = max(len(data) // n_frames, 1)
                for fi in range(min(n_frames, len(data))):
                    off = fi * step
                    rows.append((int(mid), fi, off, data[off : off + frame_bytes]))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_id", "offset", "frame"]
            )

    return media.select(F.col(id_col), F.col(media_col)).mapInPandas(run, schema)
