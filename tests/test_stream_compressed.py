"""Incremental compressed-index maintenance (streaming/compressed.py):
a stream of batches followed by materialize() must produce an index
whose every query mode returns the SAME results as a from-scratch
build_index over the union corpus (round-1 VERDICT next-steps #9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_cherche_spark.data import synth_queries, synth_webtext
from neural_cherche_spark.index.builder import build_index
from neural_cherche_spark.streaming import (
    CompressedIndexStream,
    stream_build_compressed,
)


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth_webtext(spark, 300, seed=11).select("url", "text")
    rows = sorted(docs.collect(), key=lambda r: r["url"])
    pdocs = [(i, r["url"], r["text"]) for i, r in enumerate(rows)]
    return spark.createDataFrame(pdocs, "doc_id long, url string, text string")


def _results(index, queries, mode):
    return {
        (r["query_id"], r["doc_id"], round(r["score"], 6), r["rank"])
        for r in index.search(queries, k=10, mode=mode).collect()
    }


def test_materialized_stream_matches_fresh_build(spark, corpus, tmp_path):
    b1 = corpus.filter(F.col("doc_id") < 120)
    b2 = corpus.filter((F.col("doc_id") >= 120) & (F.col("doc_id") < 220))
    b3 = corpus.filter(F.col("doc_id") >= 220)

    stream = CompressedIndexStream(spark, str(tmp_path / "state"))
    stream.add_batch(b1, epoch_id=0).add_batch(b2, epoch_id=1)
    stream.add_batch(b2, epoch_id=1)  # replayed epoch: must be a no-op
    stream.add_batch(b3, epoch_id=2)
    inc = stream.materialize(
        str(tmp_path / "inc_idx"), n_buckets=8, salt_every=50
    )

    fresh = build_index(
        spark, corpus, str(tmp_path / "fresh_idx"),
        id_col="doc_id", n_buckets=8, salt_every=50,
    )
    assert inc.manifest.n_docs == fresh.manifest.n_docs == 300
    assert inc.manifest.n_postings == fresh.manifest.n_postings
    assert inc.manifest.n_terms == fresh.manifest.n_terms

    queries = synth_queries(spark, 10, seed=21)
    for mode in ("bmw", "distributed"):
        assert _results(inc, queries, mode) == _results(fresh, queries, mode)


def test_materialize_resume_skips_when_state_unchanged(spark, corpus, tmp_path):
    import os

    stream = CompressedIndexStream(spark, str(tmp_path / "state"))
    stream.add_batch(corpus.filter(F.col("doc_id") < 50), epoch_id=0)
    d = str(tmp_path / "idx")
    stream.materialize(d, n_buckets=4)
    t1 = os.path.getmtime(os.path.join(d, "postings", "_SUCCESS"))
    stream.materialize(d, n_buckets=4)  # no new batches → all stages skip
    assert os.path.getmtime(os.path.join(d, "postings", "_SUCCESS")) == t1
    # a new batch invalidates the fingerprint → postings rebuild
    stream.add_batch(
        corpus.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 80)),
        epoch_id=1,
    )
    idx = stream.materialize(d, n_buckets=4)
    assert os.path.getmtime(os.path.join(d, "postings", "_SUCCESS")) > t1
    assert idx.manifest.n_docs == 80


def test_stream_wire_accumulates_batches(spark, corpus, tmp_path):
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    rows = corpus.filter(F.col("doc_id") < 60).select("doc_id", "text").collect()
    pd.DataFrame([(r["doc_id"], r["text"]) for r in rows[:30]],
                 columns=["doc_id", "text"]).to_parquet(src / "a.parquet")
    pd.DataFrame([(r["doc_id"], r["text"]) for r in rows[30:]],
                 columns=["doc_id", "text"]).to_parquet(src / "b.parquet")
    q = stream_build_compressed(spark, str(src), str(tmp_path / "state"))
    q.awaitTermination(120)
    idx = CompressedIndexStream(spark, str(tmp_path / "state")).materialize(
        str(tmp_path / "idx"), n_buckets=4
    )
    assert idx.manifest.n_docs == 60
