"""Incremental add: the two-batch doctest goldens (the hardest parity
target — stale-idf + full-matrix renormalization semantics) must hold
through the distributed append-only path, and the Structured
Streaming wire must accumulate the same state."""

from __future__ import annotations

import pytest

from neural_cherche_spark.streaming import IncrementalBM25Builder, stream_build
from tests.conftest import (
    CORPUS_A_BATCH1,
    CORPUS_A_BATCH2,
    GOLDEN_BATCH1,
    GOLDEN_BATCH2,
    QUERIES_A,
    assert_rank_identical,
)


def _topk_lists(df, n_queries):
    out = [[] for _ in range(n_queries)]
    for r in sorted(df.collect(), key=lambda r: (r["query_id"], r["rank"])):
        out[r["query_id"]].append((r["doc_id"], r["score"]))
    return out


def test_two_batch_goldens(spark, tmp_path):
    b = IncrementalBM25Builder(spark, str(tmp_path / "state"))
    queries = spark.createDataFrame(
        list(enumerate(QUERIES_A)), "query_id long, query string"
    )

    b.add_batch(spark.createDataFrame(CORPUS_A_BATCH1, "doc_id long, text string"))
    got1 = _topk_lists(b.retrieve(queries, k=4), len(QUERIES_A))
    for g, e in zip(got1, GOLDEN_BATCH1):
        assert_rank_identical(g, e, rtol=1e-5)

    b.add_batch(spark.createDataFrame(CORPUS_A_BATCH2, "doc_id long, text string"))
    got2 = _topk_lists(b.retrieve(queries, k=4), len(QUERIES_A))
    for g, e in zip(got2, GOLDEN_BATCH2):
        assert_rank_identical(g, e, rtol=1e-5)


def test_unseen_terms_dropped_after_fit(spark, tmp_path):
    """Frozen vocabulary: terms first seen in batch 2 must not match."""
    b = IncrementalBM25Builder(spark, str(tmp_path / "state"))
    b.add_batch(spark.createDataFrame([(0, "Food")], "doc_id long, text string"))
    b.add_batch(spark.createDataFrame([(1, "Quantum")], "doc_id long, text string"))
    queries = spark.createDataFrame([(0, "Quantum")], "query_id long, query string")
    assert b.retrieve(queries, k=4).count() == 0


def test_replayed_epoch_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed epoch must not
    double-count tf / n_docs (ADVICE r1 medium)."""
    b = IncrementalBM25Builder(spark, str(tmp_path / "state"))
    batch = spark.createDataFrame(CORPUS_A_BATCH1, "doc_id long, text string")
    b.add_batch(batch, epoch_id=0)
    m1 = b._meta()
    tf1 = sorted(
        (r["doc_id"], r["term"], r["tf"])
        for r in spark.read.parquet(str(tmp_path / "state" / "tf")).collect()
    )
    b.add_batch(batch, epoch_id=0)  # replay: must be a no-op
    m2 = b._meta()
    tf2 = sorted(
        (r["doc_id"], r["term"], r["tf"])
        for r in spark.read.parquet(str(tmp_path / "state" / "tf")).collect()
    )
    assert m1["n_batches"] == m2["n_batches"] == 1
    assert m1["n_docs"] == m2["n_docs"] == len(CORPUS_A_BATCH1)
    assert tf1 == tf2
    # a NEW epoch still applies
    b.add_batch(
        spark.createDataFrame(CORPUS_A_BATCH2, "doc_id long, text string"),
        epoch_id=1,
    )
    assert b._meta()["n_batches"] == 2


def test_stream_build_matches_batch_adds(spark, tmp_path):
    """foreachBatch micro-batches accumulate the same tf state as
    direct add_batch calls (tf content is batch-order-independent)."""
    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame(CORPUS_A_BATCH1, columns=["doc_id", "text"]).to_parquet(
        src / "a_batch1.parquet"
    )
    pd.DataFrame(CORPUS_A_BATCH2, columns=["doc_id", "text"]).to_parquet(
        src / "b_batch2.parquet"
    )
    q = stream_build(spark, str(src), str(tmp_path / "stream_state"))
    q.awaitTermination(120)

    direct = IncrementalBM25Builder(spark, str(tmp_path / "direct_state"))
    direct.add_batch(
        spark.createDataFrame(CORPUS_A_BATCH1, "doc_id long, text string")
    )
    direct.add_batch(
        spark.createDataFrame(CORPUS_A_BATCH2, "doc_id long, text string")
    )

    got = {
        (r["doc_id"], r["term"], r["tf"])
        for r in spark.read.parquet(str(tmp_path / "stream_state" / "tf")).collect()
    }
    want = {
        (r["doc_id"], r["term"], r["tf"])
        for r in spark.read.parquet(str(tmp_path / "direct_state" / "tf")).collect()
    }
    assert got == want
