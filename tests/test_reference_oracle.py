"""The numpy oracle must reproduce the reference doctest goldens
(retrieve/bm25.py:38-108 via BASELINE.md) — it anchors every
rank-identity test of the distributed engine."""

from __future__ import annotations

from neural_cherche_spark.local import ReferenceBM25
from tests.conftest import (
    CORPUS_A_BATCH1,
    CORPUS_A_BATCH2,
    GOLDEN_BATCH1,
    GOLDEN_BATCH2,
    QUERIES_A,
    assert_rank_identical,
)


def _run(retriever, queries, k):
    res = retriever(queries, k=k)
    return [[(d["key"], d["similarity"]) for d in row] for row in res]


def test_batch1_goldens():
    r = ReferenceBM25()
    r.add([k for k, _ in CORPUS_A_BATCH1], [t for _, t in CORPUS_A_BATCH1])
    got = _run(r, QUERIES_A, k=4)
    for g, e in zip(got, GOLDEN_BATCH1):
        assert_rank_identical(g, e)


def test_batch2_goldens():
    r = ReferenceBM25()
    r.add([k for k, _ in CORPUS_A_BATCH1], [t for _, t in CORPUS_A_BATCH1])
    r.add([k for k, _ in CORPUS_A_BATCH2], [t for _, t in CORPUS_A_BATCH2])
    got = _run(r, QUERIES_A, k=4)
    for g, e in zip(got, GOLDEN_BATCH2):
        assert_rank_identical(g, e)


def test_zero_overlap_query_is_empty():
    r = ReferenceBM25()
    r.add([0, 1], ["Food", "Sports"])
    assert _run(r, ["zzzzqqq"], k=4) == [[]]
