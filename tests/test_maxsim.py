"""MaxSim late-interaction ranking vs a numpy reference, plus the
two-stage retrieve→rank wire (reference README.md:93-175 pattern)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from neural_cherche_spark.index import bm25_weights
from neural_cherche_spark.ops.maxsim import maxsim_rank
from neural_cherche_spark.query import retrieve_exact


def _np_maxsim(q_toks: np.ndarray, d_toks: np.ndarray) -> float:
    # reference rank/colbert.py:316-324: einsum -> max over doc tokens -> sum
    sims = q_toks @ d_toks.T
    return float(sims.max(axis=1).sum())


def test_maxsim_matches_numpy(spark):
    rng = np.random.default_rng(7)
    n_docs, n_q, tok, dim = 20, 3, 4, 8
    d = rng.standard_normal((n_docs, tok, dim)).astype(np.float32)
    q = rng.standard_normal((n_q, tok, dim)).astype(np.float32)

    doc_tokens = spark.createDataFrame(
        [(i, [list(map(float, t)) for t in d[i]]) for i in range(n_docs)],
        "doc_id long, d_tokens array<array<float>>",
    )
    query_tokens = spark.createDataFrame(
        [(i, [list(map(float, t)) for t in q[i]]) for i in range(n_q)],
        "query_id long, q_tokens array<array<float>>",
    )
    candidates = spark.createDataFrame(
        [(qi, di) for qi in range(n_q) for di in range(n_docs)],
        "query_id long, doc_id long",
    )
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in maxsim_rank(candidates, doc_tokens, query_tokens, k=n_docs).collect()
    }
    for qi in range(n_q):
        for di in range(n_docs):
            want = _np_maxsim(
                q[qi].astype(np.float64), d[di].astype(np.float64)
            )
            assert got[(qi, di)] == pytest.approx(want, rel=1e-6)


def test_two_stage_retrieve_then_rank(spark):
    """BM25 candidates -> MaxSim re-rank, end-to-end."""
    docs = spark.createDataFrame(
        [(0, "Food"), (1, "Sports"), (2, "Cinema")], "doc_id long, text string"
    )
    queries = spark.createDataFrame(
        [(0, "food sports")], "query_id long, query string"
    )
    candidates = retrieve_exact(bm25_weights(docs), queries, k=3).select(
        "query_id", "doc_id"
    )
    # toy token embeddings making doc 1 the MaxSim winner
    doc_tokens = spark.createDataFrame(
        [
            (0, [[1.0, 0.0], [0.0, 0.2]]),
            (1, [[0.9, 0.9], [0.8, 0.0]]),
            (2, [[0.0, 0.1], [0.1, 0.0]]),
        ],
        "doc_id long, d_tokens array<array<float>>",
    )
    query_tokens = spark.createDataFrame(
        [(0, [[1.0, 1.0]])], "query_id long, q_tokens array<array<float>>"
    )
    ranked = maxsim_rank(candidates, doc_tokens, query_tokens, k=2).collect()
    ordered = [r["doc_id"] for r in sorted(ranked, key=lambda r: r["rank"])]
    assert ordered[0] == 1
    # candidate set came from stage 1: only bm25-matched docs appear
    assert set(ordered) <= {0, 1}
