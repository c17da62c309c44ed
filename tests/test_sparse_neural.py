"""Splade / SparseEmbed retrieval operators (ops/sparse_neural.py)
against hand-computed expectations on tiny activation tables.

Reference semantics: retrieve/splade.py:23-78 (sparse dot top-k),
retrieve/sparse_embed.py:341-452 (candidate gen + token-intersection
re-scoring via per-token dot products, utils/dense_scores.py:19-24).
"""

from __future__ import annotations

import pytest

from neural_cherche_spark.ops.sparse_neural import (
    sparse_embed_topk,
    splade_scores,
    splade_topk,
)


@pytest.fixture(scope="module")
def acts(spark):
    # doc 0 activates tokens {1, 2}; doc 1 {2, 3}; doc 2 {9} (no overlap)
    d = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 1.0), (1, 2, 3.0), (1, 3, 1.0), (2, 9, 5.0)],
        "doc_id long, term_id long, weight double",
    )
    # query 0 activates {1, 2}; query 1 activates {3}
    q = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 2.0), (1, 3, 4.0)],
        "query_id long, term_id long, weight double",
    )
    return d, q


def test_splade_dot_product_scores(spark, acts):
    d, q = acts
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in splade_scores(d, q).collect()
    }
    # q0·d0 = 1*2 + 2*1 = 4 ; q0·d1 = 2*3 = 6 ; q1·d1 = 4*1 = 4
    assert got == {(0, 0): 4.0, (0, 1): 6.0, (1, 1): 4.0}


def test_splade_topk_ranks_and_cuts(spark, acts):
    d, q = acts
    rows = sorted(
        (r["query_id"], r["rank"], r["doc_id"])
        for r in splade_topk(d, q, k=1).collect()
    )
    assert rows == [(0, 1, 1), (1, 1, 1)]


def test_sparse_embed_intersection_scoring(spark, acts):
    d, q = acts
    # token embeddings: term 1 ↦ [1, 0], term 2 ↦ [0, 1], term 3 ↦ [1, 1]
    dte = spark.createDataFrame(
        [
            (0, 1, [1.0, 0.0]), (0, 2, [0.0, 2.0]),
            (1, 2, [0.0, 1.0]), (1, 3, [3.0, 0.0]),
        ],
        "doc_id long, term_id long, emb array<float>",
    )
    qte = spark.createDataFrame(
        [(0, 1, [2.0, 0.0]), (0, 2, [0.0, 5.0]), (1, 3, [1.0, 1.0])],
        "query_id long, term_id long, emb array<float>",
    )
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rank"])
        for r in sparse_embed_topk(d, q, dte, qte, k=10, candidates_k=None).collect()
    }
    # (q0,d0): terms {1,2} → 2·1 + 5·2 = 12 ; (q0,d1): term {2} → 5·1 = 5
    # (q1,d1): term {3} → 1·3 = 3
    assert got == {(0, 0): (12.0, 1), (0, 1): (5.0, 2), (1, 1): (3.0, 1)}


def test_sparse_embed_candidate_cut_limits_stage2(spark, acts):
    d, q = acts
    dte = spark.createDataFrame(
        [(0, 1, [1.0]), (0, 2, [1.0]), (1, 2, [1.0]), (1, 3, [1.0])],
        "doc_id long, term_id long, emb array<float>",
    )
    qte = spark.createDataFrame(
        [(0, 1, [1.0]), (0, 2, [1.0]), (1, 3, [1.0])],
        "query_id long, term_id long, emb array<float>",
    )
    # candidates_k=1 keeps only the best stage-1 doc per query:
    # q0 → d1 (stage-1 score 6 beats 4), so d0 never reaches stage 2
    got = {(r["query_id"], r["doc_id"]) for r in
           sparse_embed_topk(d, q, dte, qte, k=10, candidates_k=1).collect()}
    assert got == {(0, 1), (1, 1)}
