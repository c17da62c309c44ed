"""BEIR-directory loader + reference-shaped evaluate()
(eval/beir.py): end-to-end over a synthetic BEIR layout, with the
metrics pinned by hand computation."""

from __future__ import annotations

import json

import pytest

from neural_cherche_spark.eval import evaluate, load_beir_dir
from neural_cherche_spark.retrieve import BM25


@pytest.fixture()
def beir_dir(tmp_path):
    d = tmp_path / "scifact-mini"
    (d / "qrels").mkdir(parents=True)
    corpus = [
        {"_id": "d1", "title": "alpha", "text": "quick brown foxes jumping"},
        {"_id": "d2", "title": "beta", "text": "lazy sleeping dogs"},
        {"_id": "d3", "title": "gamma", "text": "brown bears fishing rivers"},
    ]
    queries = [
        {"_id": "q1", "text": "foxes jumping"},
        {"_id": "q2", "text": "sleeping dogs"},
    ]
    with open(d / "corpus.jsonl", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in corpus)
    with open(d / "queries.jsonl", "w") as f:
        f.writelines(json.dumps(r) + "\n" for r in queries)
    with open(d / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        f.write("q1\td1\t1\nq2\td2\t1\n")
    return str(d)


def test_load_beir_dir_shapes(spark, beir_dir):
    docs, queries, qrels = load_beir_dir(spark, beir_dir)
    assert docs.columns == ["doc_id", "title", "text"]
    assert docs.count() == 3
    assert queries.count() == 2
    got = {(r["query_key"], r["doc_id"], r["relevance"]) for r in qrels.collect()}
    assert got == {("q1", "d1", 1), ("q2", "d2", 1)}


def test_end_to_end_beir_eval_with_bm25_class(spark, beir_dir, tmp_path):
    docs_df, queries_df, qrels_df = load_beir_dir(spark, beir_dir)
    docs = [r.asDict() for r in docs_df.collect()]
    q_rows = sorted(queries_df.collect(), key=lambda r: r["query_key"])
    queries = [r["query"] for r in q_rows]
    qrels = {}
    key_to_text = {r["query_key"]: r["query"] for r in q_rows}
    for r in qrels_df.collect():
        qrels.setdefault(key_to_text[r["query_key"]], {})[r["doc_id"]] = r[
            "relevance"
        ]

    retriever = BM25(
        key="doc_id", on=["title", "text"], spark=spark,
        state_dir=str(tmp_path / "bm25_state"),
    )
    retriever.add(retriever.encode_documents(docs))
    scores = retriever(retriever.encode_queries(queries), k=3)
    out = evaluate(
        spark, scores, qrels, queries,
        metrics=("map", "ndcg@3", "hits@3", "recall@3"), key="doc_id",
    )
    # each query's single relevant doc is the lexical best match → all 1.0
    assert out == {"map": 1.0, "ndcg@3": 1.0, "hits@3": 1.0, "recall@3": 1.0}


def test_evaluate_handcomputed_partial_hits(spark):
    # q0: relevant d9 at rank 2 → ap = 1/2, ndcg@2 = 1/log2(3),
    # hit = 1, recall = 1. q1: no relevant retrieved → zeros.
    scores = [
        [{"id": "d1", "similarity": 2.0}, {"id": "d9", "similarity": 1.0}],
        [{"id": "d1", "similarity": 1.0}],
    ]
    qrels = {"qa": {"d9": 1}, "qb": {"d7": 1}}
    out = evaluate(
        spark, scores, qrels, ["qa", "qb"],
        metrics=("map", "ndcg@2", "hits@2", "recall@2"),
    )
    import math

    assert out["hits@2"] == pytest.approx(0.5)
    assert out["recall@2"] == pytest.approx(0.5)
    assert out["map"] == pytest.approx(0.25)
    assert out["ndcg@2"] == pytest.approx((1 / math.log2(3)) / 2, abs=1e-6)
