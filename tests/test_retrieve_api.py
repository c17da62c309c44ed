"""Reference-API-shape parity: the retrieve.BM25/TfIdf classes run the
exact call sequence of the reference doctests and reproduce the
goldens (retrieve/bm25.py:38-108) including int keys, two-batch adds,
duplicate queries and multi-field docs."""

from __future__ import annotations

import pytest

from neural_cherche_spark import retrieve
from tests.conftest import (
    GOLDEN_BATCH1,
    GOLDEN_BATCH2,
    QUERIES_A,
    assert_rank_identical,
)

DOCS1 = [
    {"id": 0, "document": "Food"},
    {"id": 1, "document": "Sports"},
    {"id": 2, "document": "Cinema"},
]
DOCS2 = [
    {"id": 3, "document": "Food"},
    {"id": 4, "document": "Sports"},
    {"id": 5, "document": "Cinema"},
]


def _pairs(result):
    return [[(d["id"], d["similarity"]) for d in row] for row in result]


def test_bm25_doctest_sequence(spark, tmp_path):
    retriever = retrieve.BM25(
        key="id", on=["document"], spark=spark, state_dir=str(tmp_path / "s")
    )
    emb = retriever.encode_documents(documents=DOCS1)
    retriever = retriever.add(documents_embeddings=emb)
    q = retriever.encode_queries(queries=QUERIES_A)
    scores = retriever(queries_embeddings=q, k=4)
    for g, e in zip(_pairs(scores), GOLDEN_BATCH1):
        assert_rank_identical(g, e, rtol=1e-5)

    emb2 = retriever.encode_documents(documents=DOCS2)
    retriever = retriever.add(documents_embeddings=emb2)
    scores2 = retriever(queries_embeddings=q, k=4)
    for g, e in zip(_pairs(scores2), GOLDEN_BATCH2):
        assert_rank_identical(g, e, rtol=1e-5)


def test_multifield_and_string_keys(spark, tmp_path):
    """FIXTURES.md F4: multi-field concat, missing field → ''."""
    docs = [
        {"id": "doc1", "title": "Paris", "text": "Paris is the capital of France."},
        {"id": "doc2", "title": "Montreal", "text": "Montreal is the largest city in Quebec."},
        {"id": "doc3", "title": "Bordeaux"},  # missing text field
    ]
    r = retrieve.BM25(
        key="id", on=["title", "text"], spark=spark, state_dir=str(tmp_path / "s2")
    )
    r.add(r.encode_documents(docs))
    q = r.encode_queries(["capital of France", "largest city in Quebec", "Bordeaux"])
    out = r(q, k=3)
    assert out[0][0]["id"] == "doc1"
    assert out[1][0]["id"] == "doc2"
    assert out[2][0]["id"] == "doc3"
    assert isinstance(out[0][0]["id"], str)


def test_duplicate_queries_reexpanded(spark, tmp_path):
    r = retrieve.BM25(
        key="id", on=["document"], spark=spark, state_dir=str(tmp_path / "s3")
    )
    r.add(r.encode_documents(DOCS1))
    q = r.encode_queries(["Food", "Food", "Sports"])
    out = r(q, k=2)
    assert len(out) == 3
    assert out[0] == out[1]
    assert out[2][0]["id"] == 1


def test_tfidf_identical_doc_query_cosine_one(spark):
    r = retrieve.TfIdf(key="id", on=["document"], spark=spark)
    r.add(r.encode_documents(DOCS1))
    q = r.encode_queries(["Food"])
    out = r(q, k=3)
    assert out[0][0]["id"] == 0
    assert out[0][0]["similarity"] == pytest.approx(1.0, rel=1e-9)


def test_bm25_delta_backend_exact_stats(spark, tmp_path):
    """backend='delta': same call shape, EXACT statistics at every
    add (no reference stale-idf quirk) — after two adds the results
    must equal a single-shot build over the union corpus, and each
    add tokenizes only its batch (segments: one per add)."""
    r = retrieve.BM25(
        key="id", on=["document"], spark=spark,
        state_dir=str(tmp_path / "d"), backend="delta",
    )
    r = r.add(r.encode_documents(documents=DOCS1))
    q = r.encode_queries(queries=QUERIES_A)
    first = _pairs(r(queries_embeddings=q, k=4))
    assert any(row for row in first)  # batch-1 state answers

    r = r.add(r.encode_documents(documents=DOCS2))
    got = _pairs(r(queries_embeddings=q, k=4))

    # oracle: ONE-SHOT union-corpus retriever (exact global stats)
    ref = retrieve.BM25(
        key="id", on=["document"], spark=spark,
        state_dir=str(tmp_path / "one"),
    )
    ref = ref.add(ref.encode_documents(documents=DOCS1 + DOCS2))
    q2 = ref.encode_queries(queries=QUERIES_A)
    want = _pairs(ref(queries_embeddings=q2, k=4))
    for g, e in zip(got, want):
        assert_rank_identical(g, e, rtol=1e-5)

    # the delta index really is segmented: one segment per add()
    from neural_cherche_spark.index.builder import BM25Index

    idx = BM25Index(spark, str(tmp_path / "d" / "idx"))
    assert [s["seg"] for s in idx.manifest.segments] == [0, 1]


def test_bm25_delta_backend_int_and_str_keys(spark, tmp_path):
    docs = [
        {"id": "doc1", "t": "alpha beta gamma"},
        {"id": "doc2", "t": "delta epsilon zeta"},
    ]
    r = retrieve.BM25(
        key="id", on=["t"], spark=spark,
        state_dir=str(tmp_path / "k"), backend="delta",
    )
    r = r.add(r.encode_documents(documents=docs))
    q = r.encode_queries(queries=["alpha beta"])
    out = r(queries_embeddings=q, k=2)
    assert out[0][0]["id"] == "doc1"  # original key type restored


def test_tfidf_delta_backend_matches_union(spark, tmp_path):
    """TfIdf backend='delta' (segmented raw tfidf index, revisioned
    docnorm) must rank-match the union-recompute default after two
    adds — exact idf/doc-norm refresh without re-reading old
    postings."""
    docs1 = [
        {"id": 0, "document": "Food"},
        {"id": 1, "document": "Sports"},
        {"id": 2, "document": "Cinema"},
    ]
    docs2 = [
        {"id": 3, "document": "Food is life"},
        {"id": 4, "document": "Sports are fun"},
    ]
    queries = ["Food", "Sports", "Cinema"]

    d = retrieve.TfIdf(
        key="id", on=["document"], spark=spark,
        state_dir=str(tmp_path / "d"), backend="delta",
    )
    d = d.add(d.encode_documents(documents=docs1))
    # query between adds: forces a materialize, so the second add is a
    # genuine DELTA refresh (appended segment + docnorm revision)
    d(queries_embeddings=d.encode_queries(queries), k=3)
    d = d.add(d.encode_documents(documents=docs2))
    got = _pairs(d(queries_embeddings=d.encode_queries(queries), k=3))

    u = retrieve.TfIdf(key="id", on=["document"], spark=spark)
    u = u.add(u.encode_documents(documents=docs1))
    u = u.add(u.encode_documents(documents=docs2))
    want = _pairs(u(queries_embeddings=u.encode_queries(queries), k=3))
    for g, e in zip(got, want):
        assert_rank_identical(g, e, rtol=1e-6)

    from neural_cherche_spark.index.builder import BM25Index

    idx = BM25Index(spark, str(tmp_path / "d" / "idx"))
    assert [s["seg"] for s in idx.manifest.segments] == [0, 1]
    assert idx.manifest.docnorm_path == "docnorm_r1"
