"""End-to-end Spark exact pipeline vs reference goldens + numpy oracle.

Covers SURVEY §2.9 steps 1-7 on the doctest corpus (exact golden
scores) and rank-identity on a larger synthetic corpus against the
float32 numpy oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_cherche_spark.data import synth_queries, synth_webtext
from neural_cherche_spark.index import BM25Config, bm25_weights, tfidf_weights
from neural_cherche_spark.local import ReferenceBM25
from neural_cherche_spark.query import retrieve_exact
from tests.conftest import (
    CORPUS_A_BATCH1,
    GOLDEN_BATCH1,
    QUERIES_A,
    assert_rank_identical,
)


def _topk_lists(rows, n_queries):
    out = [[] for _ in range(n_queries)]
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        out[r["query_id"]].append((r["doc_id"], r["score"]))
    return out


def test_bm25_doctest_goldens_batch1(spark):
    docs = spark.createDataFrame(CORPUS_A_BATCH1, "doc_id long, text string")
    queries = spark.createDataFrame(
        list(enumerate(QUERIES_A)), "query_id long, query string"
    )
    w = bm25_weights(docs)
    res = retrieve_exact(w, queries, k=4).collect()
    got = _topk_lists(res, len(QUERIES_A))
    for g, e in zip(got, GOLDEN_BATCH1):
        assert_rank_identical(g, e)


def test_bm25_rank_identity_synthetic_vs_oracle(spark):
    """200 synthetic webtext docs, 20 queries: Spark pipeline must be
    rank-identical (tie-sets) to the float32 reference oracle."""
    docs = synth_webtext(spark, 200, seed=11).select(
        F.monotonically_increasing_id().alias("mono"), "url", "text"
    )
    # deterministic dense doc_id by url sort (SURVEY §4.5)
    rows = sorted(docs.select("url", "text").collect(), key=lambda r: r["url"])
    pdocs = [(i, r["text"]) for i, r in enumerate(rows)]
    qdf = synth_queries(spark, 20, seed=3)
    qrows = [r["query"] for r in qdf.orderBy("query_id").collect()]

    oracle = ReferenceBM25()
    oracle.add([i for i, _ in pdocs], [t for _, t in pdocs])
    expected = [
        [(d["key"], d["similarity"]) for d in row] for row in oracle(qrows, k=10)
    ]

    sdocs = spark.createDataFrame(pdocs, "doc_id long, text string")
    w = bm25_weights(sdocs)
    res = retrieve_exact(w, qdf, k=10).collect()
    got = _topk_lists(res, len(qrows))
    # rtol 1e-3: zipfian head terms make tf_total > N, so idf goes
    # negative (bm25.py:185-190, ε=0) and scores involve cancellation —
    # float32 (oracle) vs float64 (Spark) drift to ~1e-4 relative.
    # Rank order (the north_rule criterion) is still compared exactly.
    for qi, (g, e) in enumerate(zip(got, expected)):
        assert_rank_identical(g, e, rtol=1e-3)


def test_bm25_zero_overlap_query_empty(spark):
    docs = spark.createDataFrame(CORPUS_A_BATCH1, "doc_id long, text string")
    queries = spark.createDataFrame([(0, "zzzzqqq")], "query_id long, query string")
    w = bm25_weights(docs)
    assert retrieve_exact(w, queries, k=4).count() == 0


def test_tfidf_identical_query_scores_one(spark):
    """Reference invariant: cosine(doc, identical query) == 1.0
    (retrieve/tfidf.py:67-70)."""
    docs = spark.createDataFrame(
        [(0, "Paris is the capital of France"), (1, "Montreal is in Quebec")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "Paris is the capital of France")], "query_id long, query string"
    )
    w = tfidf_weights(docs)
    # cosine: normalize the query side too
    from neural_cherche_spark.query.exact import query_term_counts, top_k

    qt = query_term_counts(queries)
    dfq = qt.join(w.select("term", "idf").distinct(), "term").withColumn(
        "qw_raw", F.col("qtf") * F.col("idf")
    )
    qnorm = dfq.groupBy("query_id").agg(
        F.sqrt(F.sum(F.col("qw_raw") ** 2)).alias("qnorm")
    )
    scored = (
        dfq.join(qnorm, "query_id")
        .withColumn("qw", F.col("qw_raw") / F.col("qnorm"))
        .join(w, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("qw") * F.col("w")).alias("score"))
    )
    rows = {r["doc_id"]: r["score"] for r in scored.collect()}
    assert rows[0] == pytest.approx(1.0, rel=1e-9)
    assert rows.get(1, 0.0) < 1.0
