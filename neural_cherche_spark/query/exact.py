"""Exact BM25/TF-IDF retrieval: broadcast query terms ⋈ weights → agg → top-k.

The reference's retrieval "join" is a CSR matmul
(``tfidf.py:199-208``): an equi-join on term id followed by a sum —
re-expressed here as

    weights ⋈ BROADCAST(query_term_counts) ON term
    → groupBy(query_id, doc_id).sum(qtf · w)       (SURVEY A7/J1)
    → filter score > 0                              (T2, tfidf.py:210-217)
    → per-query top-k                               (T1, tfidf.py:163-174)

Scale notes: the query side is tiny (a batch of queries × ~dozens of
terms) — broadcasting it turns the retrieval join into a broadcast
hash join with NO shuffle of the big weights/postings side; the only
shuffle is the (query_id, doc_id) score aggregation, whose input is
already pre-filtered to matching terms. Head-term (stopword-gram)
skew on the join key is irrelevant under broadcast-hash; the agg side
is handled by AQE + map-side combine.

Unseen query terms drop out of the inner join — exactly the frozen-
vocabulary ``transform`` behavior (tfidf.py:134-135).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neural_cherche_spark.text.ngrams import tokenize_terms


def query_term_counts(
    queries: DataFrame,
    query_col: str = "query",
    id_col: str = "query_id",
    n_min: int = 3,
    n_max: int = 5,
) -> DataFrame:
    """(query_id, term, qtf) — reference ``encode_queries``
    (tfidf.py:123-144): same tokenizer, raw counts."""
    return (
        tokenize_terms(queries, query_col, id_col, n_min, n_max)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )


def top_k(
    scored: DataFrame,
    k: int | None,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    score: str = "score",
) -> DataFrame:
    """Deterministic per-query top-k: score desc, doc_id asc tiebreak.

    The reference's tie order is argpartition-internal and unstable
    (SURVEY §2.5 T1); we pin doc_id-asc so results are reproducible
    across partitionings and runs. k=None → all docs (T3).
    """
    w = Window.partitionBy(query_id).orderBy(
        F.col(score).desc(), F.col(doc_id).asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    return ranked if k is None else ranked.filter(F.col("rank") <= k)


def retrieve_exact(
    weights: DataFrame,
    queries: DataFrame,
    k: int | None = 10,
    query_col: str = "query",
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    n_min: int = 3,
    n_max: int = 5,
) -> DataFrame:
    """(query_id, doc_id, score, rank) top-k per query."""
    qt = query_term_counts(queries, query_col, query_id, n_min, n_max)
    scored = (
        weights.join(F.broadcast(qt), "term")
        .groupBy(query_id, doc_id)
        .agg(F.sum(F.col("qtf") * F.col("w")).alias("score"))
        .filter(F.col("score") > 0)
    )
    return top_k(scored, k, query_id, doc_id)
