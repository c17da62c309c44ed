"""Late-interaction (ColBERT-style) MaxSim ranking as DataFrame ops.

The reference's second stage (rank/colbert.py:316-324) scores a
(query, candidate-doc) pair as

    score = Σ_{q token} max_{d token} (q · d)

over token-embedding matrices (einsum "sh,bth->bst" → max over t →
sum over s). Re-expressed Spark-first: token tables in long format,
an equi-join on the candidate list, and the max-dot computed JVM-side
with nested ``transform``/``aggregate`` lambdas — no Python UDF, no
shuffle beyond the candidate join and the final (query, doc) sum.

Inputs:
  candidates:  (query_id, doc_id)            — stage-1 output (J2/J4)
  doc_tokens:  (doc_id, d_tokens array<array<float>>)
  query_tokens:(query_id, q_tokens array<array<float>>)

At scale the candidate list is the small side (top-k × queries) —
broadcast it; doc_tokens is the big side and is touched once.

Model inference (producing the token embeddings) is out of scope here
(torch is not in this container): any upstream can materialize token
embedding tables; these operators implement the ranking math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = (
    "aggregate(zip_with(qt, dt, (x, y) -> cast(x as double) * cast(y as double)), "
    "0.0D, (a, x) -> a + x)"
)

# per (q token): max over doc tokens of dot; then sum over q tokens
_MAXSIM = f"""
aggregate(
  transform(q_tokens, qt ->
    array_max(transform(d_tokens, dt -> {_DOT}))),
  0.0D, (a, x) -> a + x)
"""


def maxsim_scores(
    candidates: DataFrame,
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
) -> DataFrame:
    """(query_id, doc_id, score) MaxSim for every candidate pair."""
    return (
        doc_tokens.join(F.broadcast(candidates), "doc_id")
        .join(F.broadcast(query_tokens), "query_id")
        .select(
            "query_id",
            "doc_id",
            F.expr(_MAXSIM).alias("score"),
        )
    )


def maxsim_retrieve(
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
    k: int | None = 10,
) -> DataFrame:
    """(query_id, doc_id, score, rank) MaxSim over the FULL corpus —
    the retrieval (not re-ranking) shape (reference retrieve/colbert.py
    :120-190 scores every added document for every query; no candidate
    list, no positive-score filter — torch.topk keeps the k best
    regardless of sign).

    Plan: the (small) query-token batch is broadcast against the doc
    table, so the corpus is scanned once with no shuffle; the only
    shuffle is the per-query top-k window. ``k=None`` ranks all docs.
    """
    scored = doc_tokens.crossJoin(F.broadcast(query_tokens)).select(
        "query_id", "doc_id", F.expr(_MAXSIM).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    return ranked if k is None else ranked.filter(F.col("rank") <= k)


def maxsim_rank(
    candidates: DataFrame,
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
    k: int = 10,
) -> DataFrame:
    """(query_id, doc_id, score, rank) — the reference's rank._rank
    top-k (rank/colbert.py:334-370) with deterministic tie-break."""
    scored = maxsim_scores(candidates, doc_tokens, query_tokens)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
