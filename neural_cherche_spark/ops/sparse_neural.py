"""Sparse *neural* retrieval operators — Splade / SparseEmbed query
semantics over precomputed activation tables, torch-free.

The reference's neural retrievers separate model inference (torch,
impossible offline) from the retrieval math (pure sparse algebra,
reproduced here as DataFrame ops):

* ``retrieve.Splade`` (reference retrieve/splade.py:23-78): documents
  and queries are sparse activation vectors over the model vocabulary;
  retrieval score = sparse dot product, then top-k. Exactly the BM25
  retrieval join with learned weights instead of BM25 weights.
* ``retrieve.SparseEmbed`` (reference retrieve/sparse_embed.py:341-452)
  is two-stage: (1) candidate generation = the same sparse dot product
  over activations, keep ``candidates_k`` per query; (2) re-scoring =
  Σ over the INTERSECTION of activated token ids of
  dot(query_token_embedding, doc_token_embedding)
  (sparse_embed.py:447-452 intersection + utils/dense_scores.py:19-24).

Inputs are long-format tables a model-inference pipeline would write:

    activations:      (id, term_id:long, weight:double)
    token embeddings: (id, term_id:long, emb:array<float>)

Scale notes: the query side (a batch of queries × ~dozens of active
terms) is broadcast, so the big doc-activation table never shuffles
for the join; the only shuffle is the (query_id, doc_id) score
aggregation — identical plan shape to query/exact.py. Stage-2 joins
touch only candidate rows (semi-join pushdown via the candidate set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# element-wise dot of two array<float> columns, double accumulation
# (same kernel as ops/ann.py)
_DOT = (
    "aggregate(zip_with(qe, de, (x, y) -> cast(x as double) * cast(y as double)), "
    "0.0D, (a, x) -> a + x)"
)


def _topk(scored: DataFrame, k: int | None) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    return ranked if k is None else ranked.filter(F.col("rank") <= k)


def splade_scores(
    doc_acts: DataFrame,
    query_acts: DataFrame,
    doc_id: str = "doc_id",
    query_id: str = "query_id",
) -> DataFrame:
    """(query_id, doc_id, score): sparse dot product of activations.

    Only docs sharing ≥1 activated term with the query appear (the
    equi-join); zero-overlap docs score 0 in the reference dense
    matmul and are never useful results.
    """
    q = query_acts.select(
        F.col(query_id).alias("query_id"),
        "term_id",
        F.col("weight").alias("qw"),
    )
    d = doc_acts.select(
        F.col(doc_id).alias("doc_id"),
        "term_id",
        F.col("weight").alias("dw"),
    )
    return (
        d.join(F.broadcast(q), "term_id")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("qw") * F.col("dw")).alias("score"))
    )


def splade_topk(
    doc_acts: DataFrame,
    query_acts: DataFrame,
    k: int | None = 10,
    doc_id: str = "doc_id",
    query_id: str = "query_id",
) -> DataFrame:
    """(query_id, doc_id, score, rank) — reference retrieve.Splade
    __call__ (splade.py:23-78): dot-product top-k, deterministic
    doc_id-asc tie-break."""
    return _topk(splade_scores(doc_acts, query_acts, doc_id, query_id), k)


def sparse_embed_scores(
    candidates: DataFrame,
    doc_token_embs: DataFrame,
    query_token_embs: DataFrame,
) -> DataFrame:
    """(query_id, doc_id, score): token-level re-scoring over the
    intersection of activated term ids (reference
    sparse_embed.py:447-452 — `unique(cat(t1,t2), counts>1)` — and
    utils/dense_scores.py:19-24 per-token dot products).

    ``candidates``: (query_id, doc_id) pairs from stage 1.
    The intersection is realized as the (doc_id, term_id) equi-join of
    the two token-embedding tables restricted to candidate pairs —
    terms activated on only one side drop out of the inner join.
    Candidates whose intersection is EMPTY score 0.0 and stay in the
    ranking (the reference keeps every stage-1 candidate and topk's
    over all of them, sparse_embed.py:400-410 — an inner join alone
    would shorten the result list; ADVICE r2).
    """
    q = query_token_embs.select(
        "query_id", "term_id", F.col("emb").alias("qe")
    )
    d = doc_token_embs.select("doc_id", "term_id", F.col("emb").alias("de"))
    pairs = candidates.select("query_id", "doc_id")
    inter = (
        pairs.join(q, "query_id")
        .join(d, ["doc_id", "term_id"])
        .withColumn("dot", F.expr(_DOT))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("dot").alias("score"))
    )
    return pairs.join(inter, ["query_id", "doc_id"], "left").select(
        "query_id",
        "doc_id",
        F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
    )


def sparse_embed_topk(
    doc_acts: DataFrame,
    query_acts: DataFrame,
    doc_token_embs: DataFrame,
    query_token_embs: DataFrame,
    k: int | None = 10,
    candidates_k: int | None = 100,
) -> DataFrame:
    """Two-stage SparseEmbed retrieval (sparse_embed.py:341-452):
    activation dot-product candidates, token-intersection re-scoring,
    final top-k. ``candidates_k=None`` scores every overlapping doc
    (the exact/oracle mode)."""
    cands = splade_topk(doc_acts, query_acts, k=candidates_k).select(
        "query_id", "doc_id"
    )
    scored = sparse_embed_scores(cands, doc_token_embs, query_token_embs)
    return _topk(scored, k)
