"""BEIR-format dataset loading + reference-shaped ``evaluate``.

The reference's ``utils.load_beir`` (utils/evaluate.py:27-101)
downloads a BEIR zip and parses it into (documents, queries, qrels);
no network exists here, so this module implements the PARSER over an
already-materialized BEIR directory — the on-disk format is public:

    <dir>/corpus.jsonl        {"_id": ..., "title": ..., "text": ...}
    <dir>/queries.jsonl       {"_id": ..., "text": ...}
    <dir>/qrels/<split>.tsv   query-id \\t corpus-id \\t score (header)

``evaluate`` mirrors the reference's ``utils.evaluate``
(utils/evaluate.py:144-223): it consumes the retriever classes'
``list[list[{key, similarity}]]`` output plus a qrels mapping and
returns a metrics dict — computed by eval/metrics.evaluate_run
(Spark SQL) instead of ranx.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neural_cherche_spark.eval.metrics import evaluate_run


def load_beir_dir(
    spark: SparkSession, path: str, split: str = "test"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(documents, queries, qrels) DataFrames from a BEIR directory.

    documents: (doc_id string, title string, text string)
    queries:   (query_key string, query string)
    qrels:     (query_key string, doc_id string, relevance int)
    """
    docs = spark.read.json(os.path.join(path, "corpus.jsonl")).select(
        F.col("_id").cast("string").alias("doc_id"),
        F.coalesce(F.col("title"), F.lit("")).alias("title"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
    )
    queries = spark.read.json(os.path.join(path, "queries.jsonl")).select(
        F.col("_id").cast("string").alias("query_key"),
        F.col("text").alias("query"),
    )
    qrels = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .csv(os.path.join(path, "qrels", f"{split}.tsv"))
        .select(
            F.col("query-id").cast("string").alias("query_key"),
            F.col("corpus-id").cast("string").alias("doc_id"),
            F.col("score").cast("int").alias("relevance"),
        )
    )
    return docs, queries, qrels


def evaluate(
    spark: SparkSession,
    scores: list[list[dict]],
    qrels: dict[str, dict[str, int]],
    queries: list[str],
    metrics: tuple[str, ...] = ("map", "ndcg@10", "hits@10", "recall@10"),
    key: str = "id",
) -> dict[str, float]:
    """Reference-shaped evaluation entry point
    (utils/evaluate.py:144-223): per-query ranked results from a
    retriever/ranker class, qrels keyed by query string, metric names
    ``name@k`` (bare names evaluate over the full ranked lists, like
    ranx's un-cut map)."""
    run_rows = [
        (qi, str(h[key]), rank)
        for qi, hits in enumerate(scores)
        for rank, h in enumerate(hits, 1)
    ]
    qrel_rows = [
        (qi, str(doc), int(rel))
        for qi, q in enumerate(queries)
        for doc, rel in qrels.get(q, {}).items()
    ]
    if not run_rows or not qrel_rows:
        return {m: 0.0 for m in metrics}
    run = spark.createDataFrame(
        run_rows, "query_id long, doc_id string, rank int"
    )
    qrels_df = spark.createDataFrame(
        qrel_rows, "query_id long, doc_id string, relevance int"
    )
    full_k = max(r[2] for r in run_rows)
    by_k: dict[int, list[str]] = {}
    for m in metrics:
        k = int(m.split("@")[1]) if "@" in m else full_k
        by_k.setdefault(k, []).append(m)
    # ONE action for all distinct k's: union the per-k single-row
    # aggregates and collect once (each branch shares the same scanned
    # inputs inside one job) — previously one job + collect per k
    from functools import reduce

    unioned = reduce(
        lambda a, b: a.unionByName(b),
        [evaluate_run(run, qrels_df, k=k) for k in by_k],
    )
    rows_by_k = {int(r["k"]): r for r in unioned.collect()}
    out: dict[str, float] = {}
    for k, ms in by_k.items():
        for m in ms:
            out[m] = float(rows_by_k[k][m.split("@")[0]])
    return out
