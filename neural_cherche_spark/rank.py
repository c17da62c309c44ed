"""Reference-shaped ranker API: ``rank.ColBERT``.

Mirrors the reference's two-stage flow (README.md:93-175: a lexical
retriever produces candidates, ``rank.ColBERT`` re-scores them with
late-interaction MaxSim — rank/colbert.py:160-370). The torch model is
replaced by an ``encoder`` callable:

    encoder(texts: list[str]) -> list[list[list[float]]]

one token-embedding matrix (tokens × dim) per text — a user with the
real checkpoint wraps ``model.encode``; tests use a deterministic
featurizer. Scoring is ops/maxsim.py: candidates broadcast, MaxSim as
JVM lambda math, no Python in the scoring path.

Candidate dedup (reference rank/colbert.py:188-194, SURVEY J4): each
distinct candidate document is encoded and scored once even when it
appears for several queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from neural_cherche_spark.ops.maxsim import maxsim_rank


class ColBERT:
    """Distributed MaxSim ranker with the reference's call shape."""

    def __init__(
        self,
        key: str,
        on: str | list[str],
        encoder,
        spark: SparkSession | None = None,
    ) -> None:
        self.key = key
        self.on = [on] if isinstance(on, str) else list(on)
        self.encoder = encoder
        self.spark = spark or SparkSession.active()

    def _texts(self, docs: list[dict]) -> list[str]:
        return [
            " ".join(str(d.get(f, "")) for f in self.on) for d in docs
        ]

    def encode_documents(self, documents: list[dict]) -> DataFrame:
        """(doc_key, d_tokens) for the DEDUPED candidate set (J4)."""
        seen: dict[str, dict] = {}
        for d in documents:
            seen.setdefault(str(d[self.key]), d)
        keys = list(seen)
        mats = self.encoder(self._texts([seen[k] for k in keys]))
        rows = [
            (k, [[float(x) for x in tok] for tok in m])
            for k, m in zip(keys, mats)
        ]
        return self.spark.createDataFrame(
            rows, "doc_key string, d_tokens array<array<float>>"
        )

    def encode_queries(self, queries: list[str]) -> DataFrame:
        self._queries = queries
        mats = self.encoder(queries)
        rows = [
            (i, [[float(x) for x in tok] for tok in m])
            for i, m in enumerate(mats)
        ]
        return self.spark.createDataFrame(
            rows, "query_id long, q_tokens array<array<float>>"
        )

    def __call__(
        self,
        documents: list[list[dict]],
        queries_embeddings: DataFrame,
        documents_embeddings: DataFrame,
        k: int | None = None,
    ) -> list[list[dict]]:
        """Re-rank per-query candidate lists (reference
        rank/colbert.py:266-370): MaxSim over (query, candidate) pairs,
        descending, top-k per query. ``documents`` is the stage-1
        output: one candidate-doc list per query."""
        key_map: dict[str, object] = {}
        cand_rows = []
        for qid, cands in enumerate(documents):
            for d in cands:
                kv = d[self.key]
                key_map[str(kv)] = kv
                cand_rows.append((qid, str(kv)))
        if not cand_rows:
            return [[] for _ in documents]
        candidates = self.spark.createDataFrame(
            cand_rows, "query_id long, doc_id string"
        ).dropDuplicates(["query_id", "doc_id"])
        res = maxsim_rank(
            candidates,
            documents_embeddings.withColumnRenamed("doc_key", "doc_id"),
            queries_embeddings,
            k=k if k is not None else len(key_map),
        )
        by_query: dict[int, list] = {}
        for r in sorted(
            res.collect(), key=lambda r: (r["query_id"], r["rank"])
        ):
            by_query.setdefault(int(r["query_id"]), []).append(
                {
                    self.key: key_map[r["doc_id"]],
                    "similarity": float(r["score"]),
                }
            )
        return [by_query.get(qid, []) for qid in range(len(documents))]
