"""Reference-shaped ranker API: ``rank.ColBERT`` / ``rank.SparseEmbed``.

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


class SparseEmbed:
    """Distributed SparseEmbed *ranker* (reference rank/sparse_embed.py
    :10 — a subclass of the SparseEmbed retriever that re-scores given
    per-query candidate lists instead of running stage-1 retrieval).

    ``encoder(texts) -> list[tuple[dict[int, float], dict[int,
    list[float]]]]`` — per text: (activations, token embeddings for the
    activated ids), the same callable slot as
    :class:`neural_cherche_spark.retrieve.SparseEmbed`.

    Scoring is ``ops.sparse_neural.sparse_embed_scores``: Σ over the
    intersection of activated token ids of dot(q token emb, d token
    emb); candidates with an EMPTY intersection stay ranked at 0.0
    (reference keeps every candidate). This list[dict] API is the
    compat surface, not the 100 TB path — the engine path feeds
    activation/token-embedding TABLES into ops/sparse_neural directly.
    """

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

    def _encode_both(self, texts: list[str], ids: list, id_name: str):
        idt = "string" if id_name == "doc_id" else "long"
        act_rows, emb_rows = [], []
        for i, (acts, embs) in zip(ids, self.encoder(texts)):
            iid = str(i) if idt == "string" else int(i)
            act_rows += [(iid, int(t), float(w)) for t, w in acts.items()]
            emb_rows += [
                (iid, int(t), [float(x) for x in v]) for t, v in embs.items()
            ]
        acts_df = self.spark.createDataFrame(
            act_rows, f"{id_name} {idt}, term_id long, weight double"
        )
        embs_df = self.spark.createDataFrame(
            emb_rows, f"{id_name} {idt}, term_id long, emb array<float>"
        )
        return acts_df, embs_df

    def encode_documents(
        self, documents: list[dict] | list[list[dict]]
    ) -> tuple[DataFrame, DataFrame]:
        """Accepts flat or per-query-nested candidate lists; nested
        input is flattened with key dedup (reference
        rank/sparse_embed.py:132-166 — each distinct candidate is
        encoded ONCE even when it appears for several queries, J4)."""
        if documents and isinstance(documents[0], list):
            seen: dict[str, dict] = {}
            for lst in documents:
                for d in lst:
                    seen.setdefault(str(d[self.key]), d)
            documents = list(seen.values())
        self._key_map = {str(d[self.key]): d[self.key] for d in documents}
        return self._encode_both(
            self._texts(documents),
            [d[self.key] for d in documents],
            "doc_id",
        )

    def encode_candidates_documents(
        self, documents: list[dict], candidates: list[list[dict]]
    ) -> tuple[DataFrame, DataFrame]:
        """Map key-only candidates back to document contents, then
        encode the deduped set (reference sparse_embed.py:180-218)."""
        content = {str(d[self.key]): d for d in documents}
        picked: dict[str, dict] = {}
        for lst in candidates:
            for c in lst:
                kv = str(c[self.key])
                if kv in content:
                    picked.setdefault(kv, content[kv])
        return self.encode_documents(list(picked.values()))

    def encode_queries(self, queries: list[str]) -> tuple[DataFrame, DataFrame]:
        self._queries = queries
        return self._encode_both(
            queries, list(range(len(queries))), "query_id"
        )

    def __call__(
        self,
        documents: list[list[dict]],
        queries_embeddings: tuple[DataFrame, DataFrame],
        documents_embeddings: tuple[DataFrame, DataFrame],
        k: int | None = None,
    ) -> list[list[dict]]:
        from neural_cherche_spark.ops.sparse_neural import (
            _topk,
            sparse_embed_scores,
        )

        cand_rows = [
            (qid, str(d[self.key]))
            for qid, cands in enumerate(documents)
            for d in cands
        ]
        if not cand_rows:
            return [[] for _ in documents]
        candidates = self.spark.createDataFrame(
            cand_rows, "query_id long, doc_id string"
        ).dropDuplicates(["query_id", "doc_id"])
        _q_acts, q_embs = queries_embeddings
        _d_acts, d_embs = documents_embeddings
        scored = sparse_embed_scores(candidates, d_embs, q_embs)
        res = _topk(scored, k)
        by_query: dict[int, list] = {}
        for r in sorted(
            res.collect(), key=lambda r: (r["query_id"], r["rank"])
        ):
            by_query.setdefault(int(r["query_id"]), []).append(
                {
                    self.key: self._key_map.get(r["doc_id"], r["doc_id"]),
                    "similarity": float(r["score"]),
                }
            )
        return [by_query.get(qid, []) for qid in range(len(documents))]
