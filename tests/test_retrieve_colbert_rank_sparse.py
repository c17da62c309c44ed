"""retrieve.ColBERT (full-corpus MaxSim retrieval, reference
retrieve/colbert.py:9) and rank.SparseEmbed (candidate re-scoring,
reference rank/sparse_embed.py:10) — verified against hand-computed
scores with deterministic stand-in encoders."""

from __future__ import annotations

import pytest

from neural_cherche_spark.rank import SparseEmbed as SparseEmbedRanker
from neural_cherche_spark.retrieve import ColBERT as ColBERTRetriever


def _tok_enc(texts: list[str]) -> list[list[list[float]]]:
    """One 2-dim token per word: ('a'-count, other-count)."""
    out = []
    for t in texts:
        toks = []
        for w in t.lower().split():
            na = w.count("a")
            toks.append([float(na), float(len(w) - na)])
        out.append(toks or [[0.0, 0.0]])
    return out


def _maxsim(q, d):
    return sum(max(qx * dx + qy * dy for dx, dy in d) for qx, qy in q)


def test_retrieve_colbert_scores_full_corpus(spark):
    docs_b1 = [
        {"id": 10, "text": "banana salad"},
        {"id": 20, "text": "kiwi"},
    ]
    docs_b2 = [
        {"id": 20, "text": "SHOULD BE IGNORED"},  # duplicate key: skipped
        {"id": 30, "text": "aaa bb"},
    ]
    queries = ["banana", "bb cc"]

    r = ColBERTRetriever(key="id", on="text", encoder=_tok_enc, spark=spark)
    r.add(r.encode_documents(docs_b1))
    r.add(r.encode_documents(docs_b2))
    out = r(r.encode_queries(queries), k=2)

    q_mats = _tok_enc(queries)
    corpus = {10: "banana salad", 20: "kiwi", 30: "aaa bb"}
    d_mats = {i: _tok_enc([t])[0] for i, t in corpus.items()}
    assert len(out) == 2
    for qi in range(2):
        want = sorted(
            ((-_maxsim(q_mats[qi], m), i) for i, m in d_mats.items())
        )[:2]
        got = [(h["id"], h["similarity"]) for h in out[qi]]
        assert [g[0] for g in got] == [w[1] for w in want]
        for (_, gs), (wneg, _) in zip(got, want):
            assert gs == pytest.approx(-wneg)


def test_retrieve_colbert_k_none_ranks_all(spark):
    r = ColBERTRetriever(key="id", on="text", encoder=_tok_enc, spark=spark)
    r.add(r.encode_documents([{"id": i, "text": f"doc {'a' * i}"} for i in range(4)]))
    out = r(r.encode_queries(["aa"]), k=None)
    assert len(out) == 1 and len(out[0]) == 4


def _se_enc(texts: list[str]):
    """Deterministic SparseEmbed stand-in: token id = word length,
    activation = word count of that length, token embedding =
    [length, count] — hand-computable intersection dots."""
    out = []
    for t in texts:
        counts: dict[int, int] = {}
        for w in t.lower().split():
            counts[len(w)] = counts.get(len(w), 0) + 1
        acts = {t_: float(c) for t_, c in counts.items()}
        embs = {t_: [float(t_), float(c)] for t_, c in counts.items()}
        out.append((acts, embs))
    return out


def test_rank_sparse_embed_matches_handcomputed(spark):
    docs = [
        {"id": 1, "text": "aa bb ccc"},   # tokens {2: 2, 3: 1}
        {"id": 2, "text": "dddd"},        # tokens {4: 1} — no overlap w/ "xx"
        {"id": 3, "text": "xy zw v"},     # tokens {2: 2, 1: 1}
    ]
    queries = ["xx", "eeee ffff"]         # {2: 1} and {4: 2}
    ranker = SparseEmbedRanker(key="id", on="text", encoder=_se_enc, spark=spark)
    d_embs = ranker.encode_documents([docs, docs])  # nested: dedup
    q_embs = ranker.encode_queries(queries)
    out = ranker([docs, docs], q_embs, d_embs, k=3)

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1]

    enc = {d["id"]: _se_enc([d["text"]])[0][1] for d in docs}
    q_enc = [_se_enc([q])[0][1] for q in queries]
    for qi in range(2):
        want = {}
        for d in docs:
            inter = set(q_enc[qi]) & set(enc[d["id"]])
            want[d["id"]] = sum(
                dot(q_enc[qi][t], enc[d["id"]][t]) for t in inter
            )
        got = {h["id"]: h["similarity"] for h in out[qi]}
        # every candidate present — including empty-intersection → 0.0
        assert set(got) == set(want)
        for i in want:
            assert got[i] == pytest.approx(want[i])
        # ranked descending
        sims = [h["similarity"] for h in out[qi]]
        assert sims == sorted(sims, reverse=True)


def test_rank_sparse_embed_empty_candidates(spark):
    ranker = SparseEmbedRanker(key="id", on="text", encoder=_se_enc, spark=spark)
    d_embs = ranker.encode_documents([{"id": 1, "text": "aa"}])
    q_embs = ranker.encode_queries(["bb", "cc"])
    assert ranker([[], []], q_embs, d_embs, k=2) == [[], []]
