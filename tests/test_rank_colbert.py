"""rank.ColBERT — reference-shaped two-stage re-ranker
(rank/colbert.py:160-370 semantics) with a deterministic stand-in
encoder, verified against hand-computed MaxSim."""

from __future__ import annotations

import pytest

from neural_cherche_spark.rank import ColBERT


def _enc(texts: list[str]) -> list[list[list[float]]]:
    """One 2-dim token per word: ('a'-count, other-count) — trivially
    hand-computable MaxSim."""
    out = []
    for t in texts:
        toks = []
        for w in t.lower().split():
            na = w.count("a")
            toks.append([float(na), float(len(w) - na)])
        out.append(toks or [[0.0, 0.0]])
    return out


def _maxsim(q, d):
    return sum(
        max(qx * dx + qy * dy for dx, dy in d) for qx, qy in q
    )


def test_rank_colbert_matches_handcomputed(spark):
    docs = [
        {"id": 10, "text": "banana salad"},
        {"id": 20, "text": "kiwi"},
        {"id": 30, "text": "aaa bb"},
    ]
    queries = ["banana", "bb cc"]
    ranker = ColBERT(key="id", on="text", encoder=_enc, spark=spark)
    # stage-1 candidates: doc 10 appears for BOTH queries (dedup J4)
    candidates = [[docs[0], docs[2]], [docs[0], docs[1], docs[2]]]
    flat = [d for lst in candidates for d in lst]
    out = ranker(
        candidates,
        ranker.encode_queries(queries),
        ranker.encode_documents(flat),
        k=2,
    )
    q_mats = _enc(queries)
    d_mats = {d["id"]: _enc([d["text"]])[0] for d in docs}
    for qi, cands in enumerate(candidates):
        want = sorted(
            (
                (-_maxsim(q_mats[qi], d_mats[d["id"]]), d["id"])
                for d in cands
            ),
        )[:2]
        got = [(r["id"], r["similarity"]) for r in out[qi]]
        assert [g[0] for g in got] == [w[1] for w in want]
        for (gid, gscore), (wneg, _) in zip(got, want):
            assert gscore == pytest.approx(-wneg)


def test_rank_colbert_empty_candidates(spark):
    ranker = ColBERT(key="id", on="text", encoder=_enc, spark=spark)
    out = ranker([[], []], ranker.encode_queries(["x", "y"]),
                 ranker.encode_documents([{"id": 1, "text": "z"}]), k=3)
    assert out == [[], []]
