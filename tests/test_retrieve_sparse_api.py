"""Reference-shaped Splade / SparseEmbed retriever classes
(retrieve.py): encode_documents → add → encode_queries → __call__ with
a deterministic stand-in encoder (the torch model slot, reference
retrieve/splade.py:80-140 / sparse_embed.py:84-150)."""

from __future__ import annotations

import pytest

from neural_cherche_spark.retrieve import SparseEmbed, Splade


def _acts(texts: list[str]) -> list[dict[int, float]]:
    """Deterministic featurizer: word → term_id by char-sum mod 97."""
    out = []
    for t in texts:
        a: dict[int, float] = {}
        for w in t.lower().split():
            tid = sum(ord(c) for c in w) % 97
            a[tid] = a.get(tid, 0.0) + 1.0
        out.append(a)
    return out


def _acts_embs(texts: list[str]):
    res = []
    for a in _acts(texts):
        embs = {t: [float((t * i) % 5 + 1) for i in range(1, 5)] for t in a}
        res.append((a, embs))
    return res


# NOTE: the toy featurizer has real collisions mod 97 ("split" and
# "cherry" both map to term 71) — doc 3 repeats "cherry" so it
# outscores the collision instead of tying on it.
DOCS = [
    {"id": 1, "title": "apple pie", "body": "apple apple"},
    {"id": 2, "title": "banana split", "body": "banana"},
    {"id": 3, "title": "cherry tart", "body": "cherry cherry"},
]


def test_splade_retriever_end_to_end(spark):
    r = Splade(key="id", on=["title", "body"], encoder=_acts, spark=spark)
    r.add(r.encode_documents(DOCS[:2]))
    r.add(r.encode_documents(DOCS[2:]))  # incremental add (U2)
    q = r.encode_queries(["apple", "cherry", "apple"])  # dup re-expansion
    out = r(q, k=2)
    assert len(out) == 3
    assert out[0][0]["id"] == 1 and out[0][0]["similarity"] > 0
    assert out[1][0]["id"] == 3
    assert out[2] == out[0]  # duplicate query gets identical results
    assert isinstance(out[0][0]["id"], int)  # original key type restored


def test_sparse_embed_retriever_end_to_end(spark):
    r = SparseEmbed(
        key="id", on=["title", "body"], encoder=_acts_embs, spark=spark,
        candidates_k=None,
    )
    r.add(r.encode_documents(DOCS))
    out = r(r.encode_queries(["banana split"]), k=3)
    assert out[0][0]["id"] == 2
    # token-intersection scoring: the score is Σ over common activated
    # ids of dot(q_emb, d_emb) — both sides use the same featurizer, so
    # the expected value is computable in plain python
    a, embs = _acts_embs(["banana split"])[0]
    want = sum(
        sum(x * y for x, y in zip(embs[t], embs[t])) for t in a
    )
    assert out[0][0]["similarity"] == pytest.approx(want)


def test_splade_empty_result_for_unseen_vocabulary(spark):
    r = Splade(key="id", on="title", encoder=_acts, spark=spark)
    r.add(r.encode_documents(DOCS[:1]))
    # craft a query word whose term id differs from every doc term id
    doc_tids = set(_acts(["apple pie apple apple"])[0])
    probe = None
    for probe_word in ("zz", "zzz", "zzzz", "qq", "xy"):
        if not (set(_acts([probe_word])[0]) & doc_tids):
            probe = probe_word
            break
    assert probe is not None
    out = r(r.encode_queries([probe]), k=5)
    assert out == [[]]
