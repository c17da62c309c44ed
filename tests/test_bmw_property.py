"""Property test: the block-max group scorer (with sign-split pruning,
candidate range-skip, and salt subgrouping) must reproduce brute-force
top-k exactly on randomized posting sets.

No Spark — `_bmw_group_fn` is called directly on the pandas frames
applyInPandas would hand it. Weights are dyadic rationals (k/64) and
qtf small ints, so every score is exact in float32 AND float64 and the
comparison is equality, not tolerance: any unsound pruning bound shows
up as a hard mismatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from neural_cherche_spark.index.codec import (
    doc_salt,
    encode_partition_bulk,
)
from neural_cherche_spark.query.bmw import _bmw_group_fn

K = 5


def _build_group(rng, n_docs, n_terms, n_groups):
    """Synthesize one query's salted posting blocks + the brute-force
    per-doc scores. Per-term sign mimics idf (whole run shares it)
    but a few terms get mixed-sign blocks to stress the bounds."""
    all_docs = np.arange(n_docs, dtype=np.int64)
    truth = np.zeros(n_docs, dtype=np.float64)
    frames = []
    for t in range(n_terms):
        s_t = int(rng.choice([1, 2, 4][: int(np.log2(n_groups)) + 1]))
        qtf = float(rng.integers(1, 4))
        df = int(rng.integers(1, n_docs + 1))
        docs_t = np.sort(rng.choice(all_docs, size=df, replace=False))
        sign = rng.choice([-1.0, 1.0])
        w = sign * rng.integers(1, 64, size=df) / 64.0
        if rng.random() < 0.3:  # mixed-sign run (stress, not realism)
            flip = rng.random(df) < 0.2
            w[flip] = -w[flip]
        truth[docs_t] += qtf * w
        salts = doc_salt(docs_t, s_t)
        for j in range(s_t):
            m = salts == j
            if not m.any():
                continue
            enc = encode_partition_bulk(
                np.full(int(m.sum()), t, dtype=np.int64),
                np.full(int(m.sum()), j, dtype=np.int64),
                docs_t[m],
                w[m].astype(np.float32),
                block_size=8,
            )
            frames.append(
                pd.DataFrame(
                    {
                        "term_id": enc["term_id"],
                        "salt": enc["salt"],
                        "n": enc["n"],
                        "qtf": qtf,
                        "max_w": enc["max_w"],
                        "min_w": enc["min_w"],
                        "first_doc": enc["first_doc"],
                        "last_doc": enc["last_doc"],
                        "docs": enc["docs"],
                        "ws": enc["ws"],
                        "n_salts": int(s_t),
                    }
                )
            )
    return pd.concat(frames, ignore_index=True), truth


def _brute_topk(truth, k=K):
    docs = np.flatnonzero(truth > 0)
    order = np.lexsort((docs, -truth[docs]))[:k]
    return [(int(docs[i]), float(truth[docs[i]])) for i in order]


@pytest.mark.parametrize("seed", range(12))
def test_bmw_group_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n_groups = int(rng.choice([1, 2, 4]))
    pdf, truth = _build_group(
        rng, n_docs=int(rng.integers(40, 300)), n_terms=int(rng.integers(1, 9)),
        n_groups=n_groups,
    )
    fn = _bmw_group_fn(K)
    parts = []
    for grp in range(n_groups):
        gpdf = pdf.copy()
        # block → subgroup mapping as search_bmw's explode produces it
        keep, grps = [], []
        for i in range(len(gpdf)):
            s_t = int(gpdf["n_salts"].iloc[i])
            j = int(gpdf["salt"].iloc[i])
            if s_t <= n_groups:
                ok = grp % s_t == j
            else:  # capped mapping (not generated here, but keep exact)
                ok = j % n_groups == grp
            if ok:
                keep.append(i)
                grps.append(grp)
        if not keep:
            continue
        sub = gpdf.iloc[keep].copy()
        sub["query_id"] = 7
        sub["grp"] = grp
        sub["n_groups"] = n_groups
        parts.append(fn(sub))
    got = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
        columns=["query_id", "doc_id", "score"]
    )
    got = got.sort_values(["score", "doc_id"], ascending=[False, True])
    got_topk = [
        (int(r.doc_id), float(r.score)) for r in got.head(K).itertuples()
    ]
    assert got_topk == _brute_topk(truth), f"seed={seed}"


def test_adaptive_chunks_prune_skewed_groups():
    """Microbench-style: on a skewed group (few dominant blocks, long
    prunable tail) the adaptive chunk schedule must terminate after a
    small fraction of blocks, and stay exact (VERDICT r2 #8)."""
    rng = np.random.default_rng(99)
    n_docs = 20_000
    all_docs = np.arange(n_docs, dtype=np.int64)
    truth = np.zeros(n_docs, dtype=np.float64)
    frames = []
    # term 0: rare, high-weight (the query's discriminative term)
    docs_t = np.sort(rng.choice(all_docs, size=64, replace=False))
    w = rng.integers(48, 64, size=64) / 64.0
    truth[docs_t] += 3.0 * w
    enc = encode_partition_bulk(
        np.zeros(64, dtype=np.int64), np.zeros(64, dtype=np.int64),
        docs_t, w.astype(np.float32), block_size=8,
    )
    frames.append(pd.DataFrame({
        "term_id": enc["term_id"], "salt": enc["salt"], "n": enc["n"],
        "qtf": 3.0,
        "max_w": enc["max_w"], "min_w": enc["min_w"],
        "first_doc": enc["first_doc"], "last_doc": enc["last_doc"],
        "docs": enc["docs"], "ws": enc["ws"],
    }))
    # term 1: huge, tiny positive weights (a long prunable tail)
    docs_t = np.sort(rng.choice(all_docs, size=16_000, replace=False))
    w = rng.integers(1, 3, size=16_000) / 64.0
    truth[docs_t] += 1.0 * w
    enc = encode_partition_bulk(
        np.full(16_000, 1, dtype=np.int64), np.zeros(16_000, dtype=np.int64),
        docs_t, w.astype(np.float32), block_size=8,
    )
    frames.append(pd.DataFrame({
        "term_id": enc["term_id"], "salt": enc["salt"], "n": enc["n"],
        "qtf": 1.0,
        "max_w": enc["max_w"], "min_w": enc["min_w"],
        "first_doc": enc["first_doc"], "last_doc": enc["last_doc"],
        "docs": enc["docs"], "ws": enc["ws"],
    }))
    pdf = pd.concat(frames, ignore_index=True)
    pdf["query_id"] = 1
    pdf["grp"] = 0
    pdf["n_groups"] = 1
    n_blocks = len(pdf)

    stats: dict = {}
    got = _bmw_group_fn(K, _stats=stats)(pdf)
    got = got.sort_values(["score", "doc_id"], ascending=[False, True])
    got_topk = [
        (int(r.doc_id), round(float(r.score), 9)) for r in got.head(K).itertuples()
    ]
    want = [(d, round(s, 9)) for d, s in _brute_topk(truth)]
    assert got_topk == want
    # the tail term alone is ~2000 blocks; the schedule must stop early
    assert stats["decoded"] < 0.25 * n_blocks, (stats, n_blocks)
