"""Unit tests for the block-max pruning bound and salt plumbing.

The round-1 bound summed ub over ALL remaining blocks; the correct
unseen-doc bound is Σ over distinct remaining (term,salt) runs of the
max remaining block ub (a doc occurs at most once per run). Brute
force here is the spec; the vectorized `_run_suffix_bounds` must match
it exactly, and must never exceed the loose sum (tightness).
"""

from __future__ import annotations

import numpy as np
import pytest

from neural_cherche_spark.index.codec import doc_salt
from neural_cherche_spark.query.bmw import _run_suffix_bounds


def _brute(run_key: np.ndarray, ub: np.ndarray) -> np.ndarray:
    n = run_key.size
    out = np.zeros(n + 1)
    for i in range(n):
        best: dict[int, float] = {}
        for j in range(i, n):
            best[run_key[j]] = max(best.get(run_key[j], 0.0), ub[j])
        out[i] = sum(best.values())
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_suffix_bounds_match_bruteforce(seed):
    rng = np.random.RandomState(seed)
    n = rng.randint(1, 60)
    run_key = rng.randint(0, 8, size=n).astype(np.int64)
    ub = rng.rand(n)
    # processing order is descending ub (as in _bmw_group_fn)
    order = np.argsort(-ub, kind="mergesort")
    rk, u = run_key[order], ub[order]
    got = _run_suffix_bounds(rk, u)
    want = _brute(rk, u)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # tight: never exceeds the loose all-blocks sum; equal only when
    # every remaining block is its run's max
    loose = np.concatenate([np.cumsum(u[::-1])[::-1], [0.0]])
    assert (got <= loose + 1e-12).all()


def test_suffix_bounds_tighter_when_runs_have_many_blocks():
    # one run, 10 blocks: unseen-doc bound is the single max, not the sum
    ub = np.linspace(1.0, 0.1, 10)
    rk = np.zeros(10, dtype=np.int64)
    got = _run_suffix_bounds(rk, ub)
    assert got[0] == pytest.approx(1.0)
    assert got[5] == pytest.approx(ub[5])


def test_suffix_bounds_empty():
    got = _run_suffix_bounds(np.empty(0, dtype=np.int64), np.empty(0))
    assert got.shape == (1,) and got[0] == 0.0


def test_doc_salt_partitions_completely():
    d = np.arange(10_000, dtype=np.int64)
    for s in (1, 2, 8, 64):
        g = doc_salt(d, s)
        assert g.min() >= 0 and g.max() < s
        # near-uniform on dense ids
        counts = np.bincount(g, minlength=s)
        assert counts.min() > 0.5 * counts.mean()
    # power-of-two consistency: residue mod s is derivable from the
    # residue mod S for s | S — the property the subgroup split relies on
    S, s = 64, 8
    np.testing.assert_array_equal(doc_salt(d, S) % s, doc_salt(d, s))
