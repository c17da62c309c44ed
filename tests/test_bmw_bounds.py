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
from neural_cherche_spark.query.bmw import (
    _run_suffix_bounds,
    _run_suffix_bounds_signed,
)


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


def _brute_signed(run_key, ub_pos, neg):
    n = run_key.size
    pb, nb = np.zeros(n + 1), np.zeros(n + 1)
    for i in range(n):
        best: dict[int, float] = {}
        worst: dict[int, float] = {}
        for j in range(i, n):
            best[run_key[j]] = max(best.get(run_key[j], 0.0), ub_pos[j])
            worst[run_key[j]] = min(worst.get(run_key[j], 0.0), neg[j])
        pb[i] = sum(best.values())
        nb[i] = sum(worst.values())
    return pb, nb


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_signed_suffix_bounds_match_bruteforce(seed):
    rng = np.random.RandomState(seed)
    n = rng.randint(1, 50)
    run_key = rng.randint(0, 6, size=n).astype(np.int64)
    raw = rng.randn(n)  # mixed-sign block bounds
    ub_pos = np.maximum(raw, 0.0)
    neg = np.minimum(rng.randn(n), 0.0)
    order = np.argsort(-ub_pos, kind="mergesort")
    rk, u, v = run_key[order], ub_pos[order], neg[order]
    gp, gn = _run_suffix_bounds_signed(rk, u, v)
    wp, wn = _brute_signed(rk, u, v)
    np.testing.assert_allclose(gp, wp, rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(gn, wn, rtol=1e-12, atol=1e-9)
    # signed pos bound must agree with the vectorized all-positive one
    np.testing.assert_allclose(
        gp, _run_suffix_bounds(rk, u), rtol=1e-12, atol=1e-9
    )


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
