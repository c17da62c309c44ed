"""Property tests for the posting-list codec (no Spark needed)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from neural_cherche_spark.index.codec import (
    decode_block,
    encode_blocks,
    varint_decode,
    varint_encode,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == vals


@given(
    st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=500),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(doc_set, block_size):
    doc_ids = np.array(sorted(doc_set), dtype=np.int64)
    rng = np.random.default_rng(0)
    ws = rng.random(doc_ids.size).astype(np.float32)
    rows = encode_blocks(doc_ids, ws, block_size)
    got_d, got_w = [], []
    for bi, n, first, last, max_w, docs, wbytes in rows:
        d, w = decode_block(docs, wbytes)
        assert d.size == n == w.size
        assert d[0] == first and d[-1] == last
        assert np.isclose(max_w, w.max())
        got_d.append(d)
        got_w.append(w)
    np.testing.assert_array_equal(np.concatenate(got_d), doc_ids)
    np.testing.assert_array_equal(np.concatenate(got_w), ws)


def test_compression_is_compact():
    # dense ids (gap 1) must take ~1 byte each
    doc_ids = np.arange(10_000, dtype=np.int64)
    ws = np.ones(doc_ids.size, dtype=np.float32)
    rows = encode_blocks(doc_ids, ws, 128)
    total_doc_bytes = sum(len(r[5]) for r in rows)
    assert total_doc_bytes < 1.1 * doc_ids.size
