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


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # term
            st.integers(min_value=0, max_value=2),   # salt
        ),
        min_size=1,
        max_size=400,
    ),
    st.integers(min_value=1, max_value=32),
)
@settings(max_examples=100, deadline=None)
def test_bulk_matches_per_run_encoding(keys, block_size):
    """encode_partition_bulk must produce byte-identical blocks to the
    per-run encode_blocks reference."""
    from neural_cherche_spark.index.codec import encode_partition_bulk

    # build sorted runs with strictly-ascending doc ids per run
    rows = []
    seen: dict[tuple, int] = {}
    rng = np.random.default_rng(1)
    for t, s in sorted(keys):
        nxt = seen.get((t, s), 0) + int(rng.integers(1, 50))
        seen[(t, s)] = nxt
        rows.append((t, s, nxt, float(rng.random())))
    tid = np.array([r[0] for r in rows], dtype=np.int64)
    salt = np.array([r[1] for r in rows], dtype=np.int64)
    docs = np.array([r[2] for r in rows], dtype=np.int64)
    ws = np.array([r[3] for r in rows], dtype=np.float32)

    bulk = encode_partition_bulk(tid, salt, docs, ws, block_size)

    expected = []
    i = 0
    while i < len(rows):
        j = i
        while j < len(rows) and (tid[j], salt[j]) == (tid[i], salt[i]):
            j += 1
        for bi, n, first, last, max_w, dbin, wbin in encode_blocks(
            docs[i:j], ws[i:j], block_size
        ):
            expected.append(
                (int(tid[i]), int(salt[i]), bi, n, first, last, dbin, wbin)
            )
        i = j

    got = list(
        zip(
            bulk["term_id"].tolist(),
            bulk["salt"].tolist(),
            bulk["block_id"].tolist(),
            bulk["n"].tolist(),
            bulk["first_doc"].tolist(),
            bulk["last_doc"].tolist(),
            bulk["docs"],
            bulk["ws"],
        )
    )
    assert got == expected


def test_compression_is_compact():
    # dense ids (gap 1) must take ~1 byte each
    doc_ids = np.arange(10_000, dtype=np.int64)
    ws = np.ones(doc_ids.size, dtype=np.float32)
    rows = encode_blocks(doc_ids, ws, 128)
    total_doc_bytes = sum(len(r[5]) for r in rows)
    assert total_doc_bytes < 1.1 * doc_ids.size
