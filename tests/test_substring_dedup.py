"""Exact-substring span dedup (ops/dedup.py substring_span_dedup):
hand-computed goldens for window marking, overlapping-span union
length, first-occurrence retention, and the drop_spans reassembly.
Cross-engine parity at window=50 runs in test_entry_oracle.py."""

from __future__ import annotations

import pytest

from neural_cherche_spark.ops.dedup import substring_span_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _by_id(rows):
    return {r["doc_id"]: r for r in rows}


def test_cross_doc_span_marked_second_only(spark):
    docs = _docs(spark, [(0, "a b c d e"), (1, "x a b c y")])
    out = _by_id(substring_span_dedup(docs, window=3).collect())
    assert out[0]["n_dup_windows"] == 0
    assert out[0]["n_dup_tokens"] == 0
    assert out[0]["n_tokens"] == 5
    # "a b c" first occurs in doc 0 pos 0; doc 1 pos 1 is the dup
    assert out[1]["n_dup_windows"] == 1
    assert out[1]["n_dup_tokens"] == 3
    assert out[1]["dup_frac"] == 0.6


def test_self_repetition_union_of_overlapping_spans(spark):
    # "p q r" repeats with period 3: windows at 3,4,5 are dups of
    # 0,1,2 — their spans [3,5],[4,6],[5,7] union to [3,7] = 5 tokens
    docs = _docs(spark, [(7, "p q r p q r p q")])
    row = substring_span_dedup(docs, window=3).collect()[0]
    assert row["n_tokens"] == 8
    assert row["n_dup_windows"] == 3
    assert row["n_dup_tokens"] == 5
    assert row["dup_frac"] == round(5 / 8, 6)


def test_short_and_empty_docs_zero(spark):
    docs = _docs(spark, [(0, "a b"), (1, "")])
    out = _by_id(substring_span_dedup(docs, window=3).collect())
    assert out[0]["n_tokens"] == 2
    assert out[0]["n_dup_windows"] == 0
    assert out[1]["n_tokens"] == 0
    assert out[1]["dup_frac"] == 0.0


def test_drop_spans_reassembly(spark):
    docs = _docs(spark, [(0, "a b c d e"), (1, "x a b c y")])
    out = _by_id(
        substring_span_dedup(docs, window=3, drop_spans=True).collect()
    )
    assert out[0]["text"] == "a b c d e"  # first occurrence kept intact
    assert out[1]["text"] == "x y"


def test_drop_spans_fully_duplicated_doc_empties(spark):
    docs = _docs(spark, [(0, "a b c d"), (1, "a b c d")])
    out = _by_id(
        substring_span_dedup(docs, window=4, drop_spans=True).collect()
    )
    assert out[0]["text"] == "a b c d"
    assert out[1]["text"] == ""
    assert out[1]["n_dup_tokens"] == 4


def test_drop_spans_preserves_original_case(spark):
    # lowercasing is part of the dedup KEY only: "A b C" and "a B c"
    # are duplicates, but each doc's surviving text keeps its own case
    docs = _docs(spark, [(0, "A b C d e"), (1, "x a B c Y")])
    out = _by_id(
        substring_span_dedup(docs, window=3, drop_spans=True).collect()
    )
    assert out[0]["text"] == "A b C d e"
    assert out[1]["text"] == "x Y"
    assert out[1]["n_dup_tokens"] == 3


def test_window_lower_bound_raises(spark):
    with pytest.raises(ValueError):
        substring_span_dedup(_docs(spark, [(0, "a b")]), window=1)
