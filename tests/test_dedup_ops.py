"""Dedup operator unit tests (edge cases the sf-corpus oracle can't
exercise: short docs, exact duplicates, near-duplicates)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neural_cherche_spark.ops.dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)


def test_short_docs_emit_no_shingles(spark):
    docs = spark.createDataFrame(
        [(0, ""), (1, "one"), (2, "one two"), (3, "one two three")],
        "doc_id long, text string",
    )
    sh = word_shingles(docs, n=3).collect()
    assert {r["doc_id"] for r in sh} == {3}
    assert sh[0]["shingle"] == "one two three"


def test_exact_duplicates_found(spark):
    docs = spark.createDataFrame(
        [(0, "same text"), (1, "same text"), (2, "other"), (3, "same text")],
        "doc_id long, text string",
    )
    rows = exact_duplicates(docs).collect()
    assert len(rows) == 1
    assert rows[0]["n_dups"] == 3
    assert rows[0]["canonical_id"] == 0


def test_minhash_lsh_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words in this sentence about spark engines"
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string"
    )
    sh = word_shingles(docs, n=3)
    pairs = lsh_candidate_pairs(minhash_signatures(sh, 16), bands=8, num_hashes=16)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_jaccard_identical_is_one(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e f"), (2, "x y z w v u")],
        "doc_id long, text string",
    )
    rows = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
            ngram_jaccard_pairs(docs, n=3).collect()}
    assert rows[(0, 1)] == 1.0
    assert (0, 2) not in rows


def test_simhash_near_duplicates_close(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base + "extra"
    far = "totally unrelated content about databases and columnar formats " * 5
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string"
    )
    h = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(h[0], h[1]) < ham(h[0], h[2])
    assert ham(h[0], h[1]) <= 4
