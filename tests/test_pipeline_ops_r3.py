"""Round-3 webtext-pipeline operators on hand-computed fixtures:
Gopher repetition rules, PII scrubbing, shingle novelty."""

from __future__ import annotations

import pytest

from neural_cherche_spark.ops.dedup import shingle_novelty
from neural_cherche_spark.text.analysis import pii_scrub, repetition_metrics


def test_repetition_metrics_handcomputed(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # fully repeated
            (2, "one two three four"),           # fully novel
            (3, "a b a b"),                      # dup words, dup 2-grams
            (4, ""),                             # empty
            (5, "solo"),                         # single word, no 2-grams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    assert got[1]["n_words"] == 4
    assert got[1]["dup_word_frac"] == pytest.approx(0.75)   # 1 distinct / 4
    assert got[1]["dup_2gram_frac"] == pytest.approx(2 / 3) # 1 distinct / 3
    assert got[1]["top_word_frac"] == pytest.approx(1.0)
    assert got[1]["repetition_ok"] == 0
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["dup_2gram_frac"] == 0.0
    assert got[2]["top_word_frac"] == pytest.approx(0.25)
    # 0.25 > 0.2 top-word threshold → short novel docs still flagged
    assert got[2]["repetition_ok"] == 0
    # doc 3: words a,b,a,b → dup_word 0.5; grams [ab, ba, ab] → 1/3 dup
    assert got[3]["dup_word_frac"] == pytest.approx(0.5)
    assert got[3]["dup_2gram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[4]["n_words"] == 0 and got[4]["dup_word_frac"] == 0.0
    assert got[5]["dup_2gram_frac"] == 0.0


def test_pii_scrub_handcomputed(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@sub.example.org or call 555-0100-123 ok"),
            (2, "no pii here"),
            (3, "two mails a@b.io c@d.net and digits 12 34"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert got[1]["n_emails"] == 1 and got[1]["n_phones"] == 1
    assert got[1]["clean_text"] == "mail me at <EMAIL> or call <PHONE> ok"
    assert got[2]["n_emails"] == 0 and got[2]["n_phones"] == 0
    assert got[2]["clean_text"] == "no pii here"
    # short digit runs (under 9 chars total) are NOT phone-shaped
    assert got[3]["n_emails"] == 2 and got[3]["n_phones"] == 0
    assert got[3]["clean_text"] == "two mails <EMAIL> <EMAIL> and digits 12 34"


def test_shingle_novelty_handcomputed(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),   # shares all shingles with 2
            (2, "the cat sat on the mat"),
            (3, "a completely different doc entirely"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in shingle_novelty(docs, n=3).collect()}
    # docs 1/2: 4 distinct 3-shingles each, all shared → novelty 0
    assert got[1]["n_shingles"] == 4
    assert got[1]["shared_frac"] == 1.0 and got[1]["novelty"] == 0.0
    assert got[2]["shared_frac"] == 1.0
    # doc 3: 3 shingles, none shared → novelty 1
    assert got[3]["n_shingles"] == 3
    assert got[3]["shared_frac"] == 0.0 and got[3]["novelty"] == 1.0


def test_repetition_metrics_large_doc_bounded(spark):
    """A ~50k-word mostly-distinct document must complete fast: the
    top-word count is a sort + run-length aggregate (O(n log n)), not
    the O(distinct·n) transform/filter product that would straggle at
    100 TB tails (round-3 VERDICT "what's wrong" #1)."""
    import time

    words = [f"w{i}" for i in range(49_000)] + ["common"] * 1_000
    text = " ".join(words)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    t0 = time.perf_counter()
    row = repetition_metrics(docs).collect()[0]
    wall = time.perf_counter() - t0
    assert row["n_words"] == 50_000
    assert abs(row["top_word_frac"] - 1_000 / 50_000) < 1e-9
    assert abs(row["dup_word_frac"] - 999 / 50_000) < 1e-9
    # O(distinct·n) here is ~2.5e9 comparisons in one row (minutes);
    # the run-length plan does this in well under the bound
    assert wall < 30, f"top_word_frac scan took {wall:.1f}s — quadratic?"


def test_line_dedup_handcomputed(spark):
    from neural_cherche_spark.ops.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (0, "alpha beta\ncookie banner\ngamma"),
            (1, "cookie banner\ndelta"),       # banner dup -> dropped
            (2, "epsilon\ncookie banner\nalpha beta"),  # both dups drop
            (3, ""),                            # empty doc: 1 empty line
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert got[0]["text"] == "alpha beta\ncookie banner\ngamma"
    assert (got[0]["n_lines"], got[0]["n_kept"]) == (3, 3)
    assert got[1]["text"] == "delta"
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (2, 1)
    assert got[2]["text"] == "epsilon"
    assert (got[2]["n_lines"], got[2]["n_kept"]) == (3, 1)
    # empty line is below min_len: kept verbatim, never deduped
    assert got[3]["text"] == ""
    assert (got[3]["n_lines"], got[3]["n_kept"]) == (1, 1)


def test_cross_contamination_handcomputed(spark):
    from neural_cherche_spark.ops.dedup import cross_contamination

    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "entirely different words here altogether now"),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(0, "quick brown fox jumps"), (1, "lazy dog sleeps")],
        "probe_id long, text string",
    )
    got = {
        (r["doc_id"], r["probe_id"]): r["n_shared"]
        for r in cross_contamination(corpus, probes, n=3).collect()
    }
    # probe 0 shares 'quick brown fox' + 'brown fox jumps' with doc 10
    assert got == {(10, 0): 2}


def test_dedup_clusters_handcomputed(spark):
    """Chain 1-2-3-4 needs multi-round propagation (diameter 3);
    5-6 is a separate pair; 0 is a singleton."""
    from neural_cherche_spark.ops.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(i,) for i in range(7)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}
