"""Raw-storage index (per-posting tf+dl, query-time weights): every
query mode must be rank-identical to the exact double-precision
DataFrame path — and score-identical to ~f64 rounding, since raw mode
never stores f32 weights."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_cherche_spark.data import synth_queries, synth_webtext
from neural_cherche_spark.index import bm25_weights
from neural_cherche_spark.index.builder import build_index
from neural_cherche_spark.query import retrieve_exact
from tests.conftest import assert_rank_identical


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth_webtext(spark, 400, seed=5).select("url", "text")
    rows = sorted(docs.collect(), key=lambda r: r["url"])
    pdocs = [(i, r["url"], r["text"]) for i, r in enumerate(rows)]
    return spark.createDataFrame(pdocs, "doc_id long, url string, text string")


@pytest.fixture(scope="module")
def raw_index(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx") / "raw")
    return build_index(
        spark, corpus, d, id_col="doc_id", n_buckets=8, salt_every=50,
        storage="raw",
    )


@pytest.fixture(scope="module")
def queries(spark):
    return synth_queries(spark, 12, seed=9)


@pytest.fixture(scope="module")
def exact_topk(spark, corpus, queries):
    w = bm25_weights(corpus, id_col="doc_id")
    rows = retrieve_exact(w, queries, k=10).collect()
    out: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    return out


def _collect_topk(df):
    out: dict[int, list] = {}
    for r in sorted(df.collect(), key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    return out


@pytest.mark.parametrize("mode", ["distributed", "bmw", "auto"])
def test_raw_search_matches_exact_f64(raw_index, queries, exact_topk, mode):
    got = _collect_topk(raw_index.search(queries, k=10, mode=mode))
    assert set(got) == set(exact_topk)
    for qid in exact_topk:
        # both sides are f64 end-to-end; only agg-order ulps remain
        assert_rank_identical(got[qid], exact_topk[qid], rtol=1e-9)


def test_raw_layout_is_segmented_and_salted(raw_index):
    p = raw_index.postings
    assert "seg" in p.columns and "n_salts" in p.columns
    assert p.select("seg").distinct().count() == 1
    assert p.filter(F.col("salt") > 0).count() > 0, "head terms unsalted"
    assert raw_index.storage == "raw"
    assert raw_index.manifest.segments == [
        {"seg": 0, "n_postings": raw_index.manifest.n_postings}
    ]


def test_raw_subgroup_cap_stays_exact(raw_index, queries, exact_topk):
    from neural_cherche_spark.query.bmw import search_bmw

    got = _collect_topk(search_bmw(raw_index, queries, k=10, subgroup_cap=2))
    assert set(got) == set(exact_topk)
    for qid in exact_topk:
        assert_rank_identical(got[qid], exact_topk[qid], rtol=1e-9)


def test_raw_serving_path_matches_exact(spark, raw_index, queries, exact_topk):
    """The driver-side serving path over a raw index computes the same
    query-time weights (s_t carried in the serving map)."""
    qtexts = [
        r["query"]
        for r in sorted(queries.collect(), key=lambda r: r["query_id"])
    ]
    raw_index.prepare_serving()
    got = _collect_topk(raw_index.search_serving(qtexts, k=10, mode="bmw"))
    assert set(got) == set(exact_topk)
    for qid in exact_topk:
        assert_rank_identical(got[qid], exact_topk[qid], rtol=1e-9)
    raw_index._serving = None


def test_raw_auto_mixed_routing_matches_exact(raw_index, queries, exact_topk):
    """search_auto with a threshold that splits the batch into heavy AND
    selective sides must stay exact on a raw index: the side() carve-out
    has to carry idf/term_norm through to the raw query-time weights
    (round-3 ADVICE high: KeyError('idf') when both sides fired)."""
    from neural_cherche_spark.query.bmw import _matched_terms, search_auto

    rows = _matched_terms(raw_index, queries)
    vol: dict[int, int] = {}
    for r in rows:
        for q in r["qs"]:
            qid = int(q["query_id"])
            vol[qid] = vol.get(qid, 0) + int(r["df"])
    vols = sorted(vol.values())
    thr = vols[len(vols) // 2]  # median ⇒ both sides non-empty
    heavy = {q for q, v in vol.items() if v > thr}
    assert heavy and len(heavy) < len(vol), "fixture must mix-route"

    got = _collect_topk(
        search_auto(raw_index, queries, k=10, heavy_postings_threshold=thr)
    )
    assert set(got) == set(exact_topk)
    for qid in exact_topk:
        assert_rank_identical(got[qid], exact_topk[qid], rtol=1e-9)


def test_prepare_serving_vocab_filtered(raw_index, queries, exact_topk):
    """VERDICT r4 #6: query-vocabulary-filtered prepare. The serving
    map is bounded by the WORKLOAD's gram set (driver memory stays
    capped when the termdict outgrows it at 10^7+ terms), results are
    identical to the full prepare, and a query gram outside the
    prepared workload raises instead of silently dropping a term whose
    vocabulary membership was never checked."""
    from neural_cherche_spark.text.ngrams import char_wb_ngrams

    qtexts = [
        r["query"]
        for r in sorted(queries.collect(), key=lambda r: r["query_id"])
    ]
    cfg = raw_index.manifest.cfg
    grams = {
        g
        for q in qtexts
        for g in char_wb_ngrams(q, int(cfg["n_min"]), int(cfg["n_max"]))
    }
    full_vocab = raw_index.termdict.count()
    raw_index.prepare_serving(queries=qtexts)
    try:
        # capped memory: ≤ the workload's grams, not the corpus vocab
        assert len(raw_index._serving) <= len(grams) < full_vocab
        got = _collect_topk(
            raw_index.search_serving(qtexts, k=10, mode="bmw")
        )
        assert set(got) == set(exact_topk)
        for qid in exact_topk:
            assert_rank_identical(got[qid], exact_topk[qid], rtol=1e-9)
        with pytest.raises(ValueError, match="not in the"):
            raw_index.search_serving(["zzzql zzzqm"], k=5)
    finally:
        raw_index._serving = None
        raw_index._serving_prepared = None
