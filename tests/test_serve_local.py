"""LocalSearcher (serve.py): the Spark-free serving tier must return
EXACTLY what the cluster serving path returns — same docs, same
scores, same tie-breaks — because it feeds the same scorer the same
columns from a pyarrow read of the same artifact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_cherche_spark.data import synth_queries, synth_webtext
from neural_cherche_spark.index.builder import build_index
from neural_cherche_spark.serve import LocalSearcher


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth_webtext(spark, 400, seed=7).select("url", "text")
    rows = sorted(docs.collect(), key=lambda r: r["url"])
    pdocs = [(i, r["url"], r["text"]) for i, r in enumerate(rows)]
    return spark.createDataFrame(pdocs, "doc_id long, url string, text string")


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("srv") / "bm25")
    # tiny salt_every so head grams are salted and the subgroup
    # machinery actually engages in the local scorer
    return build_index(
        spark, corpus, d, id_col="doc_id", n_buckets=8, salt_every=50
    )


@pytest.fixture(scope="module")
def qtexts(spark):
    return [r["query"] for r in synth_queries(spark, 10, seed=3).collect()]


def test_local_matches_search_serving(index, qtexts):
    index.prepare_serving()
    srv = LocalSearcher.from_index(index)
    k = 10
    spark_rows = index.search_serving(qtexts, k=k).collect()
    expected: dict[int, list] = {}
    for r in sorted(spark_rows, key=lambda r: (r["query_id"], r["rank"])):
        expected.setdefault(int(r["query_id"]), []).append(
            (int(r["doc_id"]), r["score"], int(r["rank"]))
        )
    local = srv.search(qtexts, k=k)
    for qid, res in enumerate(local):
        got = [(d["doc_id"], d["score"], d["rank"]) for d in res]
        exp = expected.get(qid, [])
        assert [g[0] for g in got] == [e[0] for e in exp], f"q{qid} docs"
        assert [g[2] for g in got] == [e[2] for e in exp], f"q{qid} ranks"
        for g, e in zip(got, exp):
            assert g[1] == pytest.approx(e[1], rel=1e-12), f"q{qid} scores"


def test_single_string_query(index, qtexts):
    srv = LocalSearcher.from_index(index)
    res = srv.search(qtexts[0], k=5)
    assert isinstance(res, list)
    assert all(isinstance(d, dict) for d in res)
    assert [d["rank"] for d in res] == list(range(1, len(res) + 1))


def test_unknown_vocab_query_empty(index):
    srv = LocalSearcher.from_index(index)
    assert srv.search("zzzzqqqq", k=5) == []


def test_raw_storage_parity(spark, corpus, qtexts, tmp_path_factory):
    """Raw-storage bm25: query-time weights computed in-process must
    match the cluster serving path exactly."""
    d = str(tmp_path_factory.mktemp("srvraw") / "raw")
    idx = build_index(
        spark, corpus, d, id_col="doc_id", n_buckets=8, salt_every=50,
        storage="raw",
    )
    idx.prepare_serving()
    srv = LocalSearcher.from_index(idx)
    k = 10
    expected: dict[int, list] = {}
    for r in sorted(
        idx.search_serving(qtexts, k=k).collect(),
        key=lambda r: (r["query_id"], r["rank"]),
    ):
        expected.setdefault(int(r["query_id"]), []).append(
            (int(r["doc_id"]), r["score"])
        )
    local = srv.search(qtexts, k=k)
    for qid, res in enumerate(local):
        got = [(d["doc_id"], d["score"]) for d in res]
        exp = expected.get(qid, [])
        assert [g[0] for g in got] == [e[0] for e in exp], f"q{qid}"
        for g, e in zip(got, exp):
            assert g[1] == pytest.approx(e[1], rel=1e-9)


def test_tombstoned_raw_parity(spark, corpus, qtexts, tmp_path):
    """Deletes: the in-process tombmask read must hide deleted docs
    exactly as the cluster path does."""
    from neural_cherche_spark.streaming import CompressedIndexStream

    deleted = [i for i in range(400) if i % 5 == 2]
    stream = CompressedIndexStream(spark, str(tmp_path / "state"))
    idx_dir = str(tmp_path / "idx")
    stream.add_batch(corpus, epoch_id=0)
    stream.materialize(idx_dir, n_buckets=8, salt_every=50, storage="raw")
    stream.delete_batch(deleted, epoch_id=1)
    idx = stream.materialize(
        idx_dir, n_buckets=8, salt_every=50, storage="raw"
    )
    assert idx.manifest.tombstones_path != ""
    idx.prepare_serving()
    srv = LocalSearcher.from_index(idx)
    k = 10
    expected: dict[int, list] = {}
    for r in sorted(
        idx.search_serving(qtexts, k=k).collect(),
        key=lambda r: (r["query_id"], r["rank"]),
    ):
        expected.setdefault(int(r["query_id"]), []).append(
            (int(r["doc_id"]), r["score"])
        )
    local = srv.search(qtexts, k=k)
    dset = set(deleted)
    for qid, res in enumerate(local):
        got = [(d["doc_id"], d["score"]) for d in res]
        assert not any(g[0] in dset for g in got)
        exp = expected.get(qid, [])
        assert [g[0] for g in got] == [e[0] for e in exp], f"q{qid}"
        for g, e in zip(got, exp):
            assert g[1] == pytest.approx(e[1], rel=1e-9)


def test_no_spark_jobs_during_search(index, qtexts, spark):
    """The whole point: after construction, a search must run ZERO
    Spark jobs (tracked via the status API's job counter)."""
    index.prepare_serving()
    srv = LocalSearcher.from_index(index)
    srv.search(qtexts[0], k=5)  # warm any lazy pyarrow state
    tracker = spark.sparkContext.statusTracker()
    jobs_before = set(tracker.getJobIdsForGroup())
    for q in qtexts:
        srv.search(q, k=5)
    jobs_after = set(spark.sparkContext.statusTracker().getJobIdsForGroup())
    assert jobs_after == jobs_before


def test_hot_term_cache(index, qtexts):
    srv = LocalSearcher.from_index(index)
    first = srv.search(qtexts[0], k=5)
    misses_after_first = srv.cache_misses
    assert misses_after_first >= 1
    again = srv.search(qtexts[0], k=5)
    assert srv.cache_misses == misses_after_first  # fully cached
    assert again == first
    # a different query with disjoint grams scans again
    srv.search(qtexts[1], k=5)
    assert srv.cache_misses >= misses_after_first


def test_cache_disabled_and_eviction(index, qtexts):
    srv0 = LocalSearcher.from_index(index)
    srv0._cache_cap = 0
    srv0.search(qtexts[0], k=5)
    srv0.search(qtexts[0], k=5)
    assert srv0.cache_misses == 2  # no retention
    assert srv0._cache_bytes == 0

    srv1 = LocalSearcher.from_index(index)
    srv1._cache_cap = 1  # everything evicts immediately after insert
    r1 = srv1.search(qtexts[0], k=5)
    r2 = srv1.search(qtexts[0], k=5)
    assert srv1.cache_misses == 2
    assert r1 == r2
