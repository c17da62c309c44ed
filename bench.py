"""Benchmark harness — run headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline workload (the north_rule metric surface):
  * index_build   — full BM25 weight pipeline over documents, materialized
  * bm25_topk     — batch of queries answered via broadcast join + top-k
  * tokenize      — raw tokenizer throughput (JVM expression path)

Run the scaling study with scripts/bench_scale.py (local[8] vs
local[32] on identical synthetic input → BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import functions as F

    from neural_cherche_spark.session import get_spark
    from neural_cherche_spark.index import bm25_weights
    from neural_cherche_spark.query import retrieve_exact
    from neural_cherche_spark.text.ngrams import ngram_terms_column
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    timings: dict[str, float] = {}

    # working set on tmpfs: the host /tmp disk sustains ~340 MB/s and
    # is shared — on-disk writes there measure the neighbor's IO, not
    # the engine (same hygiene as scripts/bench_scale.py)
    work = "/dev/shm/bench_work" if os.path.isdir("/dev/shm") else "/tmp"
    os.makedirs(work, exist_ok=True)

    # q1: index build (tokenize -> tf -> stats -> weights), materialized
    t0 = time.perf_counter()
    w = bm25_weights(docs)
    w.write.mode("overwrite").parquet(f"{work}/bench_weights.parquet")
    timings["index_build"] = time.perf_counter() - t0
    w_stored = spark.read.parquet(f"{work}/bench_weights.parquet")
    n_postings = w_stored.count()

    # q2: BM25 top-10 for the literal query batch
    queries = entry_mod._queries_df(spark)
    n_queries = queries.count()
    t0 = time.perf_counter()
    res = retrieve_exact(w_stored, queries, k=10)
    rows = res.collect()
    timings["bm25_topk"] = time.perf_counter() - t0

    # q3: tokenizer throughput (JVM expression, no Python)
    t0 = time.perf_counter()
    docs.select(F.explode(ngram_terms_column("text")).alias("t")).count()
    timings["tokenize"] = time.perf_counter() - t0

    # q4: compressed posting-list index build (full staged pipeline)
    import shutil

    from neural_cherche_spark.index.builder import build_index

    idx_dir = f"{work}/bench_index"
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.perf_counter()
    index = build_index(
        spark, docs, idx_dir, id_col="doc_id", n_buckets=cpus, resume=False
    )
    timings["index_build_compressed"] = time.perf_counter() - t0

    # q5/q6: batch QPS over the compressed index, corpus-derived queries
    load_queries = docs.limit(64).select(
        F.col("doc_id").alias("query_id"),
        F.expr("array_join(slice(split(text, ' '), 1, 3), ' ')").alias("query"),
    ).cache()
    n_load = load_queries.count()
    # one untimed warmup: first-call JIT/codegen/broadcast setup
    # otherwise dominates the (short) per-mode walls at bench scale;
    # best-of-2 damps shared-host noise on the short query phases
    index.search(load_queries, k=10, mode="bmw").collect()
    for mode in ("bmw", "distributed", "auto"):
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            index.search(load_queries, k=10, mode=mode).collect()
            walls.append(time.perf_counter() - t0)
        timings[f"query_{mode}"] = min(walls)

    # e2e headline = the phase set benched since round 1 (comparable
    # across BENCH_r{N}.json); the raw/delta phases below are reported
    # as additional keys
    total = sum(timings.values())

    # q7: raw-storage build + O(new batch) delta refresh. The stream
    # accumulates 7/8 of the corpus, materializes, then the LAST 1/8
    # arrives and only the refresh is the headline wall — at scale this
    # is the index's steady-state maintenance cost.
    from neural_cherche_spark.streaming import CompressedIndexStream

    state_dir, delta_dir = f"{work}/bench_state", f"{work}/bench_delta_idx"
    shutil.rmtree(state_dir, ignore_errors=True)
    shutil.rmtree(delta_dir, ignore_errors=True)
    stream = CompressedIndexStream(spark, state_dir)
    head = docs.filter(F.col("doc_id") % 8 != 0)
    tail = docs.filter(F.col("doc_id") % 8 == 0)
    stream.add_batch(head, epoch_id=0)
    stream.materialize(delta_dir, n_buckets=cpus, storage="raw")
    t0 = time.perf_counter()
    stream.add_batch(tail, epoch_id=1)
    ridx = stream.materialize(delta_dir, n_buckets=cpus, storage="raw")
    timings["delta_refresh"] = time.perf_counter() - t0
    n_tail = ridx.manifest.n_docs - head.count()

    # q8: query the segmented raw index (query-time weights, f64)
    ridx.search(load_queries, k=10, mode="bmw").collect()
    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        ridx.search(load_queries, k=10, mode="bmw").collect()
        walls.append(time.perf_counter() - t0)
    timings["query_bmw_raw"] = min(walls)
    out = {
        "metric": "bm25_engine_e2e",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "n_docs": n_docs,
        "n_postings": n_postings,
        "n_queries": n_queries,
        "n_results": len(rows),
        "docs_per_sec_build": round(n_docs / timings["index_build"], 1),
        "docs_per_sec_compressed": round(
            n_docs / timings["index_build_compressed"], 1
        ),
        "qps_topk": round(n_queries / timings["bm25_topk"], 2),
        "qps_bmw": round(n_load / timings["query_bmw"], 2),
        "qps_distributed": round(n_load / timings["query_distributed"], 2),
        "qps_auto": round(n_load / timings["query_auto"], 2),
        "docs_per_sec_delta_refresh": round(
            n_tail / timings["delta_refresh"], 1
        ),
        "qps_bmw_raw": round(n_load / timings["query_bmw_raw"], 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
