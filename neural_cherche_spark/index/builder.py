"""Distributed inverted-index builder: doc-partitioned weight
computation → term-partitioned shuffle-merge → compressed posting
blocks, with salted head-term skew handling, per-bucket lineage, and
checkpoint-resume.

The scalable re-expression of the reference's ``add()`` accumulator
(retrieve/bm25.py:146-197): where the reference hstacks CSR columns in
RAM, this writes an on-disk index an executor fleet can build and
query at 10^12-doc scale.

Pipeline (stage names = resumable checkpoints in manifest.json):

  docmap    docs → (doc_id, url, dl); doc_id taken from the input when
            present, else assigned deterministically (zipWithIndex over
            a url range-sort — reproducible for resume/rank-identity).
  termdict  term → dense term_id (zipWithIndex over term sort), stats
            (tf_total, df, idf), salt count for head terms.
  postings  BM25 weights → repartition by (term_id, salt) hash bucket
            → applyInPandas per bucket: sort, delta-gap, varint, f32
            weights, per-block max/min score (index/codec.py) →
            parquet partitioned by bucket (query-side pruning).
  lineage   per-bucket metrics (terms, blocks, postings, bytes,
            encode ms) — the "metrics table" of the north_rule.

Skew: a zipfian head gram's posting list is split across
``n_salts = next_pow2(ceil(df / salt_every))`` sub-lists (power of two
so every term's salt count divides a query's split factor — the BMW
query path shards heavy groups by doc ownership), each a doc-sorted
run, so no single reducer/group sees a whole stopword list. Salt
assignment is ``codec.doc_salt`` (numpy-reproducible); salt runs
spread across buckets via xxhash64(term_id, salt).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from neural_cherche_spark.catalog import IndexCatalog, Manifest
from neural_cherche_spark.index.codec import DNORM_SCALE
from neural_cherche_spark.index.build import (
    BM25Config,
    collection_stats,
    doc_lengths,
    term_frequencies,
    term_stats,
)

POSTINGS_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("term_id", LongType()),
        StructField("salt", IntegerType()),
        StructField("block_id", IntegerType()),
        StructField("n", IntegerType()),
        StructField("first_doc", LongType()),
        StructField("last_doc", LongType()),
        StructField("max_w", DoubleType()),
        StructField("min_w", DoubleType()),
        StructField("n_bytes", LongType()),
        StructField("docs", BinaryType()),
        StructField("ws", BinaryType()),
        StructField("enc_ms", DoubleType()),
    ]
)


# RAW storage: blocks carry per-posting (tf, dl) varints; weights are
# computed at query time from the CURRENT termdict stats. This is what
# makes incremental refresh O(new batch): old blocks never re-encode
# when collection statistics move (codec.encode_partition_bulk_raw).
POSTINGS_RAW_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType()),
        StructField("term_id", LongType()),
        StructField("salt", IntegerType()),
        StructField("n_salts", IntegerType()),
        StructField("block_id", IntegerType()),
        StructField("n", IntegerType()),
        StructField("first_doc", LongType()),
        StructField("last_doc", LongType()),
        StructField("max_tf", LongType()),
        StructField("min_tf", LongType()),
        StructField("min_dl", LongType()),
        StructField("max_dl", LongType()),
        StructField("n_bytes", LongType()),
        StructField("docs", BinaryType()),
        StructField("tfs", BinaryType()),
        StructField("dls", BinaryType()),
        StructField("enc_ms", DoubleType()),
    ]
)


@dataclass
class BuildReport:
    n_docs: int
    n_terms: int
    n_postings: int
    wall_s: dict


def _zip_with_index(
    df: DataFrame,
    order_col: str,
    id_name: str,
    check_unique: bool = False,
    counter: dict | None = None,
) -> DataFrame:
    """Deterministic dense int64 ids: range-sort by ``order_col``, then
    zipWithIndex semantics implemented JVM-only (no Python row serde,
    no single-reducer window): ``monotonically_increasing_id`` is
    ``pid·2^33 + offset-within-partition`` and the rows are sorted
    within range partitions, so dense id = per-partition cumulative
    offset + (mono − pid·2^33).

    Only the KEY column is checkpointed — ``(order_col, __mono, __pid)``
    — and payload columns are joined back by key, so pinning id
    stability never materializes wide columns into executor storage
    (round-2 VERDICT: the old version localCheckpoint-ed the full
    (url, text) corpus — at 100 TB that pins ~everything). The join
    back by key requires ``order_col`` to be UNIQUE; pass
    ``check_unique=True`` for user-supplied keys (one narrow agg over
    the checkpointed keys), leave False where uniqueness holds by
    construction (groupBy outputs)."""
    spark = df.sparkSession
    # partition count only shapes the range split; dense ids are the
    # GLOBAL sort rank, independent of the boundaries — the conf value
    # avoids the DataFrame→RDD conversion (Python-serde plan build)
    # that getNumPartitions forced on every call
    parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    keys = (
        df.select(order_col)
        .repartitionByRange(parts, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("__mono", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()  # pin one NARROW materialization: stable ids
    )
    if check_unique:
        r = keys.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(order_col).alias("nn"),  # non-null rows
            F.countDistinct(order_col).alias("nd"),
        ).collect()[0]
        if r["nn"] != r["n"]:
            # a NULL key would silently vanish in the payload equi-join
            # below (NULL never equi-matches) — fail loudly instead
            raise ValueError(
                f"{order_col!r} contains {r['n'] - r['nn']} null key(s); "
                f"keys must be non-null for deterministic id assignment"
            )
        if r["n"] != r["nd"]:
            raise ValueError(
                f"{order_col!r} must be unique for deterministic id "
                f"assignment: {r['n']} rows, {r['nd']} distinct values"
            )
    counts = {
        r["__pid"]: r["cnt"]
        for r in keys.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if counter is not None:
        # total row count falls out of the offset collect — callers
        # (termdict n_terms) need it and must not run a second count job
        counter["n"] = acc
    off_df = spark.createDataFrame(offsets, "__pid int, __off long")
    ids = (
        keys.join(F.broadcast(off_df), "__pid")
        .withColumn(
            id_name,
            F.col("__off")
            + (F.col("__mono") - F.expr("shiftleft(cast(__pid as bigint), 33)")),
        )
        .drop("__mono", "__pid", "__off")
    )
    if len(df.columns) == 1:
        return ids
    return df.join(ids, order_col)


# search_distributed packs (query_id, doc_id) into one int64; ids must
# fit 41 bits (the 10^12-doc design bound) — validated at build time so
# arbitrary user id columns fail loudly instead of silently colliding.
MAX_DOC_ID = (1 << 41) - 1

# parquet row-group size for postings tables: bucket files are sorted
# by term_id, so row-group min/max stats give the term-pruned scans
# (Spark PushedFilters AND the pyarrow serving tier) real skipping
# power — at the 128 MB parquet default each bucket file was a single
# row group and term filters pruned nothing within a bucket. The size
# must sit well below the per-query term spacing for pruning to bite:
# a Q-term query over an index of B bytes split into R row groups
# reads ~Q·B/R bytes, so R must be ≫ Q per scanned range — 256 KiB
# keeps a typical row group at roughly one head-term salt-run (or a
# few hundred tail runs) and measured serving reads at ~2% of the
# index instead of 100%.
POSTINGS_ROW_GROUP_BYTES = 256 << 10


# postings-encode task sizing: target per-task volume in SUM-DL units
# (token occurrences — the estimate every caller has for free: the
# builder observes (n_docs, avgdl) and the stream ledger is additive;
# distinct (doc, term) postings run ~2.4× fewer on the bench corpus).
# ~1.5M dl units ≈ 600k postings ≈ a few hundred ms of vectorized
# encode per task — large enough to amortize task overhead, small
# enough that a 4× fleet gets 4× the waves (guide §2: derive
# partitioning from input size, not from the executor count).
ENCODE_DL_PER_TASK = 1_500_000


def encode_layout(spark, n_terms: int, n_buckets: int, est_dl: float):
    """(shard column, partition count) for the postings-encode stage.

    Keying the stage by ``bucket`` alone hash-partitioned n_buckets
    DISTINCT values into as many partitions (the guide §2.5 "too few
    distinct partition keys" trap: collisions gave some tasks 2-3 whole
    buckets and left others empty), and any scheme with #keys ==
    #partitions re-creates it at finer grain. So:

    * partition count ``P`` is VOLUME-adaptive: ~ENCODE_DL_PER_TASK of
      input per task, floored at the session's shuffle parallelism and
      capped at 8× it (tasks follow data splits, as on a real cluster);
    * the shard key is (bucket, contiguous-term_id-range) with ~8 keys
      per partition (S = ceil(8·P / n_buckets) ranges per bucket), so
      balls-into-bins averaging balances partitions while every run
      stays whole and every output file keeps a narrow term_id range
      (parquet row-group min/max stats stay tight for the query scans).

    The encode stays ``groupBy(keys).applyInPandas`` over the reused
    exchange: a whole-partition ``mapInPandas`` variant was measured
    3× SLOWER on identical rows (passthrough fn, 72.5M postings:
    grouped-map transport 12.5 s vs mapInPandas 38-44 s at any
    maxRecordsPerBatch — the grouped Arrow writer path is simply the
    fast one on this runtime), so finer GROUPS with a decoupled,
    smaller partition count is how balance is bought here.
    """
    parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    n_tasks = int(
        min(max(parts, -(-int(est_dl) // ENCODE_DL_PER_TASK)), 8 * parts)
    )
    s = max(1, -(-8 * n_tasks // max(n_buckets, 1)))
    if s <= 1 or n_terms <= 0:
        return F.lit(0).cast("int"), n_tasks
    col = F.least(
        F.lit(s - 1),
        F.floor(F.col("term_id") * F.lit(s) / F.lit(int(n_terms))),
    ).cast("int")
    return col, n_tasks


def _fingerprint(docs: DataFrame, id_col: str, text_col: str, cfg_sig: str) -> str:
    """Order-independent input fingerprint: count + sum of per-row
    CONTENT hashes (id AND text — a corpus whose text changed but ids
    didn't must invalidate resume), plus the build-config signature so
    a k1/b/ngram/block_size/salting change can never serve a stale
    index. Computed distributed, one pass; the same pass validates the
    doc_id packing bound."""
    # decimal(38,0) accumulator: sum of int64 hashes over 10^12 rows
    # stays in range (ANSI mode would overflow a long sum)
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64(F.col(id_col), F.col(text_col)).cast("decimal(38,0)")
        ).alias("h"),
        F.min(id_col).alias("lo"),
        F.max(id_col).alias("hi"),
    ).collect()[0]
    if row["n"] and (row["lo"] < 0 or row["hi"] > MAX_DOC_ID):
        raise ValueError(
            f"doc ids must be in [0, 2^41): got range "
            f"[{row['lo']}, {row['hi']}] — remap ids or pass id_col=None "
            f"for deterministic dense assignment"
        )
    return f"{row['n']}:{row['h']}:{cfg_sig}"


def _encode_group_fn(block_size: int):
    """applyInPandas fn: encode one (bucket, shard) group's (term_id,
    salt) runs — the group key guarantees whole runs and one bucket
    per group, so block output is bit-identical at any layout."""

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from neural_cherche_spark.index.codec import encode_partition_bulk

        t0 = time.perf_counter()
        pdf = pdf.sort_values(["term_id", "salt", "doc_id"], kind="mergesort")
        bucket = int(pdf["bucket"].iloc[0])
        enc = encode_partition_bulk(
            pdf["term_id"].to_numpy(),
            pdf["salt"].to_numpy(),
            pdf["doc_id"].to_numpy(),
            pdf["w"].to_numpy().astype(np.float32),
            block_size,
        )
        ms = (time.perf_counter() - t0) * 1000.0
        return pd.DataFrame(
            {
                "bucket": np.full(len(enc["n"]), bucket, dtype=np.int32),
                "term_id": enc["term_id"],
                "salt": enc["salt"].astype(np.int32),
                "block_id": enc["block_id"].astype(np.int32),
                "n": enc["n"].astype(np.int32),
                "first_doc": enc["first_doc"],
                "last_doc": enc["last_doc"],
                "max_w": enc["max_w"],
                "min_w": enc["min_w"],
                "n_bytes": enc["n_bytes"],
                "docs": enc["docs"],
                "ws": enc["ws"],
                "enc_ms": np.full(len(enc["n"]), ms),
            }
        )

    return encode


def _encode_group_raw_fn(block_size: int):
    """RAW-storage twin of :func:`_encode_group_fn`."""

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from neural_cherche_spark.index.codec import encode_partition_bulk_raw

        t0 = time.perf_counter()
        pdf = pdf.sort_values(["term_id", "salt", "doc_id"], kind="mergesort")
        bucket = int(pdf["bucket"].iloc[0])
        enc = encode_partition_bulk_raw(
            pdf["term_id"].to_numpy(),
            pdf["salt"].to_numpy(),
            pdf["doc_id"].to_numpy(),
            pdf["tf"].to_numpy(),
            pdf["dl"].to_numpy(),
            pdf["n_salts"].to_numpy(),
            block_size,
        )
        ms = (time.perf_counter() - t0) * 1000.0
        nb = len(enc["n"])
        return pd.DataFrame(
            {
                "bucket": np.full(nb, bucket, dtype=np.int32),
                "term_id": enc["term_id"],
                "salt": enc["salt"].astype(np.int32),
                "n_salts": enc["n_salts"].astype(np.int32),
                "block_id": enc["block_id"].astype(np.int32),
                "n": enc["n"].astype(np.int32),
                "first_doc": enc["first_doc"],
                "last_doc": enc["last_doc"],
                "max_tf": enc["max_tf"],
                "min_tf": enc["min_tf"],
                "min_dl": enc["min_dl"],
                "max_dl": enc["max_dl"],
                "n_bytes": enc["n_bytes"],
                "docs": enc["docs"],
                "tfs": enc["tfs"],
                "dls": enc["dls"],
                "enc_ms": np.full(nb, ms),
            }
        )

    return encode


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    cfg: BM25Config = BM25Config(),
    text_col: str = "text",
    id_col: str | None = None,
    url_col: str = "url",
    n_buckets: int | None = None,
    block_size: int = 128,
    salt_every: int = 50_000,
    resume: bool = True,
    weighting: str = "bm25",
    storage: str = "weights",
) -> "BM25Index":
    """Build (or resume building) a compressed index on disk.

    ``weighting="bm25"`` (default) — reference retrieve.BM25 weights;
    ``weighting="tfidf"`` — reference retrieve.TfIdf weights (smoothed
    idf, per-doc L2 norm; all non-negative, so block-max pruning runs
    at full strength). Query modes read the weighting from the
    manifest and apply the matching query-side weighting.

    ``storage="weights"`` (default) — blocks store precomputed float32
    weights (reference bm25.py:151-153 f32 parity);
    ``storage="raw"`` — blocks store per-posting (tf, dl) varints and
    weights are computed at query time (full f64) from the current
    termdict stats. Raw is the segmented/incremental layout: old
    blocks are immutable under collection growth, which is what makes
    CompressedIndexStream's delta materialization O(new batch). With
    tfidf weighting the per-DOC L2 norm couples every posting of a doc
    to the global idf vector, so a raw tfidf block cannot be scored
    block-locally: norms live in a per-refresh ``docnorm`` table
    (doc_id → ‖d‖) and queries score unnormalized (qw·tf·idf), then
    divide by the norm via one doc-keyed join of the CANDIDATE set
    against docnorm — which also means tfidf+raw always takes the
    bulk decode-score path (block-max bounds would need per-block
    norm minima that go stale on every refresh).
    """
    if weighting not in ("bm25", "tfidf"):
        raise ValueError(f"unknown weighting {weighting!r}")
    if storage not in ("weights", "raw"):
        raise ValueError(f"unknown storage {storage!r}")
    cat = IndexCatalog(index_dir)
    walls: dict[str, float] = {}
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    # ---- docmap ---------------------------------------------------------
    if id_col is None:
        # ids assigned from a NARROW (url-only) checkpoint; text joins
        # back by url — url uniqueness is enforced (it is the doc key)
        docs_keyed = _zip_with_index(
            docs.select(url_col, text_col), url_col, "doc_id",
            check_unique=True,
        )
        key_out = url_col
    else:
        docs_keyed = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(id_col).cast("string").alias("url"),
            text_col,
        )
        key_out = "url"
    cfg_sig = (
        f"k1={cfg.k1},b={cfg.b},eps={cfg.epsilon},n={cfg.n_min}-{cfg.n_max},"
        f"bs={block_size},se={salt_every},nb={n_buckets},w={weighting},"
        f"st={storage}"
    )
    manifest = cat.load_manifest() if resume else None
    # The fingerprint is a full corpus pass of its own. With a prior
    # manifest it gates stage resumption, so it must be computed up
    # front; on a FRESH build it is only recorded (and validates ids),
    # so it runs as a concurrent job overlapping the tf stage (guide
    # §2.6 — one corpus-scan's wall saved), resolved before any stage
    # needs the value. An id-range error still aborts before the
    # manifest commit.
    from concurrent.futures import ThreadPoolExecutor

    _pool = ThreadPoolExecutor(max_workers=2)
    fp_future = None
    if manifest is None:
        fp_future = _pool.submit(
            _fingerprint, docs_keyed, "doc_id", text_col, cfg_sig
        )
        fingerprint = None
    else:
        fingerprint = _fingerprint(docs_keyed, "doc_id", text_col, cfg_sig)

    # ---- tf: tokenize exactly ONCE, materialize, derive the rest --------
    # Without this stage every downstream aggregation (dl, stats,
    # termdict, weights) re-runs the tokenizer over the whole corpus —
    # at 100 TB that is 4+ extra full-corpus passes.
    t0 = time.perf_counter()
    if not cat.stage_done(manifest, "tf", fingerprint):
        term_frequencies(
            docs_keyed, text_col, "doc_id", cfg.n_min, cfg.n_max
        ).write.mode("overwrite").parquet(cat.path("tf"))
    walls["tf"] = time.perf_counter() - t0
    tf = spark.read.parquet(cat.path("tf"))

    pending = []
    if not cat.stage_done(manifest, "docmap", fingerprint):
        # nothing downstream of the build reads docmap (dl derives
        # from the materialized tf) — the write runs as a concurrent
        # job back-filling executors during termdict/postings (guide
        # §2.6); _finish_build joins it before the manifest commit.
        # Collection stats come from a narrow agg over tf instead.
        def _write_docmap():
            t0 = time.perf_counter()
            (
                docs_keyed.select("doc_id", key_out)
                .join(doc_lengths(tf), "doc_id", "left")
                .na.fill({"dl": 0})
                .write.mode("overwrite")
                .parquet(cat.path("docmap"))
            )
            walls["docmap"] = time.perf_counter() - t0

        pending.append(_pool.submit(_write_docmap))
    # no further submissions: releases the worker threads as they finish
    _pool.shutdown(wait=False)
    if fingerprint is None:
        fingerprint = fp_future.result()
    return _finish_build(
        spark, cat, tf, fingerprint, cfg, n_buckets, block_size,
        salt_every, manifest, walls, index_dir, weighting, storage,
        pending=pending,
    )


def _finish_build(
    spark: SparkSession,
    cat: IndexCatalog,
    tf: DataFrame,
    fingerprint: str,
    cfg: BM25Config,
    n_buckets: int,
    block_size: int,
    salt_every: int,
    manifest,
    walls: dict,
    index_dir: str,
    weighting: str = "bm25",
    storage: str = "weights",
    stats: tuple[int, float] | None = None,
    pending: list | None = None,
) -> "BM25Index":
    """Stages downstream of the materialized tf table — shared by
    ``build_index`` and the incremental/streaming materializer
    (streaming/compressed.py), so a stream-accumulated tf produces the
    IDENTICAL index artifact as a from-scratch build.

    ``pending``: concurrent caller-side jobs (e.g. the docmap write,
    guide §2.6) joined — and their failures re-raised — before the
    manifest commit."""
    from neural_cherche_spark.index.builder_weights import weights_from_tf

    # doc lengths from the materialized tf, persisted: identical rows
    # to the old docmap dl>0 projection (docs with no n-grams don't
    # count toward n_docs/avgdl — matches the exact path + oracle),
    # which frees the docmap write to run off the critical path, and
    # the agg over tf runs ONCE for its three consumers (stats,
    # termdict w1, postings weights) instead of once each — n_docs
    # scalar rows, bounded at any corpus.
    from pyspark import StorageLevel

    dl = doc_lengths(tf).persist(StorageLevel.MEMORY_AND_DISK)

    # ---- stats + termdict ----------------------------------------------
    t0 = time.perf_counter()
    if cat.stage_done(manifest, "termdict", fingerprint) and cat.stage_done(
        manifest, "postings", fingerprint
    ):
        # fully-resumed statistics: manifest values are authoritative
        # for this fingerprint — skip the stats job
        n_docs, avgdl = int(manifest.n_docs), float(manifest.avgdl)
    elif stats is not None:
        # observed on the docmap write by the caller — no stats job
        n_docs, avgdl = stats
    else:
        stats_row = collection_stats(dl).collect()[0]
        n_docs, avgdl = int(stats_row["n_docs"]), float(stats_row["avgdl"])
    # POWER OF TWO, capped: every term's salt count must divide the
    # per-query split factor so the block-max path can shard heavy
    # query groups into disjoint doc subsets (query/bmw.py subgroup
    # split). Cap 1024: beyond that a single salt run still holds
    # ≥ salt_every postings and the heavy query is routed to the bulk
    # decode-score path anyway (search_auto).
    n_salts_col = F.least(
        F.lit(1024),
        F.pow(
            F.lit(2.0),
            F.ceil(
                F.log2(
                    F.greatest(
                        F.lit(1.0),
                        F.ceil(F.col("df") / F.lit(salt_every)),
                    )
                )
            ),
        ).cast("int"),
    )
    if not cat.stage_done(manifest, "termdict", fingerprint):
        if weighting == "bm25":
            # ONE pass over tf computes tf_total, df AND the norm base:
            # w1 (the tf component) does not depend on idf, and
            # norm = sqrt(Σ(w1·idf)²) = |idf|·sqrt(Σw1²), so Σw1² can be
            # aggregated alongside tf_total — no second full-corpus
            # pass, and the weights stage later needs only a broadcast
            # join against this small table (SURVEY §4.4, window-free).
            w1 = tf.join(dl, "doc_id").withColumn(
                "w1",
                F.col("tf")
                * (cfg.k1 + 1.0)
                / (
                    F.col("tf")
                    + cfg.k1
                    * (1.0 - cfg.b + cfg.b * F.col("dl") / F.lit(avgdl))
                )
                + F.lit(cfg.epsilon),
            )
            ts = (
                w1.groupBy("term")
                .agg(
                    F.sum("tf").alias("tf_total"),
                    F.count(F.lit(1)).alias("df"),
                    F.sum(F.col("w1") * F.col("w1")).alias("sw1sq"),
                )
                .withColumn(
                    "idf",
                    F.log(
                        (F.lit(n_docs) - F.col("tf_total") + 0.5)
                        / (F.col("tf_total") + 0.5)
                        + 1.0
                    ),
                )
                .withColumn(
                    "term_norm",
                    F.when(
                        F.col("idf") == 0, F.lit(1.0)
                    ).otherwise(F.abs(F.col("idf")) * F.sqrt(F.col("sw1sq"))),
                )
                .withColumn("n_salts", n_salts_col)
                .drop("sw1sq")
            )
        else:
            # tfidf: smoothed idf ln((1+N)/(1+df)) + 1 (always > 0);
            # normalization is per DOC, done in the weights stage —
            # term_norm kept at 1.0 for schema compatibility
            ts = (
                tf.groupBy("term")
                .agg(
                    F.sum("tf").alias("tf_total"),
                    F.count(F.lit(1)).alias("df"),
                )
                .withColumn(
                    "idf",
                    F.log(
                        (1.0 + F.lit(n_docs)) / (1.0 + F.col("df"))
                    )
                    + 1.0,
                )
                .withColumn("term_norm", F.lit(1.0))
                .withColumn("n_salts", n_salts_col)
            )
        # persist the aggregated term table: _zip_with_index materializes
        # it once for the key checkpoint and the payload join re-derives
        # it at the write — without the persist the full term agg over
        # tf ran TWICE per build (plan audit; ~2× the termdict stage on
        # the 100k corpus). n_terms-sized rows — bounded at any corpus.
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import StorageLevel

        ts = ts.persist(StorageLevel.MEMORY_AND_DISK)
        tcount: dict = {}
        termdict = _zip_with_index(ts, "term", "term_id", counter=tcount)
        # the downstream stages need only the termdict CONTENT (cheap
        # to re-derive from the persisted agg + checkpointed ids) and
        # n_terms (already known from the id-assignment offsets) — the
        # parquet write itself runs as a concurrent job back-filling
        # executors during docnorm/postings (guide §2.6), joined
        # before the manifest commit. ts stays persisted until the
        # postings stage has consumed it (released with dl below).
        _td_pool = ThreadPoolExecutor(max_workers=1)

        def _write_termdict():
            termdict.write.mode("overwrite").parquet(cat.path("termdict"))

        pending = list(pending or ()) + [_td_pool.submit(_write_termdict)]
        _td_pool.shutdown(wait=False)
        shared_ts = ts
        n_terms = int(tcount["n"])
    else:
        # stage resumed for the same fingerprint: the manifest's total
        # is authoritative — no count job over the termdict
        n_terms = int(manifest.n_terms)
        shared_ts = None
        termdict = spark.read.parquet(cat.path("termdict"))
    walls["termdict"] = time.perf_counter() - t0

    # ---- docnorm (tfidf + raw only) -------------------------------------
    # per-doc L2 norm ‖d‖ = sqrt(Σ_t (tf·idf_t)²): raw tfidf blocks
    # store tf, queries score unnormalized and divide by ‖d‖ via a
    # doc-keyed join of the candidate set against this table. One
    # term-keyed join + one doc-keyed agg over tf — recomputed whole
    # on every refresh because idf moves (norms are per-doc SCALARS:
    # the rewrite is O(n_docs) bytes, postings stay untouched).
    # Computed BEFORE the postings stage: the tfidf raw encode stamps
    # each posting with the floor-quantized norm (codec.DNORM_SCALE)
    # so block metadata carries sound per-block norm bounds.
    docnorm_path = ""
    if storage == "raw" and weighting == "tfidf":
        t0 = time.perf_counter()
        docnorm_path = "docnorm"
        if not cat.stage_done(manifest, "docnorm", fingerprint):
            (
                tf.join(termdict.select("term", "idf"), "term")
                .withColumn("wr", F.col("tf") * F.col("idf"))
                .groupBy("doc_id")
                .agg(F.sqrt(F.sum(F.col("wr") * F.col("wr"))).alias("dnorm"))
                .write.mode("overwrite")
                .parquet(cat.path("docnorm"))
            )
        walls["docnorm"] = time.perf_counter() - t0

    # ---- postings -------------------------------------------------------
    t0 = time.perf_counter()
    if not cat.stage_done(manifest, "postings", fingerprint):
        if storage == "raw":
            # raw layout: per-posting (tf, dl); weights computed at
            # query time. Written as segment 0 of a segmented index —
            # the same layout CompressedIndexStream appends deltas to.
            # tfidf: the dl slot carries the quantized encode-time
            # docnorm ρq (cosine never reads dl; see codec.DNORM_SCALE)
            if weighting == "tfidf":
                dn = spark.read.parquet(cat.path("docnorm"))
                w = tf.join(dn, "doc_id").withColumn(
                    "dl",
                    F.greatest(
                        F.lit(1),
                        F.floor(F.col("dnorm") * F.lit(float(DNORM_SCALE))),
                    ).cast("long"),
                )
            else:
                w = tf.join(dl, "doc_id")
            w = (
                w.join(
                    F.broadcast(
                        termdict.select("term", "term_id", "n_salts")
                    ),
                    "term",
                )
                .select("term_id", "doc_id", "tf", "dl", "n_salts")
            )
            payload = ("doc_id", "tf", "dl", "n_salts")
            encode_fn, schema = (
                _encode_group_raw_fn(block_size),
                POSTINGS_RAW_SCHEMA,
            )
            target = os.path.join(cat.path("postings"), "seg=0")
        elif weighting == "bm25":
            w = weights_from_tf(tf, dl, termdict, n_docs, avgdl, cfg)
            payload = ("doc_id", "w")
            encode_fn, schema = _encode_group_fn(block_size), POSTINGS_SCHEMA
            target = cat.path("postings")
        else:
            from neural_cherche_spark.index.builder_weights import (
                tfidf_weights_from_tf,
            )

            w = tfidf_weights_from_tf(tf, termdict)
            payload = ("doc_id", "w")
            encode_fn, schema = _encode_group_fn(block_size), POSTINGS_SCHEMA
            target = cat.path("postings")
        salted = (
            w.withColumn(
                # numpy-reproducible salt (codec.doc_salt): the query
                # side re-derives doc→subgroup ownership in Python, so
                # xxhash64 (JVM-only) can't be the salt function here
                "salt",
                F.when(
                    F.col("n_salts") > 1,
                    F.pmod(
                        F.col("doc_id")
                        + F.shiftright("doc_id", 7)
                        + F.shiftright("doc_id", 15),
                        F.col("n_salts"),
                    ).cast("int"),
                ).otherwise(F.lit(0)),
            )
            .withColumn(
                "bucket",
                F.pmod(F.xxhash64("term_id", "salt"), F.lit(n_buckets)).cast("int"),
            )
            .select("bucket", "term_id", "salt", *payload)
        )
        shard_col, n_parts = encode_layout(
            spark, n_terms, n_buckets, n_docs * avgdl
        )
        (
            salted.withColumn("__shard", shard_col)
            .repartition(n_parts, "bucket", "__shard")
            .groupBy("bucket", "__shard")
            .applyInPandas(encode_fn, schema)
            .write.mode("overwrite")
            .partitionBy("bucket")
            # small row groups so the term_id min/max statistics can
            # prune READS: with the 128 MB default each bucket file is
            # ONE row group and every term-pruned scan (Spark and the
            # pyarrow serving tier) decompresses whole bucket files —
            # measured: the serving tier read the entire index per
            # query (guide §6: make PushedFilters actually skip data)
            .option("parquet.block.size", str(POSTINGS_ROW_GROUP_BYTES))
            .parquet(target)
        )
    walls["postings"] = time.perf_counter() - t0
    postings = spark.read.parquet(cat.path("postings"))

    # ---- lineage (per-bucket metrics table) ------------------------------
    # column-pruned aggregation: n_bytes was computed at encode time, so
    # this scan never touches the (dominant) binary docs/ws columns —
    # at 100 TB the metrics pass reads a few % of the index, not all of it
    t0 = time.perf_counter()
    if not cat.stage_done(manifest, "lineage", fingerprint):
        from pyspark.sql import Observation

        lobs = Observation("lineage_totals")
        lineage_df = postings.groupBy("bucket").agg(
            F.countDistinct("term_id").alias("n_terms"),
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.sum("n_bytes").alias("bytes"),
            F.max("enc_ms").alias("enc_ms"),
            F.lit(fingerprint).alias("input_fingerprint"),
        ).observe(lobs, F.sum("n_postings").alias("np"))
        lineage_target = (
            os.path.join(cat.path("lineage"), "seg=0")
            if storage == "raw"
            else cat.path("lineage")
        )
        lineage_df.write.mode("overwrite").parquet(lineage_target)
        # manifest total rides the lineage write as an Observation — no
        # read-back aggregation job (and still never touches the binary
        # posting columns)
        n_postings = int(lobs.get["np"] or 0)
    else:
        # fully resumed build: the manifest total is authoritative
        n_postings = int(manifest.n_postings)
    walls["lineage"] = time.perf_counter() - t0
    for f in pending or ():
        # concurrent jobs (docmap + termdict writes) must land — and
        # their failures surface — before the manifest commit
        f.result()
    dl.unpersist()
    if shared_ts is not None:
        shared_ts.unpersist()
    m = Manifest(
        cfg={
            "k1": cfg.k1, "b": cfg.b, "epsilon": cfg.epsilon,
            "n_min": cfg.n_min, "n_max": cfg.n_max,
            "block_size": block_size, "salt_every": salt_every,
            "weighting": weighting, "storage": storage,
        },
        input_fingerprint=fingerprint,
        n_docs=n_docs,
        avgdl=avgdl,
        n_terms=n_terms,
        n_postings=int(n_postings),
        n_buckets=n_buckets,
        stages={
            s: {"done": True, "wall_s": round(walls.get(s, 0.0), 3)}
            for s in ("tf", "docmap", "termdict", "postings", "lineage")
            + (("docnorm",) if docnorm_path else ())
        },
        segments=(
            [{"seg": 0, "n_postings": int(n_postings)}]
            if storage == "raw"
            else []
        ),
        docnorm_path=docnorm_path,
        # fresh build: blocks were quantized against THIS docnorm, so
        # the drift factor is exactly 1 (block-max is as tight as
        # weights-mode BMW until the first non-frozen refresh)
        dnorm_gammas=({"0": [1.0, 1.0]} if docnorm_path else {}),
    )
    cat.save_manifest(m)
    return BM25Index(spark, index_dir)


class BM25Index:
    """Handle over a built on-disk index."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        snapshot: int | None = None,
    ) -> None:
        """``snapshot``: open a PAST committed state (Iceberg-style
        time travel). Delta refreshes only append segments and retain
        termdict/docnorm/tombstone revisions, so every snapshot since
        the last rewrite operation (compact / resume=False / weights
        rebuild) is queryable; referenced dirs are validated so an
        expired snapshot fails loudly instead of reading rewritten
        data."""
        from neural_cherche_spark.catalog import SALT_LAYOUT_VERSION

        self.spark = spark
        self.cat = IndexCatalog(index_dir)
        self.manifest = self.cat.load_manifest(snapshot=snapshot)
        if self.manifest is None:
            raise FileNotFoundError(f"no manifest at {index_dir}")
        if snapshot is not None:
            missing = [
                p
                for p in (
                    [
                        os.path.join(
                            "postings", f"seg={int(sg['seg'])}"
                        )
                        for sg in self.manifest.segments
                    ]
                    + [self.manifest.termdict_path]
                    + (
                        [self.manifest.docnorm_path]
                        if getattr(self.manifest, "docnorm_path", "")
                        else []
                    )
                    + (
                        [self.manifest.tombstones_path]
                        if getattr(self.manifest, "tombstones_path", "")
                        else []
                    )
                )
                if not os.path.exists(self.cat.path(p))
            ]
            if missing:
                raise FileNotFoundError(
                    f"snapshot {snapshot} is expired — a rewrite "
                    f"operation replaced {missing}; only snapshots "
                    "since the last compact/rebuild are queryable"
                )
        # pre-v2 indexes used a different salt function (and free-form
        # n_salts); the block-max subgroup path would silently drop
        # salted-term docs on them — search routes them to the
        # salt-agnostic distributed path instead (ADVICE r2).
        self.salt_layout_ok = (
            int(getattr(self.manifest, "version", 1)) >= SALT_LAYOUT_VERSION
        )
        self._termdict: DataFrame | None = None
        self._serving: dict | None = None
        self._serving_prepared: set | None = None

    @property
    def postings(self) -> DataFrame:
        """Postings scan restricted to the segments COMMITTED by this
        handle's manifest. A refresh that crashed after its segment
        write but before the manifest save leaves an orphan seg=K dir;
        segment writes are overwrite-idempotent so the retry heals it,
        but until then a whole-dir read would score uncommitted docs
        (absent from n_docs/avgdl) — the manifest is the snapshot, so
        reads must follow it. The isin filter prunes on the seg=
        partition column (no data read from orphans)."""
        df = self.spark.read.parquet(self.cat.path("postings"))
        return self._seg_filter(df)

    def _seg_filter(self, df: DataFrame) -> DataFrame:
        segs = [int(s["seg"]) for s in self.manifest.segments]
        if not segs or "seg" not in df.columns:
            return df
        return df.filter(F.col("seg").isin(segs))

    @property
    def storage(self) -> str:
        return self.manifest.cfg.get("storage", "weights")

    @property
    def termdict(self) -> DataFrame:
        # every search joins its query grams against the termdict; keep
        # it executor-cached per index handle so repeated (serving)
        # calls skip the parquet re-read (NOTES r2 carry-over #2)
        if self._termdict is None:
            self._termdict = self.spark.read.parquet(
                self.cat.path(
                    getattr(self.manifest, "termdict_path", "termdict")
                    or "termdict"
                )
            ).cache()
        return self._termdict

    @property
    def docmap(self) -> DataFrame:
        """(doc_id, url[, dl]) for LIVE docs only: segments written
        before a delete keep the deleted docs' rows as immutable bytes,
        so the view anti-joins this manifest's tombstones — keeping
        ``docmap.count()`` equal to ``manifest.n_docs`` at every
        snapshot (ADVICE r4)."""
        df = self._seg_filter(
            self.spark.read.parquet(self.cat.path("docmap"))
        )
        t = self.tombstones
        if t is not None:
            df = df.join(t, "doc_id", "left_anti")
        return df

    @property
    def docnorm(self) -> DataFrame:
        """(doc_id, dnorm) — per-doc L2 norms (tfidf + raw storage
        only; revision dir published by the manifest pointer)."""
        p = getattr(self.manifest, "docnorm_path", "") or ""
        if not p:
            raise RuntimeError("index has no docnorm table")
        return self.spark.read.parquet(self.cat.path(p))

    @property
    def tombstones(self) -> DataFrame | None:
        """(doc_id) — logically-deleted docs whose postings still sit
        in immutable segments (raw storage; physically dropped by
        compact()). None when the index carries no deletions."""
        p = getattr(self.manifest, "tombstones_path", "") or ""
        if not p:
            return None
        return self.spark.read.parquet(self.cat.path(p))

    def _tomb_src(self) -> str | None:
        """Tombstone DIR PATH for the executor-side lazy loader
        (:mod:`neural_cherche_spark.index.tombmask`): decode tasks
        read only the delete sets of segments their rows touch, via a
        per-executor cache — the r4 driver-collected broadcast
        (~8 B/deleted doc held AND shipped from the driver per handle)
        is gone. ``compact()`` remains the physical GC."""
        p = getattr(self.manifest, "tombstones_path", "") or ""
        if not p:
            return None
        return self.cat.path(p)

    @property
    def lineage(self) -> DataFrame:
        return self._seg_filter(
            self.spark.read.parquet(self.cat.path("lineage"))
        )

    def search(self, queries: DataFrame, k: int = 10, mode: str = "bmw") -> DataFrame:
        from neural_cherche_spark.query.bmw import search_index

        return search_index(self, queries, k=k, mode=mode)

    def prepare_serving(
        self, queries: list[str] | None = None
    ) -> "BM25Index":
        """Collect the termdict (with precomputed per-term bucket sets)
        into a driver-side map: subsequent :meth:`search_serving` calls
        build their match rows in pure Python — zero Spark jobs before
        the postings scan itself. Opt-in: by default the map holds the
        full vocabulary on the driver (~100 B/term — fine up to ~10^7
        terms, the usual serving-node trade).

        ``queries``: VOCABULARY-FILTERED prepare for indexes whose
        termdict exceeds driver memory (VERDICT r4 #6 — 10^7+ terms):
        the given query texts are tokenized driver-side and only their
        grams' termdict rows are collected (one broadcast-hash-joined
        filter of the cached termdict — the collect is bounded by the
        query workload's vocabulary, not the corpus's). The prepared
        gram set is recorded: a later :meth:`search_serving` query
        containing an UNPREPARED gram raises instead of silently
        dropping a term whose vocabulary membership is unknown —
        frozen-vocabulary semantics stay exact for the prepared
        workload. Re-calling prepare_serving() extends nothing; it
        replaces the map (prepare with the union if the workload
        grows)."""
        from neural_cherche_spark.text.ngrams import char_wb_ngrams

        n_buckets = self.manifest.n_buckets
        td = self.termdict.select(
            "term", "term_id", "df", "idf", "term_norm", "n_salts"
        )
        prepared: set[str] | None = None
        if queries is not None:
            cfg = self.manifest.cfg
            n_min, n_max = int(cfg["n_min"]), int(cfg["n_max"])
            prepared = {
                g
                for q in queries
                for g in char_wb_ngrams(q, n_min, n_max)
            }
            grams_df = self.spark.createDataFrame(
                [(g,) for g in sorted(prepared)], "term string"
            )
            td = td.join(F.broadcast(grams_df), "term")
        rows = (
            td.withColumn(
                "buckets",
                F.expr(
                    "array_distinct(transform(sequence(0, n_salts - 1), "
                    f"s -> cast(pmod(xxhash64(term_id, cast(s as int)), {n_buckets}) as int)))"
                ),
            )
            .collect()
        )
        self._serving_prepared = prepared
        self._serving = {
            r["term"]: {
                "term_id": int(r["term_id"]),
                "df": int(r["df"]),
                "idf": float(r["idf"]),
                "term_norm": float(r["term_norm"]),
                "n_salts": int(r["n_salts"]),
                "buckets": [int(b) for b in r["buckets"]],
            }
            for r in rows
        }
        return self

    def search_serving(
        self, queries: list[str], k: int = 10, mode: str = "bmw"
    ) -> DataFrame:
        """Search from plain query strings via the driver-side serving
        map (see :meth:`prepare_serving`): exactly one Spark job per
        call — the pruned postings scan/score itself."""
        from neural_cherche_spark.query.bmw import (
            search_auto,
            search_bmw,
            search_distributed,
            serving_match_rows,
        )

        rows = serving_match_rows(self, queries)
        if mode == "bmw":
            return search_bmw(self, None, k, _rows=rows)
        if mode == "distributed":
            return search_distributed(self, None, k, _rows=rows)
        if mode == "auto":
            return search_auto(self, None, k, _rows=rows)
        raise ValueError(f"unknown mode {mode!r}")

    def close(self) -> None:
        """Release executor-cached state (the termdict cache) and the
        driver-side serving map. Sessions that open many indexes must
        close handles they are done with or cached tables accumulate
        in executor storage."""
        self._serving = None
        self._serving_prepared = None
        if self._termdict is not None:
            self._termdict.unpersist()
            self._termdict = None

    def __enter__(self) -> "BM25Index":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
