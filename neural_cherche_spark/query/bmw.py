"""Query answering over the compressed postings index.

Two physical strategies, both rank-identical to the exact join+agg
path (tests pin this):

``mode="distributed"`` — decode-and-score, fully distributed:
    postings (bucket-pruned, term-filtered scan)
      ⋈ BROADCAST(query terms)                 — no shuffle of postings
      → mapInPandas: decode blocks, partial (query_id, doc_id, score)
        pre-aggregated per Arrow batch          — Python only here
      → groupBy(query_id, doc_id).sum → top-k   — one small shuffle
    No per-group materialization: safe for arbitrarily long posting
    lists (the group-OOM-free path at 10^12 docs).

``mode="bmw"`` — block-max pruned, per-query (sub)group:
    same pruned scan ⋈ broadcast(query terms)
      → groupBy(query_id, subgroup).applyInPandas(block-max top-k)
    Heavy queries shard into max(n_salts) doc-disjoint subgroups
    (codec.doc_salt ownership). Blocks are processed in descending
    positive-upper-bound (max(qtf·max_w, 0)) order with per-(term,
    salt)-run suffix bounds: unseen docs are bounded by the positive
    suffix maxima, candidates' finals lower-bounded via the negative
    suffix minima — sound even when idf < 0 (tf_total > N, routine on
    webtext under reference semantics, bm25.py:185-190). Once no
    unseen doc can reach the certified k-th lower bound, remaining
    blocks are decoded only where their doc range contains a surviving
    candidate (range skip + np.isin). Results are ALWAYS exact. This
    is the SURVEY §4.2 "block-max WAND" realized as vectorized
    two-phase pruning (a Python pointer-chasing DAAT loop would be
    slower than numpy phase-scoring at batch sizes).

Bucket pruning: the builder spreads (term_id, salt) over parquet
``bucket=`` partitions by xxhash64; the query side recomputes the
exact bucket set for its terms IN SPARK (same hash), so the parquet
scan prunes directories and row-groups (PushedFilters on bucket +
term_id).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from neural_cherche_spark.index.tombmask import keep_mask
from neural_cherche_spark.query.exact import query_term_counts


_SCORE_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("score", DoubleType()),
    ]
)


def _query_terms(index, queries: DataFrame) -> DataFrame:
    """(query_id, term_id, qtf, df, idf, term_norm, n_salts) for
    matched terms only (frozen-vocabulary semantics: unmatched terms
    drop, tfidf.py:134)."""
    cfg = index.manifest.cfg
    qt = query_term_counts(
        queries, n_min=int(cfg["n_min"]), n_max=int(cfg["n_max"])
    )
    td = index.termdict.select(
        "term", "term_id", "df", "idf", "term_norm", "n_salts"
    )
    return td.join(F.broadcast(qt), "term").select(
        "query_id", "term_id", "qtf", "df", "idf", "term_norm", "n_salts"
    )


def _drop_nonpositive_queries(index, rows: list) -> list:
    """Driver-side WAND-style whole-query prune, exact by certificate:
    every scorer's per-posting contribution is ``qtf · w1 · idf /
    term_norm`` with qtf ≥ 1, w1 ≥ 0 (tf-saturation > 0 plus ε ≥ 0)
    and term_norm > 0 — so sign(max contribution of a term) =
    sign(idf), which the driver already holds in the match rows. A
    query whose EVERY matched term has idf ≤ 0 can only reach final
    scores ≤ 0, and the engine's positive-score filter (T2, reference
    tfidf.py:210-217) drops those rows — so the query's result set is
    empty under any physical mode. Removing it HERE skips its share of
    the postings scan, the block-row duplication in the broadcast
    join, the shuffle, and its (query, grp) groups — the group scorer
    only reached the same conclusion after all of that was paid
    (``ub_pos[order[0]] <= 0`` early-exit). Common-word queries over
    webtext hit this constantly: reference idf goes negative whenever
    tf_total > N (bm25.py:185-190).

    Inapplicable (returns rows unchanged) when ε < 0 — then w1's sign
    is not certified. tfidf weighting has idf > 0 everywhere, so the
    filter is a structural no-op there."""
    if not rows:
        return rows
    if float(index.manifest.cfg.get("epsilon", 0.0)) < 0.0:
        return rows
    keep: set[int] = set()
    for r in rows:
        if float(r["idf"]) > 0.0:
            for q in r["qs"]:
                keep.add(int(q["query_id"]))
    out = []
    for r in rows:
        qs = [q for q in r["qs"] if int(q["query_id"]) in keep]
        if len(qs) == len(r["qs"]):
            out.append(r)
        elif qs:
            d = r.asDict() if hasattr(r, "asDict") else dict(r)
            d["qs"] = qs
            out.append(d)
    return out


def _matched_terms(index, queries: DataFrame) -> list:
    """ONE driver round-trip per search call: for each matched term —
    its df, salt count, exact bucket set (same xxhash64 as the builder,
    so parquet partition pruning is exact), and the (query_id, qtf)
    fan-out list. Every search mode derives its broadcast map, scan
    pruning, routing volumes, and subgroup split from this single
    collect (round-1 VERDICT "what's wrong" #4: 3 collects/call).

    For a tfidf-weighted index (manifest cfg), the query side of the
    dot product is idf-weighted L2-normalized counts (reference
    retrieve.TfIdf, tfidf.py:123-144 + cosine semantics): the qs
    entries carry qtf·idf/‖q‖ instead of raw qtf — the downstream
    scorers are weighting-agnostic.
    """
    n_buckets = index.manifest.n_buckets
    rows = (
        _query_terms(index, queries)
        .groupBy("term_id", "n_salts", "df", "idf", "term_norm")
        .agg(F.collect_list(F.struct("query_id", "qtf")).alias("qs"))
        .withColumn(
            "buckets",
            F.expr(
                "array_distinct(transform(sequence(0, n_salts - 1), "
                f"s -> cast(pmod(xxhash64(term_id, cast(s as int)), {n_buckets}) as int)))"
            ),
        )
        .collect()
    )
    rows = _drop_nonpositive_queries(index, rows)
    if index.manifest.cfg.get("weighting", "bm25") != "tfidf":
        return rows
    return _tfidf_transform_rows(rows)


def _tfidf_transform_rows(rows: list) -> list:
    """Fold the tfidf query-side weighting (idf-weighted L2-normalized
    counts) into the qs entries so downstream scorers stay
    weighting-agnostic."""
    qnorm_sq: dict[int, float] = {}
    for r in rows:
        for q in r["qs"]:
            qid = int(q["query_id"])
            qw = float(q["qtf"]) * float(r["idf"])
            qnorm_sq[qid] = qnorm_sq.get(qid, 0.0) + qw * qw
    out = []
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        d["qs"] = [
            {
                "query_id": int(q["query_id"]),
                "qtf": float(q["qtf"])
                * float(r["idf"])
                / (qnorm_sq[int(q["query_id"])] ** 0.5),
            }
            for q in r["qs"]
        ]
        out.append(d)
    return out


def serving_match_rows(index, queries: list[str]) -> list:
    """ZERO-job twin of :func:`_matched_terms` for a handle that called
    ``BM25Index.prepare_serving()``: queries are tokenized driver-side
    with the Python tokenizer twin (parity-tested against the Catalyst
    expression) and matched against the collected termdict map — no
    Spark job runs until the actual postings scan. This is the
    high-QPS serving path (NOTES r2 carry-over #2)."""
    from neural_cherche_spark.text.ngrams import char_wb_ngrams

    smap = index._serving
    if smap is None:
        raise RuntimeError("call prepare_serving() first")
    prepared = getattr(index, "_serving_prepared", None)
    cfg = index.manifest.cfg
    n_min, n_max = int(cfg["n_min"]), int(cfg["n_max"])
    per_term: dict[str, dict] = {}
    for qid, qtext in enumerate(queries):
        counts: dict[str, int] = {}
        for t in char_wb_ngrams(qtext, n_min, n_max):
            counts[t] = counts.get(t, 0) + 1
        for term, qtf in counts.items():
            info = smap.get(term)
            if info is None:
                if prepared is not None and term not in prepared:
                    # vocabulary-filtered prepare: this gram was never
                    # checked against the termdict — dropping it could
                    # silently lose a real vocabulary term, so refuse
                    raise ValueError(
                        f"query gram {term!r} was not in the "
                        "prepare_serving(queries=...) workload — "
                        "re-prepare with the extended query set"
                    )
                continue  # frozen vocabulary: unseen terms drop
            e = per_term.setdefault(term, dict(info, qs=[]))
            e["qs"].append({"query_id": qid, "qtf": float(qtf)})
    rows = _drop_nonpositive_queries(index, list(per_term.values()))
    if cfg.get("weighting", "bm25") == "tfidf":
        rows = _tfidf_transform_rows(rows)
    return rows


def _tfidf_raw_gammas(index) -> dict | None:
    """Per-segment norm-drift bounds {seg: (γ_lo, γ_hi)} for a tfidf
    raw index, or None when any committed segment lacks one.

    Blocks of a covered segment carry the floor-quantized encode-time
    docnorm in their dls stream (codec.DNORM_SCALE); for a live doc d,
    γ_lo·ρq(d)/S ≤ ‖d‖_now ≤ γ_hi·(ρq(d)+1)/S — what makes block-max
    WAND sound on tfidf raw storage across refreshes. Segments written
    by the pre-quantization layout have NO manifest entry (their dls
    stream holds dl, not ρq); one uncovered segment poisons the whole
    block-max plan, so the router falls back to the bulk path."""
    g = getattr(index.manifest, "dnorm_gammas", {}) or {}
    out = {}
    for s in index.manifest.segments:
        e = g.get(str(int(s["seg"])))
        if e is None:
            return None
        out[int(s["seg"])] = (float(e[0]), float(e[1]))
    return out


def _postings_for(index, rows: list) -> DataFrame:
    """Bucket- and term-pruned postings scan from collected match rows."""
    buckets = sorted({int(b) for r in rows for b in r["buckets"]})
    term_ids = sorted(int(r["term_id"]) for r in rows)
    return index.postings.filter(
        F.col("bucket").isin(buckets) & F.col("term_id").isin(term_ids)
    )


def _pruned_postings(index, qterms: DataFrame) -> DataFrame:
    """Bucket- and term-pruned postings scan (DataFrame-input variant,
    kept for plan audits; search paths use the single-collect
    :func:`_matched_terms` + :func:`_postings_for`)."""
    n_buckets = index.manifest.n_buckets
    pairs = (
        qterms.select("term_id", "n_salts")
        .distinct()
        .select(
            "term_id",
            F.explode(F.expr("sequence(0, n_salts - 1)")).alias("salt"),
        )
        .select(
            "term_id",
            F.pmod(F.xxhash64("term_id", "salt"), F.lit(n_buckets))
            .cast("int")
            .alias("bucket"),
        )
        .collect()
    )
    buckets = sorted({r["bucket"] for r in pairs})
    term_ids = sorted({r["term_id"] for r in pairs})
    return index.postings.filter(
        F.col("bucket").isin(buckets) & F.col("term_id").isin(term_ids)
    )


def _qt_df(spark, rows: list, cols: tuple, schema: str) -> DataFrame:
    """Driver→JVM transfer of the per-call query-term table through the
    Arrow path: ``createDataFrame`` over a list of tuples serializes
    row-by-row through pickle (~0.3 s per search call measured at
    1k-row qt tables); a pandas frame rides one Arrow batch (~0.1 s).
    Every search call pays this, so it is pure fixed-cost trim
    (guide §6 "Arrow for driver transfers")."""
    pdf = pd.DataFrame(rows, columns=list(cols))
    return spark.createDataFrame(pdf, schema)


def _empty_result(spark) -> DataFrame:
    return spark.createDataFrame(
        [], "query_id long, doc_id long, score double, rank int"
    )


# ---------------------------------------------------------------------------
# distributed decode-and-score
# ---------------------------------------------------------------------------
# (query_id, doc_id) packed into one int64 key for the vectorized
# combine: doc_id < 2^41 (10^12-doc design bound), query_id < 2^22.
_DOC_BITS = 41
# target expanded (query × posting) pairs per bulk decode task — sizes
# the volume-driven task count in search_distributed. Small enough
# that modest batches still fan out across a wide host (250k pairs ≈
# a few ms of numpy — worker round-trip bounded), while the 512-task
# cap keeps the task set constant (and per-task work growing) as
# workloads scale up.
_PAIRS_PER_TASK = 250_000


def _partial_scores_for_batch(
    pdf: pd.DataFrame, qmap: dict, raw_cfg, tomb_src, _packed: bool = False
) -> pd.DataFrame | tuple | None:
    """Decode one pandas batch of postings blocks ONCE, fan out to all
    matching queries via the ``{term_id: (qids[], qtfs[][, s_t])}``
    map, and pre-aggregate to per-(query, doc) partial sums. Shared by
    the bulk decode-score path (mapInPandas) and the single-scan
    unified auto path's bulk groups (applyInPandas).

    The (posting × matching-query) expansion — the irreducible work of
    exact scoring — is a handful of C-level numpy ops per TERM
    (tile/repeat/outer), the block decode is BATCHED (one concatenated
    varint pass per pandas batch, segmented by the metadata ``n``
    column — per-block decode calls were the dominant Python cost on
    large corpora), and the per-batch combine is one np.unique over
    packed (query_id, doc_id) keys. No per-block Python loops on tiny
    arrays."""
    from neural_cherche_spark.index.codec import (
        bm25_w1,
        decode_blocks_batched,
        decode_blocks_raw_batched,
    )

    mask = (1 << _DOC_BITS) - 1
    tid_col = pdf["term_id"].to_numpy(dtype=np.int64)
    matched = np.array([int(t) in qmap for t in tid_col], dtype=bool)
    if not matched.any():
        return None
    sel = np.flatnonzero(matched)
    ns = pdf["n"].to_numpy(dtype=np.int64)[sel]
    docs_bins = [pdf["docs"].iat[i] for i in sel]
    if raw_cfg is not None:
        k1, b, eps, avgdl, weighting = raw_cfg
        tfidf = weighting == "tfidf"
        d, tfv, dlv = decode_blocks_raw_batched(
            docs_bins,
            [pdf["tfs"].iat[i] for i in sel],
            [pdf["dls"].iat[i] for i in sel],
            ns,
        )
        # per-posting query-side scale s_t, fanned out per block
        st_b = np.array(
            [float(qmap[int(tid_col[i])][2]) for i in sel], dtype=np.float64
        )
        st_p = np.repeat(st_b, ns)
        if tfidf:
            # unnormalized tf·idf — the per-doc L2 norm is divided out
            # AFTER aggregation (docnorm join in search_distributed)
            w = tfv.astype(np.float64) * st_p
        else:
            # query-time weight from CURRENT stats: w1 · idf/norm
            w = bm25_w1(tfv, dlv, k1, b, avgdl, eps) * st_p
    else:
        d, w32 = decode_blocks_batched(
            docs_bins, [pdf["ws"].iat[i] for i in sel], ns
        )
        w = w32.astype(np.float64)
    tid_p = np.repeat(tid_col[sel], ns)
    if tomb_src is not None and d.size:
        # per-posting source segment → the loader reads only those
        # segments' delete sets (tombmask.py); rows without a seg
        # column fall back to the merged set
        segs = (
            np.repeat(pdf["seg"].to_numpy(dtype=np.int64)[sel], ns)
            if "seg" in pdf.columns
            else None
        )
        keep = keep_mask(tomb_src, d, segs)
        if keep is not None:
            d, w, tid_p = d[keep], w[keep], tid_p[keep]
    if d.size == 0:
        return None
    # per-term contiguous slices for the K×n expansion
    order = np.argsort(tid_p, kind="stable")
    d, w, tid_p = d[order], w[order], tid_p[order]
    bounds = np.flatnonzero(np.diff(tid_p)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [tid_p.size]))
    term_qids = [qmap[int(tid_p[s0])][0] for s0 in starts]
    term_qtfs = [qmap[int(tid_p[s0])][1] for s0 in starts]
    pairs = sum(
        q.size * (int(e0) - int(s0))
        for q, s0, e0 in zip(term_qids, starts, ends)
    )
    uq = np.unique(np.concatenate(term_qids))
    ud, dinv = np.unique(d, return_inverse=True)
    cells = uq.size * ud.size
    if 4 * pairs >= cells and cells <= 64_000_000:
        # DENSE combine — the batch-size-scaling fix: accumulate into
        # a (query-slot × local-doc) matrix instead of materializing
        # every (query, posting) pair and sorting it. Within one term
        # slice both queries and docs are UNIQUE (one posting per
        # (term, doc): blocks partition a run's docs, salt runs
        # partition a term's docs, a doc lives in one segment; one
        # qtf per (query, term)), so the fancy-index += never drops a
        # duplicate increment. O(pairs) writes + one O(cells) sweep,
        # no 16 B/pair key array, no O(pairs log pairs) sort — the
        # np.unique-over-pairs combine was 54% of scorer time and is
        # what made per-query cost GROW with batch size (512-query
        # batches: pair throughput/core 4.6× worse than 128-query).
        # Guards: density ≥ 1/4 (emission sweep stays O(pairs)) and
        # ≤ 64M cells (512 MB); sparse batches take the pair path.
        m = np.zeros((uq.size, ud.size), dtype=np.float64)
        for qi, qt, s0, e0 in zip(term_qids, term_qtfs, starts, ends):
            qslots = np.searchsorted(uq, qi)
            m[qslots[:, None], dinv[s0:e0][None, :]] += (
                qt[:, None] * w[s0:e0][None, :]
            )
        nzq, nzd = np.nonzero(m)
        # dropping exact-zero partials is exact: every contribution is
        # non-negative (eps-clamped idf, qtf ≥ 1) and the engine's
        # positive-score filter (T2) drops zero totals downstream
        sums = m[nzq, nzd]
        uk = (uq[nzq] << _DOC_BITS) | ud[nzd]
    else:
        key_parts, val_parts = [], []
        for qi, qt, s0, e0 in zip(term_qids, term_qtfs, starts, ends):
            ds, wsl = d[s0:e0], w[s0:e0]
            # K×n expansion in C: scores outer product, keys packed
            scores = (qt[:, None] * wsl[None, :]).ravel()
            keys = (
                (qi.astype(np.int64) << _DOC_BITS)[:, None] | ds[None, :]
            ).ravel()
            key_parts.append(keys)
            val_parts.append(scores)
        key = np.concatenate(key_parts)
        val = np.concatenate(val_parts)
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.bincount(inv, weights=val)
    if _packed:
        # caller (_decode_score_fn) defers the cross-batch combine:
        # per-batch unique'd packed keys bound its buffer growth
        return uk, sums
    return pd.DataFrame(
        {
            "query_id": (uk >> _DOC_BITS).astype(np.int64),
            "doc_id": (uk & mask).astype(np.int64),
            "score": sums,
        }
    )


# dense-accumulator ceiling for the block-max group scorer: groups
# whose doc-id range is below this score into a flat per-doc array
# (one bincount per chunk) instead of the sorted-merge accumulator —
# the merge (np.unique + searchsorted + insert per chunk) was ~40% of
# group scoring time on corpora where bounds cannot prune. 2^22 docs
# caps the array at 32 MB f64 + 4 MB seen-mask per in-flight group.
_DENSE_ACC_MAX_DOC = 1 << 22

# flush threshold for the cross-batch partial accumulator in
# _decode_score_fn: combine is deferred until this many (query, doc)
# pairs are buffered (~16 B/pair → ~128 MB ceiling per task), so a doc
# scored across many Arrow batches emits ONE partial per task instead
# of one per batch — per-batch emission was the dominant cost of the
# bulk path on large corpora (every 10k-block batch re-emitted its own
# copy of the hot docs).
_PARTIAL_FLUSH_PAIRS = 8_000_000


def _decode_score_fn(qmap_bc, raw_cfg=None, tomb_src=None):
    """mapInPandas over PRUNED POSTINGS ONLY: the query fan-out happens
    inside the worker via a broadcast {term_id: (qids[], qtfs[])}
    dict, so a hot block shared by Q queries is shuffled and decoded
    ONCE, not Q times (a per-query join would duplicate every
    stopword-gram block once per matching query). Scoring body shared
    with the unified auto path: :func:`_partial_scores_for_batch`.

    Partials are accumulated ACROSS the task's Arrow batches (packed
    int64 keys) and combined once per ~:data:`_PARTIAL_FLUSH_PAIRS`
    buffered pairs — the map-side combine the downstream
    groupBy(query_id, doc_id).sum relies on to stay small."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qmap = qmap_bc.value
        mask = (1 << _DOC_BITS) - 1
        key_buf: list[np.ndarray] = []
        val_buf: list[np.ndarray] = []
        buffered = 0

        def combined() -> pd.DataFrame:
            key = np.concatenate(key_buf)
            val = np.concatenate(val_buf)
            uk, inv = np.unique(key, return_inverse=True)
            sums = np.bincount(inv, weights=val)
            return pd.DataFrame(
                {
                    "query_id": (uk >> _DOC_BITS).astype(np.int64),
                    "doc_id": (uk & mask).astype(np.int64),
                    "score": sums,
                }
            )

        for pdf in batches:
            if pdf.empty:
                continue
            out = _partial_scores_for_batch(
                pdf, qmap, raw_cfg, tomb_src, _packed=True
            )
            if out is None:
                continue
            key_buf.append(out[0])
            val_buf.append(out[1])
            buffered += out[0].size
            if buffered >= _PARTIAL_FLUSH_PAIRS:
                yield combined()
                key_buf, val_buf, buffered = [], [], 0
        if key_buf:
            yield combined()

    return run


def _local_topk_fn(k: int):
    """Partition-local exact top-k per query over final (query, doc,
    score) rows — the map-side cut before the global rank window.
    After the (query_id, doc_id) aggregation every pair is globally
    unique, so the union of per-partition top-k is a superset of the
    global top-k: the window's sort input shrinks from the full
    candidate set (25.6M rows on the 100k-doc/256-query probe) to
    ≤ partitions·queries·k rows. Tie-break matches the window exactly
    (score desc, doc_id asc)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [p for p in batches if not p.empty]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        order = np.lexsort(
            (pdf["doc_id"].to_numpy(), -pdf["score"].to_numpy())
        )
        pdf = pdf.iloc[order]
        yield pdf.groupby("query_id", sort=False).head(k)

    return run


def search_distributed(
    index, queries: DataFrame, k: int = 10, _rows: list | None = None
) -> DataFrame:
    rows = _matched_terms(index, queries) if _rows is None else _rows
    if not rows:
        return _empty_result(index.spark)
    cfgm = index.manifest.cfg
    raw = cfgm.get("storage", "weights") == "raw"
    tfidf_raw = raw and cfgm.get("weighting", "bm25") == "tfidf"
    if raw:
        raw_cfg = (
            float(cfgm["k1"]), float(cfgm["b"]),
            float(cfgm["epsilon"]), float(index.manifest.avgdl),
            cfgm.get("weighting", "bm25"),
        )
        qmap = {
            int(r["term_id"]): (
                np.array([int(q["query_id"]) for q in r["qs"]], dtype=np.int64),
                np.array([float(q["qtf"]) for q in r["qs"]], dtype=np.float64),
                # bm25: s_t = idf/term_norm; tfidf: term_norm ≡ 1.0 so
                # this is idf — the doc-side weight before the per-doc
                # norm division applied after aggregation
                float(r["idf"]) / float(r["term_norm"]),
            )
            for r in rows
        }
        # seg rides along for per-segment tombstone loads (tombmask.py)
        cols = ("term_id", "n", "first_doc", "docs", "tfs", "dls", "seg")
    else:
        raw_cfg = None
        qmap = {
            int(r["term_id"]): (
                np.array([int(q["query_id"]) for q in r["qs"]], dtype=np.int64),
                np.array([float(q["qtf"]) for q in r["qs"]], dtype=np.float64),
            )
            for r in rows
        }
        cols = ("term_id", "n", "first_doc", "docs", "ws")
    sc = index.spark.sparkContext
    qmap_bc = sc.broadcast(qmap)
    # coalesce (no shuffle) to a VOLUME-driven task count — tasks
    # follow data splits, as on a real cluster, NOT the executor
    # count. Each decode task emits one partial per unique (query,
    # doc) pair it touches, so partial duplication across tasks — the
    # map-side-combine tradeoff — grows with task count. Sizing tasks
    # by matched work (Σ df·|qs| expanded pairs, known from the match
    # rows — no extra job) keeps the task set, and therefore the
    # duplication, IDENTICAL as the fleet grows: a 4× fleet runs the
    # same tasks 4× wider instead of splitting the same work into 4×
    # the partials (round-2 study: slot-driven tasks gave 0.31
    # N→4N efficiency at small volume). The 512 cap bounds per-task
    # scheduling overhead; workloads big enough to hit it have
    # per-task work that dwarfs duplication anyway.
    vol = sum(int(r["df"]) * len(r["qs"]) for r in rows)
    n_tasks = max(1, min((vol + _PAIRS_PER_TASK - 1) // _PAIRS_PER_TASK, 512))
    tomb_src = (
        index._tomb_src() if hasattr(index, "_tomb_src") else None
    )
    scan = _postings_for(index, rows).select(*cols)
    # coalesce can only REDUCE partition count: a compact index whose
    # pruned scan has fewer file splits than the volume-driven task
    # count would otherwise run the whole decode on a few cores (on a
    # 100k-doc/500 MB index the scan is ~8 splits — the decode stage
    # ran 8-wide on 32 cores). When the scan is narrower than the
    # target, one round-robin shuffle of the pruned block rows buys
    # full width — small against the decode+expand work it parallelizes
    # (and the volume-driven task count, the r2 scaling property, is
    # preserved either way).
    natural = scan.rdd.getNumPartitions()
    if natural >= n_tasks:
        # wide scan (the 100 TB shape: thousands of file splits >
        # the 512-task cap): coalesce is shuffle-FREE — block bytes
        # never move, each task streams its splits through the
        # flush-accumulated decode
        scan = scan.coalesce(int(n_tasks))
        partial = scan.mapInPandas(
            _decode_score_fn(qmap_bc, raw_cfg, tomb_src), _SCORE_SCHEMA
        )
    else:
        # narrow scan (compact index, few splits): full width needs a
        # shuffle anyway, so shuffle into DOC-REGION groups
        # (first_doc >> 8) and score each group as ONE pandas frame —
        # blocks of DIFFERENT terms covering the same docs land in
        # the same group, so a doc scored by T matched terms emits ~1
        # partial instead of T (the 409M-row emission was the
        # dominant wall of this path), and the single-frame combine
        # beats the per-Arrow-batch accumulate of mapInPandas
        # (measured 33.3→24.5 s decode, 52.4→31.4 s through the
        # groupBy on the 100k-doc/128-query probe). Same key as the
        # unified auto path's bulk groups.
        fn = _bmw_group_fn(
            k, raw_cfg, tomb_src=tomb_src, bulk_qmap_bc=qmap_bc
        )
        partial = (
            scan.withColumn("query_id", F.lit(-1).cast("long"))
            .withColumn(
                "grp",
                F.pmod(
                    F.xxhash64(F.shiftright(F.col("first_doc"), 8)),
                    F.lit(int(n_tasks)),
                ).cast("int"),
            )
            .groupBy("query_id", "grp")
            .applyInPandas(fn, _SCORE_SCHEMA)
        )
    scored = partial.groupBy("query_id", "doc_id").agg(
        F.sum("score").alias("score")
    )
    if tfidf_raw:
        # cosine normalization factors out of the per-term sum:
        # score = (Σ_t qw·tf·idf) / ‖d‖ — so the per-doc norm joins
        # against the (already aggregated, query-bounded) CANDIDATE
        # set, never against the postings. Doc-keyed equi-join; the
        # docnorm side is (doc_id, dnorm) scalars.
        scored = (
            scored.join(index.docnorm, "doc_id")
            .withColumn("score", F.col("score") / F.col("dnorm"))
            .select("query_id", "doc_id", "score")
        )
    scored = scored.filter(F.col("score") > 0).mapInPandas(
        _local_topk_fn(k), _SCORE_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# block-max pruned per-query scoring
# ---------------------------------------------------------------------------
def _run_suffix_bounds(run_key: np.ndarray, ub: np.ndarray) -> np.ndarray:
    """Tight unseen-doc upper bounds for every suffix of a block order.

    Blocks are given in descending-ub processing order; ``run_key[i]``
    identifies the (term_id, salt) run of the i-th block. A doc appears
    in at most ONE block per run, so the best score any unseen doc can
    still reach from blocks i..end is Σ over runs of the MAX remaining
    block ub of that run — NOT the sum over all remaining blocks (the
    round-1 bound, looser by ~blocks-per-run).

    Returns ``bound`` of length n+1 with ``bound[i]`` = that per-run
    suffix-max sum for blocks i..end (``bound[n] == 0``). Vectorized:
    each block contributes its ub exactly on the suffix positions where
    it is the first remaining block of its run — the interval
    (prev_same_run_pos, own_pos] — accumulated via a difference array.
    """
    n = run_key.size
    bound = np.zeros(n + 1, dtype=np.float64)
    if n == 0:
        return bound
    # prev[i] = position of the previous block of the same run (or -1)
    by_run = np.lexsort((np.arange(n), run_key))
    prev = np.full(n, -1, dtype=np.int64)
    same = run_key[by_run][1:] == run_key[by_run][:-1]
    prev[by_run[1:][same]] = by_run[:-1][same]
    diff = np.zeros(n + 1, dtype=np.float64)
    np.add.at(diff, prev + 1, ub)
    np.add.at(diff, np.arange(1, n + 1), -ub)
    np.cumsum(diff[:-1], out=bound[:-1])
    return bound


def _run_suffix_bounds_signed(
    run_key: np.ndarray, ub_pos: np.ndarray, neg: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Signed twin of :func:`_run_suffix_bounds` for indexes with
    NEGATIVE weights (reference idf goes negative whenever
    tf_total > N — routine on webtext, bm25.py:185-190).

    For blocks i..end (processing order), a doc gains at most
    ``pos_bound[i]`` = Σ over runs of max(0, best remaining block ub)
    and loses at most ``neg_bound[i]`` = Σ over runs of
    min(0, worst remaining block lb).

    Vectorized (the per-block Python loop here was ~7% of serving-tier
    query wall at ~12k blocks/query): the positive side is exactly
    :func:`_run_suffix_bounds` (ub_pos ≥ 0 and within-run
    non-increasing along the descending-ub processing order, so "best
    remaining" = "first remaining"); the negative side telescopes the
    per-run suffix minima — ``neg_bound[i] = Σ_{j≥i} (m_j − m_next(j))``
    where ``m_j = min(0, per-run suffix min at j)`` and ``m_next(j)``
    is the same at the run's next block (0 past the last) — one
    groupwise reversed cummin (pandas, C-level) + one cumsum.
    """
    n = run_key.size
    pos_bound = _run_suffix_bounds(run_key, ub_pos)
    neg_bound = np.zeros(n + 1, dtype=np.float64)
    if n == 0:
        return pos_bound, neg_bound
    idx = np.arange(n)
    by_desc = np.lexsort((-idx, run_key))  # runs grouped, position desc
    sufmin = np.empty(n, dtype=np.float64)
    sufmin[by_desc] = (
        pd.Series(neg[by_desc])
        .groupby(pd.Series(run_key[by_desc]), sort=False)
        .cummin()
        .to_numpy()
    )
    by_asc = np.lexsort((idx, run_key))
    nxt = np.full(n, -1, dtype=np.int64)
    same = run_key[by_asc][1:] == run_key[by_asc][:-1]
    nxt[by_asc[:-1][same]] = by_asc[1:][same]
    m_here = np.minimum(sufmin, 0.0)
    m_next = np.where(
        nxt >= 0, np.minimum(sufmin[np.maximum(nxt, 0)], 0.0), 0.0
    )
    delta = m_here - m_next
    neg_bound[:-1] = np.cumsum(delta[::-1])[::-1]
    return pos_bound, neg_bound


def _assemble_decoded(idx, ns, dec_cols, decode_uncached):
    """Per-posting arrays for the blocks in ``idx`` order, taking each
    block's arrays from the frame's pre-decoded object columns where
    present (the serving tier's hot-term cache, serve.LocalSearcher
    ``_decoded``) and ONE batched codec decode for the rest. Values
    are identical to decoding everything — the cache holds exactly
    the codec's output per block."""
    first = dec_cols[0]
    cached = np.fromiter(
        (isinstance(first[i], np.ndarray) for i in idx),
        dtype=bool,
        count=idx.size,
    )
    if cached.all():
        return tuple(
            np.concatenate([c[i] for i in idx]) for c in dec_cols
        )
    if not cached.any():
        return decode_uncached(idx)
    unc = idx[~cached]
    dec = decode_uncached(unc)
    splits = np.cumsum(ns[~cached])[:-1]
    parts = [np.split(a, splits) for a in dec]
    out = []
    for k, c in enumerate(dec_cols):
        pieces, u = [], 0
        for j, i in enumerate(idx):
            if cached[j]:
                pieces.append(c[i])
            else:
                pieces.append(parts[k][u])
                u += 1
        out.append(np.concatenate(pieces))
    return tuple(out)


def _bmw_group_fn(
    k: int,
    raw_cfg: tuple | None = None,
    _stats: dict | None = None,
    tomb_src: str | None = None,
    bulk_qmap_bc=None,
):
    """One (query_id, subgroup) group: block-max pruned exact top-k.

    When ``bulk_qmap_bc`` is set (single-scan unified auto path),
    groups keyed by the sentinel ``query_id == -1`` carry the HEAVY
    queries' blocks: they are decoded once and fanned out to all heavy
    queries via the broadcast map, emitting per-(query, doc) PARTIAL
    sums (exactness restored by the downstream groupBy-sum) — the same
    scoring body as the distributed path, running inside the same
    grouped stage as the selective queries' block-max top-k.

    Pruning is sound under NEGATIVE weights (sign-split bounds):
    unseen docs are bounded by the per-run positive suffix maxima;
    candidates' final scores are lower-bounded via the per-run
    negative suffix minima, so θ_low = (k-th partial) + neg_bound is a
    certified lower bound on the final k-th score even though partial
    sums can still fall. Once pos_bound < θ_low, the remaining blocks
    are decoded ONLY where their [first_doc, last_doc] range contains
    a surviving candidate — stopword-gram mega-runs (always negative
    under reference idf on webtext) are mostly range-skipped without
    decoding.

    The accumulator is a sorted-merge (searchsorted + insert) instead
    of re-running np.unique over the growing accumulator each chunk —
    per-chunk cost is O(chunk log chunk + |acc|) memcpy, not
    O(|acc| log |acc|) sort (round-1 NOTES #1).
    """

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from neural_cherche_spark.index.codec import (
            bm25_w1,
            decode_blocks_batched,
            decode_blocks_raw_batched,
            doc_salt,
        )

        qid = int(pdf["query_id"].iloc[0])
        if qid == -1:
            # bulk group (unified auto): decode once, broadcast fan-out
            out = _partial_scores_for_batch(
                pdf, bulk_qmap_bc.value, raw_cfg, tomb_src
            )
            if out is None:
                return pd.DataFrame(columns=["query_id", "doc_id", "score"])
            return out
        grp = int(pdf["grp"].iloc[0])
        n_groups = int(pdf["n_groups"].iloc[0])
        qtf = pdf["qtf"].to_numpy(dtype=np.float64)
        ub_pos = np.maximum(qtf * pdf["max_w"].to_numpy(dtype=np.float64), 0.0)
        neg = np.minimum(qtf * pdf["min_w"].to_numpy(dtype=np.float64), 0.0)
        first_doc = pdf["first_doc"].to_numpy(dtype=np.int64)
        last_doc = pdf["last_doc"].to_numpy(dtype=np.int64)

        order = np.argsort(-ub_pos, kind="mergesort")
        # no block can contribute positively → every final score ≤ 0 →
        # the positive-score filter empties the result; skip all decode
        if ub_pos[order[0]] <= 0.0:
            return pd.DataFrame(columns=["query_id", "doc_id", "score"])
        docs_col = pdf["docs"].to_numpy()
        n_col = pdf["n"].to_numpy(dtype=np.int64)
        seg_col = (
            pdf["seg"].to_numpy(dtype=np.int64)
            if "seg" in pdf.columns
            else None
        )
        tfidf = raw_cfg is not None and raw_cfg[4] == "tfidf"
        if raw_cfg is not None:
            k1, b, eps, avgdl = raw_cfg[:4]
            tfs_col = pdf["tfs"].to_numpy()
            dls_col = pdf["dls"].to_numpy()
            s_t = pdf["s_t"].to_numpy(dtype=np.float64)
            if tfidf:
                from neural_cherche_spark.index.codec import DNORM_SCALE

                # per-block drift-scaled norm factors: the dls stream
                # holds the quantized encode-time docnorm ρq, so for a
                # live doc d, ρq·glo ≤ ‖d‖_now ≤ (ρq+1)·ghi (search_bmw
                # applied the f64 margins to the γ factors; the
                # quantization scale divides out here)
                glo = pdf["glo"].to_numpy(dtype=np.float64) / DNORM_SCALE
                ghi = pdf["ghi"].to_numpy(dtype=np.float64) / DNORM_SCALE
        else:
            ws_col = pdf["ws"].to_numpy()
        # serving hot-term cache: frames from serve.LocalSearcher may
        # carry pre-decoded per-block arrays (object columns); cluster
        # frames never do, so dd_col None keeps that path byte-identical
        dd_col = pdf["__dd"].to_numpy() if "__dd" in pdf.columns else None
        if dd_col is not None:
            if raw_cfg is not None:
                dec_cols = (
                    dd_col,
                    pdf["__dtf"].to_numpy(),
                    pdf["__ddl"].to_numpy(),
                )
            else:
                dec_cols = (dd_col, pdf["__dw"].to_numpy())
        # run key: salt < 2^20 (cap 1024), term_id < 2^40 → fits int64
        run_key = (
            pdf["term_id"].to_numpy(dtype=np.int64) << np.int64(20)
        ) | pdf["salt"].to_numpy(dtype=np.int64)
        if (neg < 0).any():
            suffix_pos, suffix_neg = _run_suffix_bounds_signed(
                run_key[order], ub_pos[order], neg[order]
            )
        else:
            suffix_pos = _run_suffix_bounds(run_key[order], ub_pos[order])
            suffix_neg = np.zeros_like(suffix_pos)

        acc_d = np.empty(0, dtype=np.int64)
        acc_s = np.empty(0, dtype=np.float64)
        # tfidf only: per-candidate norm lower/upper bounds (a doc's ρq
        # is identical in every block that contains it — one value per
        # doc, captured at first sight)
        acc_lo = np.empty(0, dtype=np.float64)
        acc_hi = np.empty(0, dtype=np.float64)

        def decode_chunk(idx_list, doc_filter=None):
            """Decode a CHUNK of blocks in one batched pass: varint
            streams concatenate (self-delimiting), doc-id cumsums are
            segmented by the metadata ``n`` column, and every
            per-posting factor fans out via one np.repeat — a group
            with 10^4 blocks previously paid ~100 µs of small-array
            numpy overhead PER BLOCK in this loop (the dominant
            large-corpus query cost once bounds can't prune)."""
            idx = np.asarray(idx_list, dtype=np.int64)
            if doc_filter is not None and idx.size:
                # vectorized range skip: keep only blocks whose
                # [first_doc, last_doc] range can contain a candidate
                lo = np.searchsorted(doc_filter, first_doc[idx])
                ok = lo < doc_filter.size
                ok[ok] = doc_filter[lo[ok]] <= last_doc[idx[ok]]
                idx = idx[ok]
            if idx.size == 0:
                return [], [], [], []
            if _stats is not None:
                _stats["decoded"] = _stats.get("decoded", 0) + int(idx.size)
            ns = n_col[idx]
            nlo = nhi = None
            if raw_cfg is not None:
                if dd_col is not None:
                    d, tfv, dlv = _assemble_decoded(
                        idx,
                        ns,
                        dec_cols,
                        lambda u: decode_blocks_raw_batched(
                            [docs_col[i] for i in u],
                            [tfs_col[i] for i in u],
                            [dls_col[i] for i in u],
                            n_col[u],
                        ),
                    )
                else:
                    d, tfv, dlv = decode_blocks_raw_batched(
                        [docs_col[i] for i in idx],
                        [tfs_col[i] for i in idx],
                        [dls_col[i] for i in idx],
                        ns,
                    )
                bi = np.repeat(idx, ns)  # source block per posting
                if tfidf:
                    # UNNORMALIZED tf·idf contribution — the exact
                    # cosine divides by the CURRENT ‖d‖ after the
                    # grouped stage (docnorm join in search_bmw);
                    # dlv is the quantized encode-time norm ρq
                    w = tfv.astype(np.float64) * s_t[bi]
                    nlo = dlv * glo[bi]
                    nhi = (dlv + 1.0) * ghi[bi]
                else:
                    # query-time weight from CURRENT stats (raw
                    # blocks are immutable under collection growth)
                    w = bm25_w1(tfv, dlv, k1, b, avgdl, eps) * s_t[bi]
            else:
                if dd_col is not None:
                    d, w32 = _assemble_decoded(
                        idx,
                        ns,
                        dec_cols,
                        lambda u: decode_blocks_batched(
                            [docs_col[i] for i in u],
                            [ws_col[i] for i in u],
                            n_col[u],
                        ),
                    )
                else:
                    d, w32 = decode_blocks_batched(
                        [docs_col[i] for i in idx],
                        [ws_col[i] for i in idx],
                        ns,
                    )
                bi = np.repeat(idx, ns)
                w = w32.astype(np.float64)
            w = w * qtf[bi]
            if tomb_src is not None and d.size:
                # deleted docs are masked BEFORE top-k selection:
                # block bounds still include them (sound upper
                # bounds, just looser until compact()). Per-posting
                # source seg → the loader reads only those segments'
                # delete sets (tombmask.py)
                m = keep_mask(
                    tomb_src,
                    d,
                    seg_col[bi] if seg_col is not None else None,
                )
                if m is not None:
                    d, w = d[m], w[m]
                    if nlo is not None:
                        nlo, nhi = nlo[m], nhi[m]
            if n_groups > 1:
                # subgroup ownership: this group scores ONLY its own
                # doc shard (blocks of low-salt terms are replicated
                # across subgroups; each keeps a disjoint doc subset)
                m = doc_salt(d, n_groups) == grp
                d, w = d[m], w[m]
                if nlo is not None:
                    nlo, nhi = nlo[m], nhi[m]
            if doc_filter is not None and d.size:
                # exact membership via searchsorted (d has cross-run
                # duplicates, so isin(assume_unique) would be unsound)
                p = np.searchsorted(doc_filter, d)
                m = p < doc_filter.size
                m[m] = doc_filter[p[m]] == d[m]
                d, w = d[m], w[m]
                if nlo is not None:
                    nlo, nhi = nlo[m], nhi[m]
            if d.size == 0:
                return [], [], [], []
            return (
                [d],
                [w],
                [nlo] if nlo is not None else [],
                [nhi] if nhi is not None else [],
            )

        def merge(dl, sl, lol, hil):
            nonlocal acc_d, acc_s, acc_lo, acc_hi
            if not dl:
                return
            nd = np.concatenate(dl)
            uniq, inv = np.unique(nd, return_inverse=True)
            sums = np.bincount(inv, weights=np.concatenate(sl))
            if tfidf:
                # scatter (last write wins — per-doc values identical)
                lo_u = np.empty(uniq.size, dtype=np.float64)
                hi_u = np.empty(uniq.size, dtype=np.float64)
                lo_u[inv] = np.concatenate(lol)
                hi_u[inv] = np.concatenate(hil)
            if acc_d.size == 0:
                acc_d, acc_s = uniq, sums
                if tfidf:
                    acc_lo, acc_hi = lo_u, hi_u
                return
            pos = np.searchsorted(acc_d, uniq)
            hit = np.zeros(uniq.size, dtype=bool)
            inr = pos < acc_d.size
            hit[inr] = acc_d[pos[inr]] == uniq[inr]
            acc_s[pos[hit]] += sums[hit]
            miss = ~hit
            if miss.any():
                acc_d = np.insert(acc_d, pos[miss], uniq[miss])
                acc_s = np.insert(acc_s, pos[miss], sums[miss])
                if tfidf:
                    acc_lo = np.insert(acc_lo, pos[miss], lo_u[miss])
                    acc_hi = np.insert(acc_hi, pos[miss], hi_u[miss])

        # adaptive schedule: small early chunks → earlier termination
        # checks exactly where descending-ub mass is front-loaded
        # (skewed groups prune after a handful of blocks); geometric
        # growth caps per-check numpy overhead on uniform groups at a
        # constant factor of the work that was unavoidable anyway.
        chunk = max(32, k)
        pos = 0
        # dense fast path (non-tfidf, bounded doc range): a flat per-doc
        # score array replaces the sorted-merge accumulator — one
        # bincount per chunk, no unique/searchsorted/insert. Same
        # values summed per doc (f64 addition order differs below
        # rounding granularity); same bounds, same early termination,
        # same tie-break cut.
        use_dense = (
            not tfidf
            and last_doc.size > 0
            and int(last_doc.max()) < _DENSE_ACC_MAX_DOC
        )
        if use_dense:
            size = int(last_doc.max()) + 1
            dacc = np.zeros(size, dtype=np.float64)
            dseen = np.zeros(size, dtype=bool)

            def dmerge(dl, sl, _lol, _hil):
                if not dl:
                    return
                nd = np.concatenate(dl)
                np.add(
                    dacc,
                    np.bincount(
                        nd, weights=np.concatenate(sl), minlength=size
                    ),
                    out=dacc,
                )
                dseen[nd] = True

            while pos < order.size:
                dmerge(*decode_chunk(order[pos : pos + chunk]))
                pos += chunk
                chunk = min(chunk * 2, 4096)
                if pos < order.size:
                    seen_scores = dacc[dseen]
                    if seen_scores.size < k:
                        continue
                    theta_low = (
                        np.partition(seen_scores, -k)[-k]
                        + float(suffix_neg[pos])
                    )
                    remaining_ub = float(suffix_pos[pos])
                    if remaining_ub < theta_low:
                        cand = np.flatnonzero(
                            dseen & (dacc + remaining_ub >= theta_low)
                        )
                        dmerge(*decode_chunk(order[pos:], doc_filter=cand))
                        break
            uniq = np.flatnonzero(dseen)
            sums = dacc[uniq]
        else:
            while pos < order.size:
                merge(*decode_chunk(order[pos : pos + chunk]))
                pos += chunk
                chunk = min(chunk * 2, 4096)
                if acc_d.size >= k and pos < order.size:
                    if tfidf:
                        # θ_low: k-th best certified NORMALIZED lower
                        # bound (partial sums only grow — contributions
                        # are nonnegative — and ‖d‖ ≤ acc_hi); suffix
                        # bounds are already in normalized score space
                        theta_low = float(
                            np.partition(acc_s / acc_hi, -k)[-k]
                        )
                        remaining_ub = float(suffix_pos[pos])
                        if remaining_ub < theta_low:
                            cand = acc_d[
                                acc_s / acc_lo + remaining_ub >= theta_low
                            ]
                            merge(
                                *decode_chunk(order[pos:], doc_filter=cand)
                            )
                            break
                        continue
                    # θ_low: ≥ k docs end with final score ≥ θ_low
                    # (their partials can drop at most suffix_neg from
                    # here on)
                    theta_low = (
                        np.partition(acc_s, -k)[-k] + float(suffix_neg[pos])
                    )
                    remaining_ub = float(suffix_pos[pos])
                    if remaining_ub < theta_low:
                        # no unseen doc can reach the final top-k;
                        # finish exact scores for surviving candidates
                        cand = acc_d[acc_s + remaining_ub >= theta_low]
                        merge(*decode_chunk(order[pos:], doc_filter=cand))
                        break
            uniq, sums = acc_d, acc_s
        pos_mask = sums > 0
        uniq, sums = uniq[pos_mask], sums[pos_mask]
        if uniq.size == 0:
            return pd.DataFrame(columns=["query_id", "doc_id", "score"])
        if tfidf:
            # emit an UNNORMALIZED candidate superset: every doc whose
            # upper bound reaches the k-th certified lower bound. Docs
            # early-termination left with stale partials rank strictly
            # below the fully-decoded true top-k after the exact
            # docnorm division in search_bmw, so the final window never
            # promotes them — emission inflation, not error.
            lo_m, hi_m = acc_lo[pos_mask], acc_hi[pos_mask]
            if uniq.size > k:
                theta = float(np.partition(sums / hi_m, -k)[-k])
                keep = sums / lo_m >= theta
                uniq, sums = uniq[keep], sums[keep]
            return pd.DataFrame(
                {"query_id": qid, "doc_id": uniq, "score": sums}
            )
        if uniq.size > k:
            # deterministic cut: score desc, doc_id asc — must match the
            # exact path's tie-break so rank-identity holds under ties
            cut = np.lexsort((uniq, -sums))[:k]
            uniq, sums = uniq[cut], sums[cut]
        return pd.DataFrame(
            {"query_id": qid, "doc_id": uniq, "score": sums}
        )

    return score_group


def search_bmw(
    index,
    queries: DataFrame,
    k: int = 10,
    _rows: list | None = None,
    subgroup_cap: int = 32,
    _heavy_rows: list | None = None,
) -> DataFrame:
    """Block-max pruned top-k with heavy-group salt sharding.

    ``_heavy_rows`` (internal, set by :func:`search_auto`): match rows
    of HEAVY queries to score through the bulk decode-fan-out path
    INSIDE the same single postings scan and grouped stage — each heavy
    term contributes one sentinel ``query_id = -1`` entry to the
    broadcast qt, its blocks land in volume-sized bulk groups
    (hash(term, salt, block) mod m_bulk), and the grouped scorer
    branches (see :func:`_bmw_group_fn`). The selective top-k rows pass
    unchanged through the final per-(query, doc) sum (their (query,
    doc) keys are unique across doc-disjoint subgroups), so one
    agg + window finishes both sides — one scan, one shuffle-group
    stage, one job, instead of r4's two full per-side search plans.

    Per-query parallelism: a query whose matched terms include salted
    head grams is split into ``n_groups = min(max(n_salts),
    subgroup_cap)`` subgroups, one per doc shard (codec.doc_salt
    residue; all powers of two). Block → subgroup mapping:

    * term with n_salts ≤ n_groups: block (t, j) serves the subgroups
      g ≡ j (mod n_salts) — low-salt (rare) terms replicate across
      subgroups but are tiny by construction;
    * term with n_salts > n_groups (a stopword gram salted finer than
      the split): block (t, j) maps to EXACTLY one subgroup
      g = j mod n_groups (its docs all share that residue) — the cap
      bounds per-query fan-out so one 1024-salt gram in an otherwise
      selective query can't multiply the rare-term decode work.

    Each subgroup computes EXACT scores for its disjoint doc shard, so
    the union of per-subgroup top-ks contains the global top-k.
    """
    if not getattr(index, "salt_layout_ok", True):
        raise ValueError(
            "index predates the codec.doc_salt layout (manifest version "
            f"{index.manifest.version}): the subgroup split would drop "
            "salted-term docs — rebuild the index or use mode='distributed'"
        )
    if subgroup_cap < 1:
        raise ValueError(f"subgroup_cap must be >= 1, got {subgroup_cap}")
    # the doc-disjointness proof requires n_groups | n_salts whenever
    # n_salts > n_groups — both must be powers of two. n_salts is by
    # construction; round the cap down to one (ADVICE r2).
    subgroup_cap = 1 << (subgroup_cap.bit_length() - 1)
    tfidf_raw = (
        index.manifest.cfg.get("storage", "weights") == "raw"
        and index.manifest.cfg.get("weighting", "bm25") == "tfidf"
    )
    gammas = _tfidf_raw_gammas(index) if tfidf_raw else None
    if tfidf_raw and gammas is None:
        # pre-quantization segments: their dls stream holds dl, not the
        # quantized docnorm — block bounds are unsound there, bulk path
        return search_distributed(index, queries, k, _rows=_rows)
    rows = _matched_terms(index, queries) if _rows is None else _rows
    heavy = _heavy_rows or None
    if not rows and heavy:
        return search_distributed(index, queries, k, _rows=heavy)
    if not rows:
        return _empty_result(index.spark)
    # the subgroup split parallelizes ONE query across executors by
    # doc shard, at the price of replicating every low-salt term's
    # blocks into each subgroup (extra shuffle bytes + extra decode).
    # When the BATCH already fills the fleet — at least one query per
    # scheduling slot — that trade is pure loss, so the split turns
    # off and each query scores as one group (results identical: each
    # subgroup is exact over a disjoint doc shard, and tests pin
    # rank-equality across subgroup_cap settings).
    n_q = len({int(q["query_id"]) for r in rows for q in r["qs"]})
    parts = max(
        int(index.spark.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )
    if n_q >= parts:
        subgroup_cap = 1
    n_groups_by_q: dict[int, int] = {}
    for r in rows:
        for q in r["qs"]:
            qid = int(q["query_id"])
            n_groups_by_q[qid] = max(
                n_groups_by_q.get(qid, 1),
                min(int(r["n_salts"]), subgroup_cap),
            )
    m_bulk = 0
    if heavy:
        # bulk-group count sized by matched heavy volume — same
        # task-count policy as search_distributed (constant task set
        # as the fleet grows; see the comment there)
        vol_h = sum(int(r["df"]) * len(r["qs"]) for r in heavy)
        m_bulk = max(
            1, min((vol_h + _PAIRS_PER_TASK - 1) // _PAIRS_PER_TASK, 512)
        )
    raw = index.manifest.cfg.get("storage", "weights") == "raw"
    if raw:
        # raw blocks: n_salts comes from the postings ROW (segments of
        # a delta-grown index may use different — monotonically grown —
        # per-term salt layouts); the termdict value used for
        # n_groups_by_q above is their maximum. qt carries the
        # query-time per-term scale s_t = idf/term_norm.
        cfgm = index.manifest.cfg
        raw_cfg = (
            float(cfgm["k1"]), float(cfgm["b"]),
            float(cfgm["epsilon"]), float(index.manifest.avgdl),
            cfgm.get("weighting", "bm25"),
        )
        qt_rows = [
            (
                int(r["term_id"]),
                int(q["query_id"]),
                float(q["qtf"]),
                n_groups_by_q[int(q["query_id"])],
                float(r["idf"]) / float(r["term_norm"]),
            )
            for r in rows
            for q in r["qs"]
        ]
        if heavy:
            # one sentinel row per heavy-matched term: routes the
            # term's blocks (once) into the bulk groups
            qt_rows += [
                (int(r["term_id"]), -1, 0.0, 1, 0.0) for r in heavy
            ]
        qt = _qt_df(
            index.spark,
            qt_rows,
            ("term_id", "query_id", "qtf", "n_groups", "s_t"),
            "term_id long, query_id long, qtf double, n_groups int, s_t double",
        )
        k1, b, eps, avgdl = raw_cfg[:4]

        def w1(tf_col, dl_col):
            # SAME evaluation tree as codec.bm25_w1 (monotone in tf ↑,
            # dl ↓); the 1e-9 relative margin absorbs any cross-runtime
            # ulp noise so the bounds stay sound without bit-matching
            return (
                tf_col * (k1 + 1.0)
                / (tf_col + k1 * (1.0 - b + b * dl_col / avgdl))
                + eps
            )

        if tfidf_raw:
            # tfidf raw: the dls stream holds quantized encode-time
            # docnorms ρq (codec.DNORM_SCALE); for any LIVE doc d in a
            # block, ‖d‖_now ≥ γ_lo·min_ρq/S — so the NORMALIZED block
            # bound is s_t·max_tf·S/(min_ρq·γ_lo). All contributions
            # are nonnegative (idf > 0, query weights ≥ 0): min_w ≡ 0.
            # The γ margins (1∓1e-9) absorb f64 division noise from
            # the refresh-time drift-factor job.
            from neural_cherche_spark.index.codec import DNORM_SCALE

            gmap_lo = F.create_map(
                *[
                    F.lit(v)
                    for s, (lo, hi) in gammas.items()
                    for v in (s, lo * (1.0 - 1e-9))
                ]
            )
            gmap_hi = F.create_map(
                *[
                    F.lit(v)
                    for s, (lo, hi) in gammas.items()
                    for v in (s, hi * (1.0 + 1e-9))
                ]
            )
            joined = (
                _postings_for(index, rows + (heavy or []))
                .join(F.broadcast(qt), "term_id")
                .withColumn(
                    "glo", F.element_at(gmap_lo, F.col("seg").cast("int"))
                )
                .withColumn(
                    "ghi", F.element_at(gmap_hi, F.col("seg").cast("int"))
                )
                .withColumn(
                    "max_w",
                    F.col("s_t")
                    * F.col("max_tf").cast("double")
                    * F.lit(float(DNORM_SCALE))
                    / (F.col("min_dl").cast("double") * F.col("glo")),
                )
                .withColumn("min_w", F.lit(0.0))
            )
            group_cols = [
                "query_id", "grp", "n_groups", "term_id", "salt", "n",
                "qtf", "s_t", "max_w", "min_w", "glo", "ghi",
                "first_doc", "last_doc", "docs", "tfs", "dls", "seg",
            ]
        else:
            w1_hi = (
                w1(
                    F.col("max_tf").cast("double"),
                    F.col("min_dl").cast("double"),
                )
                * (1.0 + 1e-9) + 1e-12
            )
            w1_lo = F.greatest(
                F.lit(0.0),
                w1(
                    F.col("min_tf").cast("double"),
                    F.col("max_dl").cast("double"),
                )
                * (1.0 - 1e-9) - 1e-12,
            )
            joined = (
                _postings_for(index, rows + (heavy or []))
                .join(F.broadcast(qt), "term_id")
                .withColumn(
                    "max_w",
                    F.when(
                        F.col("s_t") >= 0, F.col("s_t") * w1_hi
                    ).otherwise(F.col("s_t") * w1_lo),
                )
                .withColumn(
                    "min_w",
                    F.when(
                        F.col("s_t") >= 0, F.col("s_t") * w1_lo
                    ).otherwise(F.col("s_t") * w1_hi),
                )
            )
            group_cols = [
                "query_id", "grp", "n_groups", "term_id", "salt", "n",
                "qtf", "s_t", "max_w", "min_w", "first_doc", "last_doc",
                "docs", "tfs", "dls", "seg",
            ]
    else:
        raw_cfg = None
        qt_rows = [
            (
                int(r["term_id"]),
                int(r["n_salts"]),
                int(q["query_id"]),
                float(q["qtf"]),
                n_groups_by_q[int(q["query_id"])],
            )
            for r in rows
            for q in r["qs"]
        ]
        if heavy:
            qt_rows += [
                (int(r["term_id"]), 1, -1, 0.0, 1) for r in heavy
            ]
        qt = _qt_df(
            index.spark,
            qt_rows,
            ("term_id", "n_salts", "query_id", "qtf", "n_groups"),
            "term_id long, n_salts int, query_id long, qtf double, n_groups int",
        )
        joined = _postings_for(index, rows + (heavy or [])).join(
            F.broadcast(qt), "term_id"
        )
        group_cols = [
            "query_id", "grp", "n_groups", "term_id", "salt", "n",
            "qtf", "max_w", "min_w", "first_doc", "last_doc",
            "docs", "ws",
        ]
    bulk_case = (
        # sentinel rows: volume-sized bulk groups keyed by DOC REGION
        # (first_doc >> 8), not by (term, salt, block) hash — all
        # heavy terms' blocks for the same ~256-doc span land in ONE
        # group, so its per-group combine emits ~1 partial per
        # (query, doc) instead of one per touching block-group (the
        # same collocation trick as search_distributed's doc-region
        # repartition; region-hash keeps groups balanced when the doc
        # space is small)
        f"WHEN query_id = -1 THEN array(cast(pmod("
        f"xxhash64(shiftright(first_doc, 8)), {m_bulk}) as int)) "
        if heavy
        else ""
    )
    expanded = joined.withColumn(
        "grp",
        F.explode(
            F.expr(
                "CASE " + bulk_case + "WHEN n_salts <= n_groups THEN "
                "transform(sequence(0, cast(n_groups / n_salts as int) - 1), "
                "m -> salt + m * n_salts) "
                "ELSE array(cast(pmod(salt, n_groups) as int)) END"
            )
        ),
    )
    bulk_qmap_bc = None
    if heavy:
        if raw:
            hmap = {
                int(r["term_id"]): (
                    np.array(
                        [int(q["query_id"]) for q in r["qs"]], dtype=np.int64
                    ),
                    np.array(
                        [float(q["qtf"]) for q in r["qs"]], dtype=np.float64
                    ),
                    float(r["idf"]) / float(r["term_norm"]),
                )
                for r in heavy
            }
        else:
            hmap = {
                int(r["term_id"]): (
                    np.array(
                        [int(q["query_id"]) for q in r["qs"]], dtype=np.int64
                    ),
                    np.array(
                        [float(q["qtf"]) for q in r["qs"]], dtype=np.float64
                    ),
                )
                for r in heavy
            }
        bulk_qmap_bc = index.spark.sparkContext.broadcast(hmap)
    scored = (
        expanded.select(*group_cols)
        .groupBy("query_id", "grp")
        .applyInPandas(
            _bmw_group_fn(
                k,
                raw_cfg,
                tomb_src=(
                    index._tomb_src()
                    if hasattr(index, "_tomb_src")
                    else None
                ),
                bulk_qmap_bc=bulk_qmap_bc,
            ),
            _SCORE_SCHEMA,
        )
    )
    if tfidf_raw:
        # group emissions are UNNORMALIZED candidate supersets (each
        # group keeps every doc whose upper bound reaches its certified
        # k-th lower bound); the exact cosine divides by the CURRENT
        # per-doc norm here — a doc-keyed join against the (already
        # aggregated, query-bounded) candidate set, never the postings.
        # The groupBy-sum restores exactness for heavy bulk partials
        # and is a cheap no-op reduction for the doc-disjoint
        # selective subgroups.
        scored = (
            scored.groupBy("query_id", "doc_id")
            .agg(F.sum("score").alias("score"))
            .join(index.docnorm, "doc_id")
            .withColumn("score", F.col("score") / F.col("dnorm"))
            .select("query_id", "doc_id", "score")
            .filter(F.col("score") > 0)
            .mapInPandas(_local_topk_fn(k), _SCORE_SCHEMA)
        )
    elif heavy:
        # restore exactness for the bulk partials; a no-op for the
        # selective rows ((query, doc) unique across disjoint
        # subgroups). Heavy queries' full candidate sets would
        # otherwise flood the rank window — cut map-side first.
        scored = (
            scored.groupBy("query_id", "doc_id")
            .agg(F.sum("score").alias("score"))
            .filter(F.col("score") > 0)
            .mapInPandas(_local_topk_fn(k), _SCORE_SCHEMA)
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def search_auto(
    index,
    queries: DataFrame,
    k: int = 10,
    heavy_postings_threshold: int = 500_000,
    _rows: list | None = None,
) -> DataFrame:
    """Route each query to the mode that fits its cost profile.

    Selective queries (small total matched-postings volume, from the
    termdict df statistics) go to the per-query block-max path; heavy
    (stopword-gram) queries — whose groups would straggle — go to the
    bulk decode-and-score path. The two result sets are disjoint by
    query_id, so a union preserves exactness.
    """
    # ONE driver job: _matched_terms supplies the per-query matched-
    # postings volumes (routing), and the per-side match rows are
    # carved out in the driver — the sub-searches run zero extra
    # pre-jobs (round-1 VERDICT "what's wrong" #4).
    if not getattr(index, "salt_layout_ok", True):
        return search_distributed(index, queries, k)
    if (
        index.manifest.cfg.get("storage", "weights") == "raw"
        and index.manifest.cfg.get("weighting", "bm25") == "tfidf"
        and _tfidf_raw_gammas(index) is None
    ):
        # tfidf+raw with pre-quantization segments has one sound path
        # (see search_bmw routing): no point splitting the batch just
        # to union two identical modes
        return search_distributed(index, queries, k, _rows=_rows)
    rows = _matched_terms(index, queries) if _rows is None else _rows
    if not rows:
        return _empty_result(index.spark)
    vol: dict[int, int] = {}
    for r in rows:
        for q in r["qs"]:
            qid = int(q["query_id"])
            vol[qid] = vol.get(qid, 0) + int(r["df"])
    heavy_ids = {q for q, v in vol.items() if v > heavy_postings_threshold}

    def side(keep_heavy: bool) -> list:
        # Copy ALL row fields: the raw-storage branches of search_bmw /
        # search_distributed read r["idf"] and r["term_norm"] to form
        # the query-time weights, so a per-side row must carry them.
        out = []
        for r in rows:
            qs = [
                q
                for q in r["qs"]
                if (int(q["query_id"]) in heavy_ids) == keep_heavy
            ]
            if qs:
                d = r.asDict() if hasattr(r, "asDict") else dict(r)
                d["qs"] = qs
                out.append(d)
        return out

    if not heavy_ids:
        return search_bmw(index, queries, k, _rows=rows)
    if len(heavy_ids) == len(vol):
        return search_distributed(index, queries, k, _rows=rows)
    # mixed routing: ONE postings scan, one grouped stage — selective
    # queries take the block-max subgroups, heavy queries ride along as
    # sentinel-keyed bulk groups (r4 ran two full per-side search
    # plans; the per-batch fixed cost was paid twice)
    return search_bmw(
        index, queries, k, _rows=side(False), _heavy_rows=side(True)
    )


def search_index(index, queries: DataFrame, k: int = 10, mode: str = "bmw") -> DataFrame:
    if mode == "bmw":
        if not getattr(index, "salt_layout_ok", True):
            # pre-doc_salt layout: the subgroup path is unsound here;
            # the decode-everything path is salt-agnostic and exact
            return search_distributed(index, queries, k)
        return search_bmw(index, queries, k)
    if mode == "distributed":
        return search_distributed(index, queries, k)
    if mode == "auto":
        return search_auto(index, queries, k)
    raise ValueError(f"unknown mode {mode!r}")
