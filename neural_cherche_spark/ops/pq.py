"""Product-quantization ANN (FAISS ``IndexPQ`` layout as DataFrame ops).

The fourth similarity-search shape next to exact brute force
(``ops/ann.py``, the ≤10^5 verifier), banded hyperplane LSH (hash
buckets), and IVF (``ops/ivf.py``, partition pruning): COMPRESS the
corpus so the scan itself shrinks. Each (L2-normalized) vector is
split into ``m`` subvectors; each subvector is replaced by the id of
its nearest codeword from a per-subspace codebook of ``k_codes``
entries. A 64-dim float32 vector (256 B) becomes ``m`` small ints
(8 B at m=8/k≤256) — the representation that lets 10^9+ vectors sit
in memory, which neither LSH nor IVF addresses.

Reference tie-in: the reference's dense retrievers rank by full-corpus
cosine on torch tensors (retrieve/colbert.py:210-214); PQ asymmetric
distance is the standard way that survives corpora whose raw
embeddings don't fit the fleet's RAM.

Scale design, piece by piece:

* **Codebooks are tiny** (m·k_codes rows of dim/m floats — 8×16×8
  doubles is a kilobyte) and always travel as a broadcast table /
  numpy array. The big things — corpus vectors, code table — stay
  distributed.
* **Seeding is hash-deterministic** (the ``k_codes`` vectors with the
  smallest ``md5(vec_id)``, numbered in that order — the same
  RNG-free scheme as ``ivf_seed_centroids``), so codebooks, codes,
  and ADC scores are reproducible bit-for-bit by the DuckDB oracle in
  ``__spark_entry__``. Quality then improves with per-subspace Lloyd
  iterations (:func:`pq_fit`) — distributed, collecting only the
  codebook per iteration.
* **Encoding** has two physical strategies with one semantics
  (argmin L2 per subspace, ties → lowest code):
  - ``method="catalyst"`` — explode subspaces, broadcast-join the
    codebook, fold the squared distance JVM-side. Row count is
    n·m·k_codes, the oracle-parity path.
  - ``method="arrow"`` — ``mapInPandas``: one ``(batch, m, dsub)`` ×
    ``(m, k, dsub)`` einsum per Arrow batch, no row blow-up; the
    10^9-vector path.
* **Query** (:func:`pq_topk`) is ADC (asymmetric distance
  computation): per query build the m×k_codes lookup table of
  subvector dot products against the codebook (queries stay
  full-precision; only the corpus is quantized), then score a doc by
  summing ``lut[sub, code[sub]]``. The LUT is |queries|·m·k rows —
  broadcast; the corpus side reads CODES ONLY (never the original
  embeddings), which is the entire point at scale.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalized(
    vecs: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(vec_id, v: array<double> unit-L2). Zero vectors are rejected —
    cosine is undefined for them and a silent 0-division would poison
    every downstream score."""
    from neural_cherche_spark.ops.ann import _norm_col

    return vecs.select(
        F.col(id_col).alias("vec_id"),
        F.expr(
            f"transform({vec_col}, x -> cast(x as double))"
        ).alias("__v"),
        _norm_col(vec_col).alias("__nr"),
    ).select(
        "vec_id",
        F.expr(
            "CASE WHEN __nr = 0.0D THEN "
            "raise_error('pq: zero-norm embedding — cosine undefined') "
            "ELSE transform(__v, x -> x / __nr) END"
        ).alias("v"),
    )


def _subspace_bounds(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(
            f"dim {dim} not divisible by m={m} subspaces — pad the "
            "embedding or pick m | dim"
        )
    return dim // m


def _dsub_of(vecs: DataFrame, vec_col: str, m: int) -> int:
    """Subvector width from one probed row (one tiny Spark job); a
    clear error on an empty corpus instead of a NoneType crash."""
    first = vecs.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("pq: empty input — no embeddings to quantize")
    return _subspace_bounds(int(first["d"]), m)


def pq_codebooks(
    vecs: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sub, code, cw: array<double>) hash-seeded PQ codebooks: the
    ``k_codes`` vectors with the smallest ``md5(vec_id)`` donate their
    (normalized) subvectors to every subspace, numbered 0..k−1 in hash
    order. One TakeOrderedAndProject over the corpus, then an
    explode over the tiny seed set."""
    nv = _normalized(vecs, id_col, vec_col)
    h = F.md5(F.col("vec_id").cast("string").cast("binary"))
    seeds = (
        nv.select(h.alias("__h"), F.col("vec_id").alias("__sid"), "v")
        .orderBy("__h", "__sid")
        .limit(k_codes)
    )
    w = Window.orderBy("__h", "__sid")  # ≤ k_codes rows: single task
    numbered = seeds.select(
        (F.row_number().over(w) - 1).alias("code"), "v"
    )
    dsub = _dsub_of(vecs, vec_col, m)
    return numbered.select(
        F.explode(F.expr(f"sequence(0, {m - 1})")).alias("sub"),
        "code",
        "v",
    ).select(
        "sub",
        "code",
        F.expr(f"slice(v, sub * {dsub} + 1, {dsub})").alias("cw"),
    )


def _subvectors(nv: DataFrame, m: int, dsub: int) -> DataFrame:
    """(vec_id, sub, sv) normalized subvectors."""
    return nv.select(
        "vec_id", F.explode(F.expr(f"sequence(0, {m - 1})")).alias("sub"), "v"
    ).select(
        "vec_id",
        "sub",
        F.expr(f"slice(v, sub * {dsub} + 1, {dsub})").alias("sv"),
    )


_SQDIST = (
    "aggregate(zip_with(sv, cw, (x, y) -> (x - y) * (x - y)), "
    "0.0D, (a, x) -> a + x)"
)
_SUBDOT = (
    "aggregate(zip_with(sv, cw, (x, y) -> x * y), 0.0D, (a, x) -> a + x)"
)


def pq_encode(
    vecs: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "catalyst",
    _dsub: int | None = None,
) -> DataFrame:
    """(vec_id, codes: array<int>) — the compressed corpus. Per
    subspace the nearest codeword by L2 (ties → lowest code), codes
    ordered by subspace. The two methods agree except on NEAR-TIES of
    codeword distance finer than float rounding (catalyst folds
    Σ(x−y)²; arrow expands ‖c‖²−2x·c), where either may win — exact
    duplicate codewords still break identically (both compare
    bit-identical values, lowest code wins)."""
    nv = _normalized(vecs, id_col, vec_col)
    dsub = _dsub if _dsub is not None else _dsub_of(vecs, vec_col, m)
    if method == "arrow":
        return _pq_encode_arrow(nv, codebooks, m, dsub)
    sv = _subvectors(nv, m, dsub)
    d = sv.join(F.broadcast(codebooks), "sub").select(
        "vec_id", "sub", "code", F.expr(_SQDIST).alias("dist")
    )
    best = d.groupBy("vec_id", "sub").agg(
        F.min(F.struct("dist", "code")).alias("b")
    )
    return best.groupBy("vec_id").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(sub, b.code AS c))), "
            "s -> s.c)"
        ).alias("codes")
    )


def _pq_encode_arrow(
    nv: DataFrame, codebooks: DataFrame, m: int, dsub: int
) -> DataFrame:
    import numpy as np
    import pandas as pd

    cb_rows = codebooks.orderBy("sub", "code").collect()
    k = max(r["code"] for r in cb_rows) + 1
    cbm = np.zeros((m, k, dsub), dtype=np.float64)
    for r in cb_rows:
        cbm[r["sub"], r["code"], :] = r["cw"]
    # ‖sv − cw‖² = ‖sv‖² − 2·sv·cw + ‖cw‖²; argmin drops the ‖sv‖² term
    cb_sq = (cbm * cbm).sum(axis=2)  # (m, k)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            xs = x.reshape(len(pdf), m, dsub)
            # (n, m, k) partial distances; np.argmin takes the FIRST
            # minimum → lowest code on ties, matching the min-struct
            dots = np.einsum("nmd,mkd->nmk", xs, cbm)
            codes = np.argmin(cb_sq[None, :, :] - 2.0 * dots, axis=2)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes.astype("int32"))}
            )

    return nv.mapInPandas(fn, "vec_id long, codes array<int>")


def pq_fit(
    vecs: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "catalyst",
) -> DataFrame:
    """Codebooks after ``iters`` rounds of per-subspace Lloyd: assign
    (pq_encode) → per-(sub, code, dim) mean over assigned subvectors →
    re-assembled codebook. Only the m·k_codes codebook is collected
    per round (via the broadcast join), exactly like ``ivf_fit``; a
    codeword that loses all members keeps its previous value."""
    cb = pq_codebooks(vecs, m, k_codes, id_col, vec_col)
    if iters <= 0:
        return cb
    dsub = _dsub_of(vecs, vec_col, m)
    nv = _normalized(vecs, id_col, vec_col)
    sv = _subvectors(nv, m, dsub).localCheckpoint()
    for _ in range(iters):
        if method == "arrow":
            codes = pq_encode(
                vecs, cb, m, id_col, vec_col, method, _dsub=dsub
            )
            assign = codes.select(
                "vec_id", F.posexplode("codes").alias("sub", "code")
            )
        else:
            # assign straight from the checkpointed subvectors — no
            # per-iteration re-normalize/re-explode of the raw corpus
            dists = sv.join(F.broadcast(cb), "sub").select(
                "vec_id", "sub", "code", F.expr(_SQDIST).alias("dist")
            )
            assign = (
                dists.groupBy("vec_id", "sub")
                .agg(F.min(F.struct("dist", "code")).alias("b"))
                .select("vec_id", "sub", F.col("b.code").alias("code"))
            )
        assigned = sv.join(assign, ["vec_id", "sub"])
        means = (
            assigned.select(
                "sub", "code", F.posexplode("sv").alias("dim", "x")
            )
            .groupBy("sub", "code", "dim")
            .agg(F.avg("x").alias("mu"))
            .groupBy("sub", "code")
            .agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(dim, mu))), "
                    "s -> s.mu)"
                ).alias("cw_new")
            )
        )
        cb = (
            cb.join(means, ["sub", "code"], "left")
            .select(
                "sub",
                "code",
                F.coalesce("cw_new", "cw").alias("cw"),
            )
            .localCheckpoint()
        )
    return cb


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
    method: str = "catalyst",
) -> DataFrame:
    """(vec_id, neighbor_id, score, rank) — ADC top-k: score(q, x) =
    Σ_sub q_sub · codeword(codes[x][sub]) ≈ cos(q, x) for normalized
    corpus vectors. The corpus side touches ONLY the code table."""
    nq = _normalized(queries, id_col, vec_col)
    dsub = _dsub_of(queries, vec_col, m)
    qs = _subvectors(nq, m, dsub)
    lut = qs.join(F.broadcast(codebooks), "sub").select(
        F.col("vec_id").alias("qid"),
        "sub",
        "code",
        F.expr(_SUBDOT).alias("dot"),
    )
    if method == "arrow":
        scored = _pq_score_arrow(lut, codes, m, k)
    else:
        cexp = codes.select(
            F.col("vec_id").alias("neighbor_id"),
            F.posexplode("codes").alias("sub", "code"),
        )
        scored = (
            cexp.join(F.broadcast(lut), ["sub", "code"])
            .groupBy("qid", "neighbor_id")
            .agg(F.round(F.sum("dot"), 6).alias("score"))
        )
    if exclude_self:
        scored = scored.filter(F.col("qid") != F.col("neighbor_id"))
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("vec_id"), "neighbor_id", "score", "rank"
        )
    )


def _pq_score_arrow(
    lut: DataFrame, codes: DataFrame, m: int, k: int
) -> DataFrame:
    """Arrow ADC: one gather+sum per Arrow batch; emits a per-partition
    top-(k+1) cut per query (superset of the global top-k even with
    exclude_self dropping one row), so the global rank window sorts
    ≤ partitions·queries·(k+1) rows, never the full n·|queries|."""
    import numpy as np
    import pandas as pd

    lut_rows = lut.collect()
    qids = sorted({r["qid"] for r in lut_rows})
    qpos = {q: i for i, q in enumerate(qids)}
    kmax = max(r["code"] for r in lut_rows) + 1
    lutm = np.zeros((len(qids), m, kmax), dtype=np.float64)
    for r in lut_rows:
        lutm[qpos[r["qid"]], r["sub"], r["code"]] = r["dot"]
    qarr = np.asarray(qids, dtype=np.int64)
    cut = k + 1
    # a Spark broadcast, not a closure capture: the LUT is
    # |queries|·m·k doubles — closure-pickling it would re-ship it
    # inside every serialized task instead of once per executor
    sc_ctx = codes.sparkSession.sparkContext
    lut_bc = sc_ctx.broadcast((lutm, qarr))

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lutm_w, qarr_w = lut_bc.value
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            cm = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            # scores[q, i] = Σ_sub lut[q, sub, cm[i, sub]]; rounded
            # BEFORE the local cut so local and global orderings agree
            # (the rank window sorts rounded scores — cutting on raw
            # ones could drop a row that ties into the top-k after
            # rounding)
            sc = np.round(
                lutm_w[:, np.arange(m)[None, :], cm].sum(axis=2), 6
            )  # (nq, n)
            nb = pdf["vec_id"].to_numpy()
            take = min(cut, n)
            # per-query local top-`take` (ties → lowest neighbor_id,
            # matching the rank window's ordering)
            idx = np.lexsort(
                (nb[None, :].repeat(sc.shape[0], 0), -sc), axis=1
            )[:, :take]
            qi = np.repeat(qarr_w, take)
            yield pd.DataFrame(
                {
                    "qid": qi,
                    "neighbor_id": nb[idx].ravel(),
                    "score": np.take_along_axis(sc, idx, axis=1).ravel(),
                }
            )

    return codes.mapInPandas(fn, "qid long, neighbor_id long, score double")
